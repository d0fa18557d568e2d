"""Tensor-parallel parameter sharding over a ("data", "model") mesh.

The reference's only parallelism is DDP (/root/reference/src/train.py:87-89);
this module is TPU-native extra capability for scaling past pure data
parallelism: Megatron-style column/row projection pairs shard attention
heads and the FFN hidden dimension over the "model" mesh axis, and XLA's
sharding propagation inserts exactly one all-reduce per attention/FFN block
(at the row-parallel out_proj / output_proj / linear2).

Head-major layouts make this work for every attention flavor in the stack:
- dense attention (models/attention.py): q/k/v kernels split output
  features = whole heads; out_proj reduces over the sharded input.
- MS-deformable attention: value_proj, sampling_offsets and
  attention_weights all produce (M, ...)-head-major features, so the MSDA
  core (ops/msda.py) is embarrassingly head-parallel; output_proj reduces.
- FFN: linear1 column-split, linear2 row-split.
Everything else (backbone convs, norms, embeddings, prediction heads) is
replicated — those are either tiny or bandwidth-cheap.

Constraints: the "model" axis size must divide nheads and dim_feedforward
(and therefore hidden_dim, since dh = hidden/nheads stays whole per shard).
Specs are written against the TRAILING dims of each leaf, so they apply
unchanged to `tpu.scan_layers` stacked parameters (leading layer axis).

Enable in training with `tpu.model_parallel: N` (cli/train.py); the data
axis then spans the remaining devices and batch shards over it as usual.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = (r"(q_proj|k_proj|v_proj|value_proj|sampling_offsets"
           r"|attention_weights|linear1)")
_ROW = r"(out_proj|output_proj|linear2)"

# (path regex, spec for the TRAILING dims); first match wins, default P().
RULES = [
    (re.compile(_COLUMN + r"/kernel$"), ("model",)),
    (re.compile(_COLUMN + r"/bias$"), ("model",)),
    (re.compile(_ROW + r"/kernel$"), ("model", None)),
]


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data * n_model > len(devices):
        raise ValueError(f"need {n_data * n_model} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def _leaf_spec(path: str, ndim: int) -> P:
    for pat, tail in RULES:
        if pat.search(path):
            return P(*([None] * (ndim - len(tail)) + list(tail)))
    return P()


def param_specs(params):
    """PartitionSpec pytree matching `params` (flax param dict)."""
    def spec(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        return _leaf_spec(path, np.ndim(leaf))
    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place params onto `mesh` per RULES (others replicated). Run BEFORE
    optimizer init: optax's zeros_like state then inherits the shardings."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
