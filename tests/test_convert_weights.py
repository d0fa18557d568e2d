"""Weight-converter mapping round trip: generate a torch-style state dict
FROM our params via the inverse transforms, convert forward, check equality
and (near-)full coverage."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from convert_weights import convert, torch_key_for  # noqa: E402

from trackformer_tpu.models import build_model  # noqa: E402
from trackformer_tpu.structures import FrameBatch  # noqa: E402
from trackformer_tpu.utils.checkpoint import flatten_params  # noqa: E402
from trackformer_tpu.utils.config import (load_config,  # noqa: E402
                                          nested_namespace)


def make_params(named, over):
    cfg = load_config("train.yaml", named, over)
    cfg["tpu"]["compute_dtype"] = "float32"
    args = nested_namespace(cfg)
    model, _, _, _ = build_model(args)
    batch = FrameBatch.from_images(jnp.zeros((1, 64, 64, 3)),
                                   jnp.array([[64, 64]]))
    return flatten_params(jax.jit(model.init)(jax.random.PRNGKey(0), batch))


def inverse_torch_dict(flat):
    """Build the torch state dict that should convert back to `flat`."""
    torch_state = {}
    packed = {}
    for path, v in flat.items():
        r = torch_key_for(path)
        if r is None:
            continue
        tkey, transform = r
        v = np.asarray(v)
        if transform == "conv":
            torch_state[tkey] = v.transpose(3, 2, 0, 1)
        elif transform == "linear":
            torch_state[tkey] = v.T
        elif transform.startswith("qkv_"):
            packed.setdefault(tkey, {})[transform[-1]] = v
        else:
            torch_state[tkey] = v
    for tkey, parts in packed.items():
        vs = [parts[p] for p in ("q", "k", "v")]
        if vs[0].ndim == 2:
            torch_state[tkey] = np.concatenate([v.T for v in vs], 0)
        else:
            torch_state[tkey] = np.concatenate(vs, 0)
    return torch_state


@pytest.mark.parametrize("named,over", [
    (["deformable"], {"enc_layers": 1, "dec_layers": 2, "hidden_dim": 96,
                      "nheads": 4, "dim_feedforward": 128,
                      "num_queries": 8}),
    ([], {"enc_layers": 1, "dec_layers": 2, "hidden_dim": 64, "nheads": 4,
          "dim_feedforward": 128, "num_queries": 8,
          "track_attention": True}),
])
def test_roundtrip(named, over):
    flat = make_params(named, over)
    torch_state = inverse_torch_dict(flat)
    out = convert(torch_state, flat, verbose=False)
    n_match, n_total = 0, 0
    unmapped = []
    for path, v in flat.items():
        n_total += 1
        if np.array_equal(out[path], np.asarray(v)):
            r = torch_key_for(path)
            if r is not None:
                n_match += 1
            else:
                unmapped.append(path)
        else:
            unmapped.append(path + " [MISMATCH]")
    coverage = n_match / n_total
    assert coverage > 0.95, f"coverage {coverage:.2f}; unmapped: {unmapped[:20]}"
