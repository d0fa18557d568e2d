"""Checkpointing: orbax train-state checkpoints + portable npz params.

Parity target: the reference checkpoint protocol (SURVEY.md §5) —
{model, optimizer, lr_scheduler, epoch, args, best_val_stats} saved every
epoch with per-metric best copies (train.py:303-338) and shape-adaptive
resume surgery for cross-config warm starts (train.py:149-238).
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def flatten_params(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, value in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(value)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(params, path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flatten_params(params))


def load_params_npz(path) -> Dict:
    with np.load(path, allow_pickle=False) as data:
        return unflatten_params({k: data[k] for k in data.files})


# Stacked (tpu.scan_layers) <-> unrolled per-layer key correspondence.
# See models/deformable_transformer.py (encoder scan) and
# models/deformable_detr.py ScanDecoder:
#   encoder/layer_{i}/R        <-> encoder/layers/layer/R       (stack axis 0)
#   decoder_layers_{i}/R       <-> dec_scan/layers/layer/R
#   class_embed_{i}/R (i<L)    <-> dec_scan/layers/class_embed/R
#   bbox_embed_{i}/R  (i<L)    <-> dec_scan/layers/bbox_embed/R
#   class_embed_{L}/R          <-> enc_class_embed/R  (two-stage extra head)
#   bbox_embed_{L}/R           <-> enc_bbox_embed/R
_SCAN_PATTERNS = [
    (r"^(?P<p>.*encoder/)layers/layer/(?P<r>.+)$", "{p}layer_{i}/{r}"),
    (r"^(?P<p>.*?)dec_scan/layers/layer/(?P<r>.+)$",
     "{p}decoder_layers_{i}/{r}"),
    (r"^(?P<p>.*?)dec_scan/layers/(?P<h>class_embed|bbox_embed)/(?P<r>.+)$",
     "{p}{h}_{i}/{r}"),
]


def _unrolled_key(stacked_key: str, index: int) -> Optional[str]:
    import re
    for pat, tmpl in _SCAN_PATTERNS:
        m = re.match(pat, stacked_key)
        if m:
            return tmpl.format(i=index, **m.groupdict())
    return None


def bridge_scan_layout(loaded: Dict[str, np.ndarray],
                       target: Dict[str, np.ndarray],
                       verbose: bool = True) -> Dict[str, np.ndarray]:
    """Convert between unrolled per-layer params (layer_0..layer_{L-1}) and
    the stacked layout used by `tpu.scan_layers`, so checkpoints from either
    model mode warm-start the other. Direction is inferred per key from
    which side has the stacked name; everything else passes through."""
    import re
    out = dict(loaded)

    # unrolled checkpoint -> stacked target key
    def _leading_dim(v):
        # target trees may hold ShapeDtypeStructs boxed in 0-d object arrays
        if getattr(v, "dtype", None) == object and v.shape == ():
            v = v.item()
        shape = getattr(v, "shape", ())
        return shape[0] if len(shape) else None

    for key in target:
        if key in out or _unrolled_key(key, 0) is None:
            continue
        n = 0
        while _unrolled_key(key, n) in out:
            n += 1
        # the two-stage unrolled layout has one EXTRA head (index L, the
        # encoder-proposal head) that must not join the stack
        n_target = _leading_dim(target[key])
        if n_target is not None:
            n = min(n, n_target)
        if n == 0:
            continue
        parts = [out[_unrolled_key(key, i)] for i in range(n)]
        for i in range(n):
            del out[_unrolled_key(key, i)]
        out[key] = np.stack(parts)
        if verbose:
            print(f"resume: stacked {n} unrolled layers -> {key}")

    # stacked checkpoint -> unrolled target keys
    for skey in [k for k in out if _unrolled_key(k, 0) is not None]:
        arr = out[skey]
        wanted = [i for i in range(arr.shape[0])
                  if _unrolled_key(skey, i) in target]
        if not wanted:
            continue
        for i in wanted:
            out[_unrolled_key(skey, i)] = arr[i]
        del out[skey]
        if verbose:
            print(f"resume: unstacked {skey} -> {len(wanted)} layer keys")

    # two-stage extra head: unrolled head index L <-> enc_{class,bbox}_embed
    for key in target:
        if key in out:
            continue
        m = re.match(r"^(?P<p>.*?)enc_(?P<h>class_embed|bbox_embed)/"
                     r"(?P<r>.+)$", key)
        if m:  # target stacked-mode, checkpoint unrolled: take max index
            cands = []
            for k in out:
                km = re.match(
                    rf"^{re.escape(m.group('p'))}{m.group('h')}_(\d+)/"
                    rf"{re.escape(m.group('r'))}$", k)
                if km:
                    cands.append((int(km.group(1)), k))
            if cands:
                _, src = max(cands)
                out[key] = out.pop(src)
                if verbose:
                    print(f"resume: {src} -> {key}")
            continue
        m = re.match(r"^(?P<p>.*?)(?P<h>class_embed|bbox_embed)_(?P<i>\d+)/"
                     r"(?P<r>.+)$", key)
        if m:  # target unrolled, checkpoint stacked-mode: extra head index
            src = f"{m.group('p')}enc_{m.group('h')}/{m.group('r')}"
            if src in out:
                out[key] = out.pop(src)
                if verbose:
                    print(f"resume: {src} -> {key}")
    return out


def _out_axis(key: str, arr: np.ndarray) -> int:
    """Axis holding the torch 'dim 0' (output features) in our layout:
    kernels are (in, out) / HWIO, so it is the LAST axis; biases, scales
    and embeddings keep it first."""
    return arr.ndim - 1 if key.endswith("/kernel") else 0


def _take_out(arr: np.ndarray, axis: int, n: int) -> np.ndarray:
    return np.take(arr, np.arange(n), axis=axis)


def adapt_params(loaded: Dict[str, np.ndarray],
                 target: Dict[str, np.ndarray],
                 resume_shift_neuron: bool = False,
                 verbose: bool = True) -> Dict[str, np.ndarray]:
    """Shape-adaptive warm start implementing the reference's surgery rules
    (train.py:161-238), translated to our flax layouts (torch dim 0 = our
    kernel last axis):

      * 'norm'                      -> repeat(2)                (:174-175)
      * 'self_attn'/'multihead_attn'-> repeat 2 on every dim    (:176-177)
      * 'reference_points' (out x2) -> fresh, prefix = loaded   (:178-180)
      * 'linear1'/'query_embed'     -> fresh init               (:181-184)
      * 'linear2'/'input_proj'      -> repeat 2 on the out axis (:197-198)
      * 'class_embed'               -> slice leading classes    (:199-206)
      * resume_shift_neuron (equal shapes, class head): rotate class
        neurons so label 0 sits at neuron 0                     (:214-223)

    Unmatched mismatches fall back to generic slice/pad (and say so) — the
    reference raises NotImplementedError there instead.
    """
    loaded = bridge_scan_layout(loaded, target, verbose=verbose)
    out = dict(target)
    for key, tgt in target.items():
        if key not in loaded:
            if verbose:
                print(f"resume: {key} {tgt.shape} from scratch "
                      f"(not in checkpoint)")
            continue
        src = loaded[key]
        ax = _out_axis(key, tgt)
        if src.shape == tgt.shape:
            if resume_shift_neuron and "class_embed" in key:
                moved = np.moveaxis(np.array(src), ax, 0)
                shifted = moved.copy()
                shifted[:-1] = moved[1:]
                shifted[-2] = moved[0]
                out[key] = np.ascontiguousarray(
                    np.moveaxis(shifted, 0, ax)).astype(tgt.dtype)
                if verbose:
                    print(f"resume: {key} class neurons shifted so label 0 "
                          f"sits at neuron 0")
            else:
                out[key] = src.astype(tgt.dtype)
            continue

        val = None
        if "norm" in key and src.ndim == 1:
            val = np.tile(src, 2)
        elif "self_attn" in key or "multihead_attn" in key:
            val = np.tile(src, (2,) * src.ndim)
        elif "reference_points" in key and \
                src.shape[ax] * 2 == tgt.shape[ax]:
            val = np.moveaxis(np.array(tgt), ax, 0)
            val[:src.shape[ax]] = np.moveaxis(src, ax, 0)
            val = np.moveaxis(val, 0, ax)
        elif "linear1" in key or "query_embed" in key:
            if verbose:
                print(f"resume: {key} {tgt.shape} from scratch")
            continue
        elif "linear2" in key or "input_proj" in key:
            reps = [1] * src.ndim
            reps[ax] = 2
            val = np.tile(src, reps)
        elif "class_embed" in key and src.shape[ax] >= tgt.shape[ax]:
            val = _take_out(src, ax, tgt.shape[ax])

        if val is not None and val.shape == tgt.shape:
            out[key] = val.astype(tgt.dtype)
            if verbose:
                print(f"resume: {key} {tgt.shape} adapted from "
                      f"{src.shape}")
            continue

        # generic fallback (the reference raises NotImplementedError here)
        if all(s >= t for s, t in zip(src.shape, tgt.shape)):
            sl = tuple(slice(0, t) for t in tgt.shape)
            out[key] = src[sl].astype(tgt.dtype)
            if verbose:
                print(f"resume: sliced {key} {src.shape} -> {tgt.shape}")
        elif all(s <= t for s, t in zip(src.shape, tgt.shape)):
            pad = np.array(tgt)
            sl = tuple(slice(0, s) for s in src.shape)
            pad[sl] = src
            out[key] = pad
            if verbose:
                print(f"resume: padded {key} {src.shape} -> {tgt.shape}")
        elif verbose:
            print(f"resume: kept fresh init for {key} "
                  f"(loaded {src.shape}, need {tgt.shape})")
    return out


def load_and_adapt(path, target_params, **kw) -> Dict:
    loaded = flatten_params(load_params_npz(path))
    target = flatten_params(target_params)
    return unflatten_params(adapt_params(loaded, target, **kw))


class CheckpointManager:
    """Epoch checkpoints + per-metric best copies via orbax."""

    def __init__(self, output_dir, save_interval: int = 5):
        import orbax.checkpoint as ocp
        self.dir = Path(output_dir).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_interval = save_interval
        self._ckptr = ocp.StandardCheckpointer()
        self.best: Dict[str, float] = {}

    def _meta_path(self):
        return self.dir / "meta.json"

    def save(self, state, epoch: int, val_stats: Optional[Dict] = None,
             config: Optional[dict] = None):
        import orbax.checkpoint as ocp
        path = self.dir / "checkpoint"
        if path.exists():
            import shutil
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        meta = {"epoch": epoch, "best": self.best}
        self._meta_path().write_text(json.dumps(meta))
        save_params_npz(state.params, self.dir / "checkpoint_params.npz")
        if self.save_interval and epoch % self.save_interval == 0:
            save_params_npz(state.params,
                            self.dir / f"checkpoint_epoch_{epoch}.npz")
        # per-metric best checkpoints (reference train.py:303-322)
        for metric, value in (val_stats or {}).items():
            if value >= self.best.get(metric, float("-inf")):
                self.best[metric] = float(value)
                save_params_npz(
                    state.params,
                    self.dir / f"checkpoint_best_{metric}.npz")

    def restore(self, state):
        path = self.dir / "checkpoint"
        if not path.exists():
            return state, 0
        restored = self._ckptr.restore(path, state)
        meta = json.loads(self._meta_path().read_text()) \
            if self._meta_path().exists() else {}
        self.best = meta.get("best", {})
        return restored, int(meta.get("epoch", 0))
