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


def adapt_params(loaded: Dict[str, np.ndarray],
                 target: Dict[str, np.ndarray],
                 resume_shift_neuron: bool = False,
                 verbose: bool = True) -> Dict[str, np.ndarray]:
    """Shape-adaptive warm start on flattened dicts (reference
    train.py:149-238): matching shapes copy through; class heads are sliced
    or padded; query embeddings copy the overlapping prefix; everything else
    keeps the fresh init."""
    out = dict(target)
    for key, tgt in target.items():
        if key not in loaded:
            continue
        src = loaded[key]
        if src.shape == tgt.shape:
            out[key] = src
            continue
        if all(s >= t for s, t in zip(src.shape, tgt.shape)):
            sl = tuple(slice(0, t) for t in tgt.shape)
            out[key] = src[sl]
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
