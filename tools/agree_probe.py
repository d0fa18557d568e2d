"""Short-budget ablation probes for the agreement study's training arms.

Trains one or more agreement modes (exact / fast / fast_w16 / fast_f32 /
fast_remat0 / combinations like fast_w16_f32) for a SHORT step budget and
prints the loss trajectory + held-out AP — the bisection tool for the
flagship fast-arm training collapse (AGREEMENT.json round 4: fast arm
flat-lines at loss ~21 from step 500 while exact trains 12 -> 1.3; at mid
scale — f32, no remat, all-even level ladders — the same arm trained fine).

Unlike fast_exact_agreement.py's main(), this NEVER writes AGREEMENT.json
and keys its train checkpoints on the probe step budget, so probe runs
cannot pollute the full-length study's caches.

Usage: python tools/agree_probe.py <steps> <scale> <mode> [<mode> ...]
e.g.:  python tools/agree_probe.py 600 flagship fast_f32 fast_w16
"""
import importlib.util
import sys
from pathlib import Path

import numpy as np

STEPS, SCALE = sys.argv[1], sys.argv[2]
MODES = sys.argv[3:]
assert MODES, "give at least one mode"

sys.argv = ["fast_exact_agreement.py", STEPS, SCALE]
spec = importlib.util.spec_from_file_location(
    "fast_exact_agreement",
    Path(__file__).resolve().parent / "fast_exact_agreement.py")
ag = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ag)

rng = np.random.RandomState(0)
train_scenes = [ag.make_scene(rng) for _ in range(ag.N_TRAIN)]
eval_scenes = [ag.make_scene(rng) for _ in range(ag.N_EVAL)]
gt = ag.boxes_to_anns(eval_scenes)

summary = {}
for mode in MODES:
    preds, losses = ag.train_and_eval(mode, train_scenes, eval_scenes)
    ap, ap50 = ag.eval_map(preds, gt)
    milestones = {s: round(float(np.mean(losses[max(0, s - 50):s])), 2)
                  for s in (100, 200, 400, 600, 1000, 2000)
                  if len(losses) >= s}
    summary[mode] = {"ap": round(ap, 4), "ap50": round(ap50, 4),
                     "loss": milestones}
    print(f"PROBE {mode}: AP={ap:.4f} AP50={ap50:.4f} loss={milestones}",
          flush=True)

print("PROBE SUMMARY:", summary, flush=True)
