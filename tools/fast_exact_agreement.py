"""Bound the fidelity of the TPU-fast approximation (windowed encoder)
against the exact-MSDA reference semantics (VERDICT r1 item 9).

The windowed encoder is a differently-parameterized TPU-native architecture,
so same-weights output deltas are not defined; agreement is functional:
train BOTH modes from scratch on the same synthetic detection task with an
identical budget, then report

  * exact_map / fast_map  — COCO AP@[.5:.95] of each mode on held-out scenes
  * cross_agreement_map   — AP of the fast model's detections scored against
                            the exact model's detections as pseudo-GT
                            (direct output agreement on identical inputs)

Writes AGREEMENT.json at the repo root; bench.py folds it into the headline
JSON as `fast_vs_exact_agreement`.

Small regime (CPU-runnable sanity):
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/fast_exact_agreement.py
Flagship regime (VERDICT r2 weak #2 — meaningful scale, run on TPU):
  python tools/fast_exact_agreement.py 2000 flagship
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 350
SCALE = sys.argv[2] if len(sys.argv) > 2 else "small"
# Wall-clock escape hatch: train only the first AGREE_MAX_STEPS of the
# STEPS-step schedule (lr boundaries, /tmp cache keys stay derived from
# STEPS, so the jitted program and any mid-train checkpoints keyed on STEPS
# remain reusable by a later full-length run).
MAX_STEPS = int(os.environ.get("AGREE_MAX_STEPS", str(10 ** 9)))
# Training-seed replicate (VERDICT r3 weak #5 — agreement numbers were
# single-seed; rerun with AGREE_SEED=1,2,... and compare AGREEMENT.json's
# per-seed files to get min/max spread). Scene generation stays seed-0 so
# every replicate trains/evals on identical data.
SEED = int(os.environ.get("AGREE_SEED", "0"))
if SCALE == "flagship":
    # flagship-geometry regime: real input resolution class, full
    # depth/width (288 dim, 6+6 layers, 8 heads) so the window-size vs
    # object-scale trade-off matches deployment
    H, W = 416, 544
    N_TRAIN, N_EVAL = 48, 24
    BATCH = 4
    N_MAX, BOX_LO, BOX_HI = 8, 30, 110
    MODEL_OVER = {"enc_layers": 6, "dec_layers": 6, "hidden_dim": 288,
                  "nheads": 8, "dim_feedforward": 1024, "num_queries": 48}
    MAX_OBJ = 10
elif SCALE == "mid":
    # CPU-feasible middle regime: flagship width/heads (288 dim, 8 heads)
    # at 2x the small resolution — runs without a TPU when the dev tunnel
    # is unavailable:
    #   PYTHONPATH= JAX_PLATFORMS=cpu python tools/fast_exact_agreement.py \
    #       600 mid
    H, W = 192, 256
    N_TRAIN, N_EVAL = 32, 20
    BATCH = 4
    N_MAX, BOX_LO, BOX_HI = 6, 24, 64
    MODEL_OVER = {"enc_layers": 4, "dec_layers": 4, "hidden_dim": 288,
                  "nheads": 8, "dim_feedforward": 1024, "num_queries": 32}
    MAX_OBJ = 8
else:
    H, W = 96, 128
    N_TRAIN, N_EVAL = 24, 16
    BATCH = 4
    N_MAX, BOX_LO, BOX_HI = 4, 18, 40
    MODEL_OVER = {"enc_layers": 2, "dec_layers": 2, "hidden_dim": 96,
                  "nheads": 4, "dim_feedforward": 128, "num_queries": 12}
    MAX_OBJ = 6


def make_scene(rng, n_max=None):
    n_max = N_MAX if n_max is None else n_max
    img = rng.normal(0.0, 0.3, (H, W, 3)).astype(np.float32)
    n = rng.randint(1, n_max + 1)
    boxes = []
    for _ in range(n):
        bw, bh = rng.randint(BOX_LO, BOX_HI), rng.randint(BOX_LO, BOX_HI)
        x = rng.randint(0, W - bw)
        y = rng.randint(0, H - bh)
        img[y:y + bh, x:x + bw] += rng.uniform(1.0, 2.0) * np.array(
            rng.uniform(0.4, 1.0, 3), np.float32)
        boxes.append([x, y, bw, bh])
    return img, np.array(boxes, np.float32)


def to_targets(boxes_list, max_obj=None):
    max_obj = MAX_OBJ if max_obj is None else max_obj
    import jax.numpy as jnp
    from trackformer_tpu.structures import empty_targets
    b = len(boxes_list)
    t = empty_targets(b, max_obj)
    valid = np.zeros((b, max_obj), bool)
    labels = np.zeros((b, max_obj), np.int32)
    out = np.zeros((b, max_obj, 4), np.float32)
    for i, bx in enumerate(boxes_list):
        n = min(len(bx), max_obj)
        valid[i, :n] = True
        cx = (bx[:n, 0] + bx[:n, 2] / 2) / W
        cy = (bx[:n, 1] + bx[:n, 3] / 2) / H
        out[i, :n] = np.stack([cx, cy, bx[:n, 2] / W, bx[:n, 3] / H], -1)
    return t.replace(valid=jnp.asarray(valid), labels=jnp.asarray(labels),
                     boxes=jnp.asarray(out))


def _mode_over(mode: str) -> dict:
    """Config overrides for a mode name. 'exact' = reference-parity MSDA
    encoder; 'fast' = windowed encoder; ablation arms append suffix tokens,
    e.g. 'fast_w16' = windowed with tpu.encoder_window=16 (VERDICT r3 #2 —
    isolate the fast mode's underfit: window size vs object scale).
    Tokens 'f32' (compute dtype) and 'remat0' are consumed by
    train_and_eval AFTER the scale defaults (they bisect the flagship-only
    training collapse: mid trained f32/no-remat, flagship bf16/remat)."""
    if mode.split("_")[0] == "exact":
        over = {"tpu.encoder_attention": "msda"}
    else:
        over = {"tpu.encoder_attention": "windowed"}
    for tok in mode.split("_")[1:]:
        if tok.startswith("w") and tok[1:].isdigit():
            over["tpu.encoder_window"] = int(tok[1:])
        elif tok not in ("f32", "remat0"):
            raise ValueError(f"unknown ablation token {tok!r} in {mode!r}")
    return over


def train_and_eval(mode: str, train_scenes, eval_scenes, seed=SEED):
    import jax
    import jax.numpy as jnp
    from trackformer_tpu.engine import (TrainState, make_optimizer,
                                        make_train_step)
    from trackformer_tpu.models import build_model
    from trackformer_tpu.structures import FrameBatch
    from trackformer_tpu.utils.config import load_config, nested_namespace

    # AGREE_LR / AGREE_WARMUP: optimizer bisection knobs for the flagship
    # fast-arm training collapse (loss plateaus at ~20, encoder output goes
    # input-independent at 6 windowed layers; 4 layers train fine)
    lr = float(os.environ.get("AGREE_LR", "4e-4"))
    over = {
        **MODEL_OVER, "dataset": "mot",
        "aux_loss": True, "lr": lr, "lr_backbone": lr, "dropout": 0.0,
        "tpu.decoder_attention": "msda",
        "tpu.lr_warmup_steps": int(os.environ.get("AGREE_WARMUP", "0")),
        **_mode_over(mode),
    }
    cfg = load_config("train.yaml", ["deformable"], over)
    cfg["tpu"]["compute_dtype"] = ("bfloat16" if SCALE == "flagship"
                                  else "float32")
    cfg["tpu"]["remat"] = SCALE == "flagship"
    toks = mode.split("_")[1:]
    if "f32" in toks:
        cfg["tpu"]["compute_dtype"] = "float32"
    if "remat0" in toks:
        cfg["tpu"]["remat"] = False
    # scan_layers also for 'mid': XLA:CPU compile of the UNROLLED 288-dim
    # model exceeded an hour; the scanned HLO compiles in minutes
    cfg["tpu"]["scan_layers"] = SCALE in ("flagship", "mid")
    args = nested_namespace(cfg)
    args.lr_drop_steps = [int(STEPS * 0.8)]
    model, crit_cfg, post, _ = build_model(args)

    rng = jax.random.PRNGKey(seed)
    imgs0 = jnp.asarray(np.stack([s[0] for s in train_scenes[:BATCH]]))
    batch0 = FrameBatch.from_images(imgs0, jnp.array([[H, W]] * BATCH))
    params = jax.jit(model.init)(rng, batch0)
    opt = make_optimizer(args, params)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(model, crit_cfg, opt, tracking=False))

    # mid-train resume (the round-3 dev-tunnel outage killed a flagship run
    # 90 min in with nothing to show): every SAVE_EVERY steps the full
    # TrainState pytree + loss history goes to an atomic npz; a restarted
    # run replays the data-order RNG for the skipped steps so the sequence
    # of batches is identical to an uninterrupted run.
    SAVE_EVERY = 100
    tck = Path("/tmp") / (f"agreement_{SCALE}_{STEPS}_{mode}"
                          + (f"_s{SEED}" if SEED else "") + "_train.npz")
    leaves, treedef = jax.tree_util.tree_flatten(state)
    start, losses = 0, []
    if tck.exists():
        z = np.load(tck)
        state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(z[f"a{i}"]) for i in range(len(leaves))])
        start = int(z["it"])
        losses = [float(v) for v in z["losses"]]
        print(f"{mode}: resuming at step {start} from {tck}", flush=True)

    def save_train(it):
        arrs = {f"a{i}": np.asarray(leaf) for i, leaf in
                enumerate(jax.tree_util.tree_leaves(state))}
        arrs["it"] = np.array(it)
        arrs["losses"] = np.array(losses)
        tmp = tck.with_suffix(".tmp.npz")
        np.savez(tmp, **arrs)
        tmp.replace(tck)

    # Feed from DEVICE-RESIDENT data: uploading each step's 4 images anew
    # costs ~0.1-1 s/step through the axon tunnel (~100 MB/s effective,
    # CLAUDE.md), which dominated the first on-chip flagship attempt.
    # Upload all scenes once, then per-step device-side takes.
    scenes_dev = jnp.asarray(np.stack([s[0] for s in train_scenes]))
    targets_all = to_targets([s[1] for s in train_scenes])
    # validity mask is size-only -> constant across steps; build once
    batch_tmpl = FrameBatch.from_images(scenes_dev[:BATCH],
                                        jnp.array([[H, W]] * BATCH))

    # Losses stay device arrays until a sync point (print/save cadence):
    # a per-step float() readback adds an RTT-long pipeline stall per step.
    pend = []

    def drain():
        nonlocal pend
        losses.extend(float(v) for v in pend)
        pend = []

    order = np.random.RandomState(seed + 1)
    end = min(STEPS, max(start, MAX_STEPS))
    for it in range(STEPS):
        idx = order.choice(len(train_scenes), BATCH, replace=False)
        if it < start or it >= end:
            continue
        if it % 100 == 0:
            drain()
            print(f"{mode} step {it}/{STEPS}"
                  + (f" (budget {end})" if end < STEPS else ""), flush=True)
        idx_dev = jnp.asarray(idx)
        imgs = jnp.take(scenes_dev, idx_dev, axis=0)
        targets = jax.tree.map(lambda x: jnp.take(x, idx_dev, axis=0),
                               targets_all)
        pack = {"batch": batch_tmpl.replace(images=imgs),
                "targets": targets}
        state, metrics = step(state, pack, jax.random.PRNGKey(it))
        pend.append(metrics["loss"])
        if (it + 1) % SAVE_EVERY == 0 and it + 1 < end:
            drain()
            save_train(it + 1)
    drain()
    print(f"{mode}: loss {np.mean(losses[:10]):.3f} -> "
          f"{np.mean(losses[-10:]):.3f}", flush=True)

    # held-out predictions — evaluated in BATCH-sized chunks: jitting one
    # B=N_EVAL forward is a 6x-bigger program than anything trained above,
    # and at flagship scale that one-off compile blew up the remote-compile
    # helper (HTTP 500) AFTER 2000 steps of training had succeeded.  Chunked
    # eval keeps the program the same size class as the train-step forward.
    fwd = jax.jit(lambda p, b: post["bbox"](
        model.apply(p, b, None, deterministic=True)[0],
        jnp.array([[H, W]] * BATCH)))
    imgs = np.stack([s[0] for s in eval_scenes])
    n = len(eval_scenes)
    out = {}
    for lo in range(0, n, BATCH):
        chunk = imgs[lo:lo + BATCH]
        pad = BATCH - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:pad])])
        res = fwd(state.params,
                  FrameBatch.from_images(jnp.asarray(chunk),
                                         jnp.array([[H, W]] * BATCH)))
        for j in range(min(BATCH, n - lo)):
            out[lo + j] = {"boxes": np.asarray(res["boxes"][j]),
                           "scores": np.asarray(res["scores"][j]),
                           "labels": np.asarray(res["labels"][j])}
    return out, losses


def eval_map(preds, gt_by_img):
    """AP@[.5:.95] via the in-repo evaluator against a minimal GT facade."""
    from trackformer_tpu.datasets.coco_eval import CocoEvaluator

    class GT:
        pass

    gt = GT()
    gt.anns_by_image = gt_by_img
    gt.images = {i: {"height": H, "width": W} for i in gt_by_img}
    ev = CocoEvaluator(gt, ["bbox"])
    ev.update(preds)
    stats = ev.summarize()
    return float(stats["bbox"][0]), float(stats["bbox"][1])


def boxes_to_anns(scenes):
    out = {}
    aid = 0
    for i, (_, boxes) in enumerate(scenes):
        anns = []
        for b in boxes:
            anns.append({"id": aid, "image_id": i, "category_id": 0,
                         "bbox": [float(v) for v in b],
                         "area": float(b[2] * b[3]), "iscrowd": 0,
                         "ignore": 0})
            aid += 1
        out[i] = anns
    return out


def preds_to_anns(preds, score_thresh=0.5):
    """Detections -> pseudo-GT for the cross-agreement metric.

    Keep only label-0 (person-class) detections: reference-parity focal
    postprocess takes max over ALL logit columns INCLUDING the trained
    background column (deformable_detr.py:316), so a well-trained model
    emits ~Q background 'detections' at p~1 with label == background —
    every consumer (tracker, evaluator) filters by label, and this
    pseudo-GT builder must too (round 4: unfiltered background boxes made
    cross_agreement_ap50 collapse to 0.08 while both arms scored 0.57+
    against the real GT)."""
    out = {}
    aid = 0
    for i, p in preds.items():
        anns = []
        keep = (p["scores"] >= score_thresh) & (p["labels"] == 0)
        for b in p["boxes"][keep]:
            x0, y0, x1, y1 = [float(v) for v in b]
            anns.append({"id": aid, "image_id": i, "category_id": 0,
                         "bbox": [x0, y0, x1 - x0, y1 - y0],
                         "area": float((x1 - x0) * (y1 - y0)),
                         "iscrowd": 0, "ignore": 0})
            aid += 1
        out[i] = anns
    return out


def _ckpt_path(mode):
    return Path("/tmp") / (f"agreement_{SCALE}_{STEPS}_{mode}"
                       + (f"_s{SEED}" if SEED else "") + ".npz")


def _run_mode_cached(mode, train_scenes, eval_scenes):
    """train_and_eval with an on-disk per-mode checkpoint, so a killed run
    (dev-tunnel outage, wall-clock limit) never repays a completed mode."""
    p = _ckpt_path(mode)
    if p.exists():
        z = np.load(p)
        n = int(z["n"])
        preds = {i: {"boxes": z[f"b{i}"], "scores": z[f"s{i}"],
                     "labels": z[f"l{i}"]} for i in range(n)}
        print(f"{mode}: reusing checkpoint {p}", flush=True)
        return preds, list(z["losses"])
    preds, losses = train_and_eval(mode, train_scenes, eval_scenes)
    arrs = {"n": np.array(len(preds)), "losses": np.array(losses)}
    for i, pr in preds.items():
        arrs[f"b{i}"], arrs[f"s{i}"], arrs[f"l{i}"] = (
            pr["boxes"], pr["scores"], pr["labels"])
    np.savez(p, **arrs)
    return preds, losses


def main():
    rng = np.random.RandomState(0)
    train_scenes = [make_scene(rng) for _ in range(N_TRAIN)]
    eval_scenes = [make_scene(rng) for _ in range(N_EVAL)]
    gt = boxes_to_anns(eval_scenes)

    # AGREE_MODES=exact (or =fast) trains just that arm and exits — lets a
    # long flagship run fill the TPU with the exact arm while the fast
    # architecture is still being ablated; the cached per-mode checkpoint
    # makes the final both-arms invocation free for the completed side.
    only = os.environ.get("AGREE_MODES")
    if only and "exact" not in only.split(","):
        pass
    else:
        _run_mode_cached("exact", train_scenes, eval_scenes)
    if only and "fast" not in only.split(","):
        print(f"AGREE_MODES={only}: stopping before the other arm",
              flush=True)
        return

    exact_preds, exact_losses = _run_mode_cached("exact", train_scenes,
                                                 eval_scenes)
    fast_preds, fast_losses = _run_mode_cached("fast", train_scenes,
                                               eval_scenes)

    exact_ap, exact_ap50 = eval_map(exact_preds, gt)
    fast_ap, fast_ap50 = eval_map(fast_preds, gt)
    cross_ap, cross_ap50 = eval_map(fast_preds, preds_to_anns(exact_preds))
    steps_trained = min(STEPS, MAX_STEPS)

    # optional ablation arms (AGREE_ABLATIONS=fast_w16,...): each trains
    # cached under the same budget and is reported alongside — the probe
    # for attributing the fast arm's loss/AP deficit (VERDICT r3 weak #1)
    ablations = {}
    for mode in filter(None, os.environ.get(
            "AGREE_ABLATIONS", "").split(",")):
        ab_preds, ab_losses = _run_mode_cached(mode, train_scenes,
                                               eval_scenes)
        ab_ap, ab_ap50 = eval_map(ab_preds, gt)
        ablations[mode] = {
            "map": round(ab_ap, 4), "ap50": round(ab_ap50, 4),
            "final_loss": round(float(np.mean(ab_losses[-10:])), 4)}
    result = {
        "task": (f"synthetic {W}x{H} rectangle detection, {N_TRAIN} train /"
                 f" {N_EVAL} held-out scenes, {steps_trained} steps each"
                 " mode"),
        "agreement_scale": SCALE,
        "steps_trained": steps_trained,
        "model": dict(MODEL_OVER),
        # both arms train under the SAME optimizer; warmup exists because
        # the 6-layer windowed (fast) encoder collapses without it — the
        # exact arm trains either way (PLAN.md round-4 bisection table)
        "optimizer": {"lr": float(os.environ.get("AGREE_LR", "4e-4")),
                      "lr_warmup_steps": int(os.environ.get(
                          "AGREE_WARMUP", "0"))},
        "exact_map": round(exact_ap, 4),
        "fast_map": round(fast_ap, 4),
        "exact_ap50": round(exact_ap50, 4),
        "fast_ap50": round(fast_ap50, 4),
        "cross_agreement_map": round(cross_ap, 4),
        "cross_agreement_ap50": round(cross_ap50, 4),
        "exact_final_loss": round(float(np.mean(exact_losses[-10:])), 4),
        "fast_final_loss": round(float(np.mean(fast_losses[-10:])), 4),
    }
    if ablations:
        result["ablations"] = ablations
    out = Path(__file__).resolve().parent.parent / (
        f"AGREEMENT_s{SEED}.json" if SEED else "AGREEMENT.json")
    if out.exists():  # preserve the tracking-level section
        prev = json.loads(out.read_text())
        if "tracking" in prev:
            result["tracking"] = prev["tracking"]
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
