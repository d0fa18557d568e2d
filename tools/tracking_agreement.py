"""Tracking-level fidelity bound for the TPU-fast mode (VERDICT r4 #4).

tools/fast_exact_agreement.py bounds the windowed encoder at the DETECTION
level (AP); the headline metric is *tracking* throughput, so this tool
bounds what the fast mode does to identity propagation: both arms train
from scratch with track-query augmentation (`make_train_step(tracking=True)`,
the reference's two-frame scheme, models/tracking.py) on synthetic
moving-rectangle SEQUENCES with persistent identities, then both trained
models drive the real Tracker (tracking/tracker.py) over held-out
sequences and are scored with the owned CLEAR-MOT/IDF1 implementation
(utils/mot_metrics.py — the metrics the reference publishes,
/root/reference/README.md:47-50 via util/track_utils.py:405-417).

Reported (merged into AGREEMENT.json under "tracking"):
  * {exact,fast}_{mota,idf1} — each arm vs the true identities
  * cross_idf1 / cross_mota  — the fast arm's tracks scored against the
    exact arm's tracks as pseudo-ground-truth (direct ID agreement)

Small regime (CPU-runnable sanity):
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/tracking_agreement.py 60 small
TPU regime:
  python tools/tracking_agreement.py 800 mid
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 800
SCALE = sys.argv[2] if len(sys.argv) > 2 else "mid"
SEED = int(os.environ.get("AGREE_SEED", "0"))

if SCALE == "mid":
    H, W = 192, 256
    N_SEQ, N_EVAL_SEQ, T = 12, 6, 12
    BATCH = 4
    N_OBJ, BOX_LO, BOX_HI, VMAX = 4, 24, 56, 6
    MODEL_OVER = {"enc_layers": 4, "dec_layers": 4, "hidden_dim": 288,
                  "nheads": 8, "dim_feedforward": 1024, "num_queries": 32}
    MAX_OBJ = 6
else:
    H, W = 96, 128
    N_SEQ, N_EVAL_SEQ, T = 6, 3, 6
    BATCH = 4
    N_OBJ, BOX_LO, BOX_HI, VMAX = 2, 18, 36, 4
    MODEL_OVER = {"enc_layers": 2, "dec_layers": 2, "hidden_dim": 96,
                  "nheads": 4, "dim_feedforward": 128, "num_queries": 12}
    MAX_OBJ = 4


def make_sequence(rng):
    """T frames of N_OBJ colored rectangles moving with constant velocity
    (bouncing); returns (frames (T,H,W,3) f32, gts: per frame {tid: xyxy})."""
    n = rng.randint(max(1, N_OBJ - 1), N_OBJ + 1)
    pos = rng.uniform([0, 0], [W - BOX_HI - 1, H - BOX_HI - 1],
                      (n, 2)).astype(np.float64)
    vel = rng.uniform(-VMAX, VMAX, (n, 2))
    size = rng.randint(BOX_LO, BOX_HI, (n, 2)).astype(np.float64)
    color = rng.uniform(0.6, 1.6, (n, 3)).astype(np.float32)
    frames, gts = [], []
    for _ in range(T):
        img = rng.normal(0.0, 0.25, (H, W, 3)).astype(np.float32)
        gt = {}
        for o in range(n):
            x, y = pos[o]
            bw, bh = size[o]
            xi, yi = int(round(x)), int(round(y))
            img[yi:yi + int(bh), xi:xi + int(bw)] += color[o]
            gt[o] = np.array([x, y, x + bw, y + bh], np.float32)
        frames.append(img)
        gts.append(gt)
        pos += vel
        for d, lim in ((0, W), (1, H)):
            over = (pos[:, d] < 0) | (pos[:, d] + size[:, d] > lim - 1)
            vel[over, d] *= -1
            pos[:, d] = np.clip(pos[:, d], 0, lim - 1 - size[:, d])
    return np.stack(frames), gts


def gts_to_targets(gts_batch):
    """List of per-image {tid: xyxy} -> padded Targets with track_ids."""
    import jax.numpy as jnp

    from trackformer_tpu.structures import empty_targets
    b = len(gts_batch)
    t = empty_targets(b, MAX_OBJ)
    valid = np.zeros((b, MAX_OBJ), bool)
    labels = np.zeros((b, MAX_OBJ), np.int32)
    tids = np.full((b, MAX_OBJ), -1, np.int32)
    boxes = np.zeros((b, MAX_OBJ, 4), np.float32)
    for i, gt in enumerate(gts_batch):
        for j, (tid, bx) in enumerate(sorted(gt.items())[:MAX_OBJ]):
            valid[i, j] = True
            tids[i, j] = tid
            x0, y0, x1, y1 = bx
            boxes[i, j] = [(x0 + x1) / 2 / W, (y0 + y1) / 2 / H,
                           (x1 - x0) / W, (y1 - y0) / H]
    return t.replace(valid=jnp.asarray(valid), labels=jnp.asarray(labels),
                     boxes=jnp.asarray(boxes), track_ids=jnp.asarray(tids))


def train_arm(mode, train_seqs):
    import jax
    import jax.numpy as jnp

    from trackformer_tpu.engine import (TrainState, make_optimizer,
                                        make_train_step)
    from trackformer_tpu.models import build_model
    from trackformer_tpu.structures import FrameBatch
    from trackformer_tpu.utils.config import load_config, nested_namespace

    lr = float(os.environ.get("AGREE_LR", "4e-4"))
    over = {
        **MODEL_OVER, "dataset": "mot", "aux_loss": True,
        "lr": lr, "lr_backbone": lr, "dropout": 0.0,
        "tpu.decoder_attention": "msda",
        "tpu.encoder_attention": ("windowed" if mode == "fast" else "msda"),
        "tpu.max_objects": MAX_OBJ,
        "tpu.lr_warmup_steps": int(os.environ.get("AGREE_WARMUP", "100")),
    }
    cfg = load_config("train.yaml", ["deformable", "tracking"], over)
    # two-frame track queries WITHOUT multi-frame attention: isolates the
    # encoder-mode question from the separate-encoder memory layout
    cfg["multi_frame_attention"] = False
    cfg["multi_frame_encoding"] = False
    cfg["multi_frame_attention_separate_encoder"] = False
    cfg["tpu"]["compute_dtype"] = "float32"
    cfg["tpu"]["remat"] = False
    cfg["tpu"]["scan_layers"] = SCALE == "mid"
    args = nested_namespace(cfg)
    args.lr_drop_steps = [int(STEPS * 0.8)]
    model, crit_cfg, post, tracking_cfg = build_model(args)

    rng = jax.random.PRNGKey(SEED)
    frames_dev = jnp.asarray(np.stack([s[0] for s in train_seqs]))
    targets_all = gts_to_targets(
        [gt for s in train_seqs for gt in s[1]])  # (N_SEQ*T) flat
    sizes = jnp.array([[H, W]] * BATCH)
    batch_tmpl = FrameBatch.from_images(
        frames_dev[0, :BATCH], sizes)

    params = jax.jit(model.init)(rng, batch_tmpl)
    opt = make_optimizer(args, params)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(model, crit_cfg, opt, tracking_cfg,
                                   tracking=True))

    order = np.random.RandomState(SEED + 1)
    losses, pend = [], []

    def drain():
        nonlocal pend
        losses.extend(float(v) for v in pend)
        pend = []

    for it in range(STEPS):
        seq_i = order.randint(0, len(train_seqs), BATCH)
        t_i = order.randint(1, T, BATCH)
        flat_cur = jnp.asarray(seq_i * T + t_i)
        flat_prev = jnp.asarray(seq_i * T + t_i - 1)
        imgs = jnp.take(frames_dev.reshape(-1, H, W, 3), flat_cur, axis=0)
        prev_imgs = jnp.take(frames_dev.reshape(-1, H, W, 3), flat_prev,
                             axis=0)
        tsel = jax.tree.map(lambda x: jnp.take(x, flat_cur, axis=0),
                            targets_all)
        tprev = jax.tree.map(lambda x: jnp.take(x, flat_prev, axis=0),
                             targets_all)
        pack = {"batch": batch_tmpl.replace(images=imgs), "targets": tsel,
                "prev_batch": batch_tmpl.replace(images=prev_imgs),
                "prev_targets": tprev}
        state, metrics = step(state, pack, jax.random.PRNGKey(it))
        pend.append(metrics["loss"])
        if it % 100 == 0:
            drain()
            print(f"{mode} step {it}/{STEPS} "
                  f"loss {losses[-1] if losses else float('nan'):.3f}",
                  flush=True)
    drain()
    print(f"{mode}: loss {np.mean(losses[:10]):.3f} -> "
          f"{np.mean(losses[-10:]):.3f}", flush=True)
    return model, state.params, post, args, losses


def run_tracker(model, params, post, args, eval_seqs):
    import jax.numpy as jnp

    from trackformer_tpu.structures import FrameBatch
    from trackformer_tpu.tracking.tracker import Tracker

    def apply_fn(p, batch, targets, prev_features):
        return model.apply(p, batch, targets, prev_features,
                           deterministic=True)

    cfg = {"detection_obj_score_thresh": 0.5,
           "track_obj_score_thresh": 0.5,
           "detection_nms_thresh": 0.9, "track_nms_thresh": 0.9,
           "max_tracks": 32}
    all_results = []
    for frames, _ in eval_seqs:
        tracker = Tracker(params=params, apply_fn=apply_fn,
                          postprocess=post["bbox"], tracker_cfg=cfg,
                          hidden_dim=args.hidden_dim,
                          num_object_queries=args.num_queries)
        for img in frames:
            tracker.step({"batch": FrameBatch.from_images(
                jnp.asarray(img)[None], jnp.array([[H, W]])),
                "orig_size": np.array([[H, W]])})
        all_results.append(tracker.get_results())
    return all_results


class _GtSeq:
    """Minimal sequence facade for get_mot_accum: .data[i]['gt']."""

    def __init__(self, gts, name):
        self.data = [{"gt": g} for g in gts]
        self._name = name

    def __len__(self):
        return len(self.data)

    def __str__(self):
        return self._name


def score(results_per_seq, gts_per_seq, tag):
    from trackformer_tpu.utils.mot_metrics import summarize
    from trackformer_tpu.utils.track_utils import get_mot_accum
    accums = [get_mot_accum(res, _GtSeq(gts, f"{tag}{i}"))
              for i, (res, gts) in enumerate(
                  zip(results_per_seq, gts_per_seq))]
    overall = summarize(accums)["OVERALL"]
    return float(overall["mota"]), float(overall["idf1"])


def results_as_gts(results_per_seq, n_frames):
    """Tracker results -> per-frame {tid: xyxy} (pseudo-GT for cross-arm
    ID agreement)."""
    out = []
    for res in results_per_seq:
        gts = [dict() for _ in range(n_frames)]
        for tid, track in res.items():
            for f, row in track.items():
                gts[f][tid] = np.asarray(row["bbox"][:4], np.float32)
        out.append(gts)
    return out


def main():
    rng = np.random.RandomState(0)
    train_seqs = [make_sequence(rng) for _ in range(N_SEQ)]
    eval_seqs = [make_sequence(rng) for _ in range(N_EVAL_SEQ)]
    eval_gts = [s[1] for s in eval_seqs]

    arms = {}
    for mode in ("exact", "fast"):
        ck = Path("/tmp") / (f"track_agree_{SCALE}_{STEPS}_{mode}"
                             + (f"_s{SEED}" if SEED else "") + ".npz")
        model, params, post, args, losses = train_arm(mode, train_seqs)
        results = run_tracker(model, params, post, args, eval_seqs)
        mota, idf1 = score(results, eval_gts, mode)
        arms[mode] = {"results": results, "mota": mota, "idf1": idf1,
                      "final_loss": float(np.mean(losses[-10:]))}
        print(f"{mode}: MOTA {mota:.3f} IDF1 {idf1:.3f}", flush=True)
        del ck  # per-arm caching handled by AGREEMENT.json merge below

    cross_mota, cross_idf1 = score(
        arms["fast"]["results"],
        results_as_gts(arms["exact"]["results"], T), "cross")

    tracking = {
        "task": (f"synthetic {W}x{H} moving-rectangle tracking, "
                 f"{N_SEQ} train / {N_EVAL_SEQ} held-out sequences of "
                 f"{T} frames, {STEPS} two-frame track-query steps each"
                 " mode"),
        "scale": SCALE,
        "exact_mota": round(arms["exact"]["mota"], 4),
        "exact_idf1": round(arms["exact"]["idf1"], 4),
        "fast_mota": round(arms["fast"]["mota"], 4),
        "fast_idf1": round(arms["fast"]["idf1"], 4),
        "cross_mota": round(cross_mota, 4),
        "cross_idf1": round(cross_idf1, 4),
        "exact_final_loss": round(arms["exact"]["final_loss"], 4),
        "fast_final_loss": round(arms["fast"]["final_loss"], 4),
    }
    if SCALE == "small":  # sanity scale must not pollute the real artifact
        out_path = Path("/tmp/AGREEMENT_small.json")
    else:
        out_path = Path(__file__).resolve().parent.parent / (
            f"AGREEMENT_s{SEED}.json" if SEED else "AGREEMENT.json")
    merged = {}
    if out_path.exists():
        merged = json.loads(out_path.read_text())
    merged["tracking"] = tracking
    out_path.write_text(json.dumps(merged, indent=2))
    print(json.dumps(tracking, indent=2))


if __name__ == "__main__":
    main()
