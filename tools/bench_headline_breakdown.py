"""Headline-mode latency breakdown at the bench batch (one TPU chip).

bench.py's headline is B lockstep sequences through the tpu-fast tracker
step (windowed encoder + exact-MSDA decoder + cached prev-frame memory) at
800x1344. PLAN.md's component table is B=1; at B=8 the known components
(backbone/encoder/decoder/track logic) summed well short of the measured
step, so this tool times the nested prefixes of the real step at the
headline batch to attribute the remainder:

  backbone -> +input proj/embeds -> +encoder -> full model fwd
  -> +postprocess -> full tracker step (= bench.py step)

Each prefix is chained K times with one small readback and the tunnel RTT
subtracted (CLAUDE.md timing rule). Differences between consecutive rows
are the per-stage costs.

Usage: python tools/bench_headline_breakdown.py [B] [K]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from trackformer_tpu.models import build_model
from trackformer_tpu.structures import FrameBatch, empty_targets
from trackformer_tpu.tracking.tracker import (TrackerConfig, init_state,
                                              make_tracker_step,
                                              _prepare_track_queries)
from trackformer_tpu.utils.config import load_config, nested_namespace

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
# BENCH_HW: CPU smoke-testing the wiring only (as in bench.py)
import os
H, W = (int(v) for v in os.environ.get("BENCH_HW", "800,1344").split(","))

cfg = load_config("train.yaml", ["deformable", "tracking", "multi_frame"],
                  {"tpu.encoder_attention": "windowed",
                   "tpu.decoder_attention": "msda",
                   "tpu.cached_prev_memory": True})
args = nested_namespace(cfg)
model, _, post, _ = build_model(args)

rng = jax.random.PRNGKey(0)
imgs = jax.random.normal(rng, (B, H, W, 3), jnp.float32)
batch = FrameBatch.from_images(imgs, jnp.array([[H, W]] * B, jnp.int32))
params = jax.jit(model.init)(rng, batch)

tcfg = TrackerConfig(max_tracks=64, num_object_queries=args.num_queries,
                     overflow_boxes=args.overflow_boxes)
states = jax.tree.map(
    lambda *xs: jnp.stack(xs),
    *[init_state(tcfg.max_tracks, args.hidden_dim) for _ in range(B)])
orig = jnp.array([[1080, 1920]] * B, jnp.int32)
pub_b = jnp.zeros((B, 128, 4), jnp.float32)
pub_v = jnp.zeros((B, 128), bool)


def rtt_probe():
    @jax.jit
    def p(x):
        return x + 1.0
    float(p(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(p(jnp.float32(0)))
    return (time.perf_counter() - t0) / 10


RTT = rtt_probe()
print(f"B={B} K={K} rtt={RTT*1e3:.1f}ms  {H}x{W} windowed+msda cached")


def timeit(label, fn, x):
    """fn: x -> x (chainable pytree); chained K, one readback, best of 3."""
    jfn = jax.jit(fn)
    y = jfn(x)
    np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = x
        for _ in range(K):
            z = jfn(z)
        np.asarray(jax.tree.leaves(z)[0].reshape(-1)[:1])
        best = min(best, time.perf_counter() - t0 - RTT)
    ms = best / K * 1e3
    print(f"{label:48s} {ms:8.2f} ms/step  ({ms/B:6.2f} /frame)", flush=True)
    return ms


# 1. backbone alone — chained on the image tensor: fold a tiny scalar of
# the output back into the input so XLA cannot dead-code the chain
def backbone_only(x):
    features, _masks = model.apply(params, batch.replace(images=x),
                                   method=lambda m, b: m.backbone(b))
    # fold EVERY feature level into the chain: the masks are size-only
    # (constant wrt images) and folding a single level lets XLA dead-code
    # the other levels' convs — both were measured as a bogus 1.26 ms/step
    s = sum(jnp.mean(f).astype(x.dtype) for f in jax.tree.leaves(features))
    return x + s * 1e-9


t_bb = timeit("backbone", backbone_only, imgs)


# 1b. + input proj / pos embeds (cached-mode style: current frame only)
def proj_only(x):
    def fn(m, bt):
        features, feat_masks = m.backbone(bt)
        cur3, cur3_masks = features[-3:], feat_masks[-3:]
        return m._project_frame(cur3, cur3_masks, cur3, bt.mask, 0)
    srcs, masks, poses = model.apply(params, batch.replace(images=x),
                                     method=fn)
    s = sum(jnp.mean(t).astype(x.dtype) for t in srcs)
    s = s + sum(jnp.mean(t).astype(x.dtype) for t in poses)
    return x + s * 1e-9


t_proj = timeit("+ input proj/pos (1 frame)", proj_only, imgs)


# 1c. + windowed encoder (cached-mode: ONE frame pass)
def enc_only(x):
    def fn(m, bt):
        features, feat_masks = m.backbone(bt)
        cur3, cur3_masks = features[-3:], feat_masks[-3:]
        srcs, masks, poses = m._project_frame(cur3, cur3_masks, cur3,
                                              bt.mask, 0)
        poses_wl = [
            (p + m.level_embed[i][None, None, None].astype(m.dtype))
            for i, p in enumerate(poses)]
        return m.encoder(srcs, masks, poses_wl, True)
    mem = model.apply(params, batch.replace(images=x), method=fn)
    return x + jnp.mean(mem).astype(x.dtype) * 1e-9


t_enc = timeit("+ windowed encoder (1 frame)", enc_only, imgs)


# 2. full model forward (with track-query slots, as the tracker step runs)
sts, tq_hs, tq_boxes, tq_valid = jax.vmap(
    lambda st, osz: _prepare_track_queries(st, osz, tcfg))(states, orig)
targets = empty_targets(B, 1).with_track_queries(tq_hs, tq_boxes, tq_valid)


def model_fwd(x):
    bt = batch.replace(images=x)
    out, _, feats, _, _ = model.apply(params, bt, targets, None,
                                      deterministic=True)
    s = (jnp.mean(out["pred_logits"]) + jnp.mean(out["pred_boxes"]))
    return x + s.astype(x.dtype) * 1e-9


t_fwd = timeit("model forward (uncached prev)", model_fwd, imgs)


# 3. model forward + postprocess
def fwd_post(x):
    bt = batch.replace(images=x)
    out, _, feats, _, _ = model.apply(params, bt, targets, None,
                                      deterministic=True)
    res = post["bbox"](out, orig)
    return x + jnp.mean(res["scores"]).astype(x.dtype) * 1e-9


t_post = timeit("model forward + postprocess", fwd_post, imgs)

# 4. full tracker step, cached prev features carried (the bench.py step)
step = make_tracker_step(
    lambda p, bt, t, pf: model.apply(p, bt, t, pf, deterministic=True),
    post["bbox"], tcfg, batched=True)

# 3b. CACHED-mode model forward (prev memory held constant): isolates the
# decode-over-2-frame-memory cost from the uncached double-encode above
_, _, feats_c = step(params, states, batch, orig, pub_b, pub_v, None)


def fwd_cached(x, fc):
    # fc passed as an ARGUMENT: closing over it bakes ~tens of MB of
    # feature constants into the HLO and the remote-compile hop rejects
    # the request body (HTTP 413)
    bt = batch.replace(images=x)
    out, _, _, _, _ = model.apply(params, bt, targets, fc,
                                  deterministic=True)
    s = (jnp.mean(out["pred_logits"]) + jnp.mean(out["pred_boxes"]))
    return x + s.astype(x.dtype) * 1e-9


jfc = jax.jit(fwd_cached)
y = jfc(imgs, feats_c)
np.asarray(y.reshape(-1)[:1])
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    z = imgs
    for _ in range(K):
        z = jfc(z, feats_c)
    np.asarray(z.reshape(-1)[:1])
    best = min(best, time.perf_counter() - t0 - RTT)
t_fwd_c = best / K * 1e3
print(f"{'model forward (cached prev memory)':48s} {t_fwd_c:8.2f} "
      f"ms/step  ({t_fwd_c/B:6.2f} /frame)", flush=True)


def full_step(carry, bt):
    st, feats = carry
    st2, res, feats2 = step(params, st, bt, orig, pub_b, pub_v, feats)
    return (st2, feats2)


st0, res0, feats0 = step(params, states, batch, orig, pub_b, pub_v, None)
jfull = jax.jit(full_step)  # batch passed as argument, not folded constant
c = (st0, feats0)
c = jfull(c, batch)
np.asarray(jax.tree.leaves(c[0])[0].reshape(-1)[:1])
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    z = c
    for _ in range(K):
        z = jfull(z, batch)
    np.asarray(jax.tree.leaves(z[0])[0].reshape(-1)[:1])
    best = min(best, time.perf_counter() - t0 - RTT)
ms_full = best / K * 1e3
print(f"{'full tracker step (cached feats carried)':48s} {ms_full:8.2f} "
      f"ms/step  ({ms_full/B:6.2f} /frame)")

print("\nattribution (deltas, ms/step):")
print(f"  backbone                  {t_bb:8.2f}")
print(f"  input proj/pos embeds     {t_proj - t_bb:8.2f}")
print(f"  windowed encoder (1 fr)   {t_enc - t_proj:8.2f}")
print(f"  decode+heads (cached mem) {t_fwd_c - t_enc:8.2f}")
print(f"  postprocess               {t_post - t_fwd:8.2f}")
print(f"  track logic               {ms_full - t_fwd_c:8.2f}   (incl. query prep/state update)")
print(f"  uncached fwd (reference)  {t_fwd:8.2f}   (double encode, vs cached {t_fwd_c:8.2f})")
print(f"  full step                 {ms_full:8.2f}")
