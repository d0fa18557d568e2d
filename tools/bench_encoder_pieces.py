"""Component-level windowed-encoder micro-bench at the HEADLINE batch.

tools/bench_headline_breakdown.py (B=8, flagship 800x1344) attributes
~100 ms/step to the 6-layer windowed encoder whose bf16 FLOP bound is
~13 ms — this tool times the encoder's constituent ops AT B=8 to find
where the 8x goes:

  * full encoder (routed config)
  * one WindowedEncoderLayer (attention + windowed FFN)
  * attention core only (MultiHeadAttention over all levels' windows)
  * FFN only (flat tokens)
  * layout only (window partition + merge chains, both parities)
  * CrossLevelFusion only

Each row is chained K times with ONE small readback, tunnel RTT
subtracted (CLAUDE.md timing rule); XLA cost-analysis FLOPs + bytes are
printed per row so each measurement can be read against its compute and
bandwidth bounds (v5e: 197 TFLOP/s bf16, ~819 GB/s HBM).

Usage: python tools/bench_encoder_pieces.py [B] [K]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.models import windowed_encoder as we
from trackformer_tpu.models.attention import MultiHeadAttention

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
C, NH, FF, WIN = 288, 8, 1024, 8
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
S = sum(h * w for h, w in SHAPES)
DT = jnp.bfloat16

rng = jax.random.PRNGKey(0)
keys = jax.random.split(rng, 2 * len(SHAPES))
srcs = [jax.random.normal(keys[i], (B, h, w, C), DT)
        for i, (h, w) in enumerate(SHAPES)]
poses = [jax.random.normal(keys[len(SHAPES) + i], (B, h, w, C), DT)
         for i, (h, w) in enumerate(SHAPES)]
masks = [jnp.zeros((B, h, w), bool) for h, w in SHAPES]


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
print(f"B={B} K={K} rtt={RTT*1e3:.1f}ms  S={S} C={C} bf16"
      f"  layout={'gather' if we.GATHER_LAYOUT else 'transpose'}"
      f"  fusion={we.FUSION_IMPL}", flush=True)


def timeit(label, make_fn, x0):
    """make_fn -> (jitted chainable fn x->x). Prints ms + FLOP/bytes."""
    jfn = jax.jit(make_fn)
    y = jfn(x0)
    np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = x0
        for _ in range(K):
            z = jfn(z)
        np.asarray(jax.tree.leaves(z)[0].reshape(-1)[:1])
        best = min(best, time.perf_counter() - t0 - RTT)
    ms = best / K * 1e3
    fl = by = None
    try:
        ca = jfn.lower(x0).cost_analysis()
        fl = ca.get("flops")
        by = ca.get("bytes accessed")
    except Exception:
        pass
    extra = ""
    if fl:
        extra += f"  {fl/1e9:7.1f} GF ({fl/best/1e12:5.1f} TF/s)"
    if by:
        extra += f"  {by/1e6:7.0f} MB ({by/best/1e9:5.0f} GB/s)"
    print(f"{label:34s} {ms:8.2f} ms{extra}", flush=True)
    return ms


# --- full encoder -----------------------------------------------------
enc = we.WindowedEncoder(C, num_layers=6, nheads=NH, dim_feedforward=FF,
                         window=WIN, dtype=DT)
ep = jax.jit(enc.init)(jax.random.PRNGKey(1), srcs, masks, poses)


def full_enc(x0):
    lv = [x0] + srcs[1:]
    out = enc.apply(ep, lv, masks, poses)
    return x0 + jnp.mean(out).astype(x0.dtype) * 1e-9


timeit("full encoder (6 layers)", full_enc, srcs[0])

# --- one layer (no fusion) --------------------------------------------
layer = we.WindowedEncoderLayer(C, NH, FF, 0.0, WIN, shift=False, dtype=DT)
lp = jax.jit(layer.init)(jax.random.PRNGKey(2), srcs, poses, masks, True)


def one_layer(x0):
    lv = [x0] + srcs[1:]
    out = layer.apply(lp, lv, poses, masks, True)
    return x0 + sum(jnp.mean(o).astype(x0.dtype) for o in out) * 1e-9


timeit("one layer (attn+FFN, no fusion)", one_layer, srcs[0])

# --- attention core over all windows ----------------------------------
pw, kp = we.window_context(poses, masks, WIN, False, DT)
xw0 = jnp.concatenate(
    [we.window_partition(we._pad_hw(x, WIN)[0], WIN) for x in srcs], axis=0)
mha = MultiHeadAttention(C, NH, 0.0, DT)
mp = jax.jit(mha.init)(jax.random.PRNGKey(3), xw0 + pw, xw0 + pw, xw0, kp,
                       True)


def attn_core(xw):
    q = xw + pw
    out = mha.apply(mp, q, q, xw, kp, True)
    return xw + out * 1e-9


timeit("attention core (all windows)", attn_core, xw0)

# --- FFN over flat tokens ----------------------------------------------
from flax import linen as nn


class FFN(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(FF, dtype=DT, name="linear1")(x))
        y = nn.Dense(C, dtype=DT, name="linear2")(h)
        return nn.LayerNorm(dtype=DT, name="norm2")(x + y)


flat0 = jnp.concatenate([x.reshape(B, -1, C) for x in srcs], axis=1)
ffn = FFN()
fp = jax.jit(ffn.init)(jax.random.PRNGKey(4), flat0)


def ffn_only(x):
    return x + ffn.apply(fp, x) * 1e-9


timeit("FFN+LN (flat tokens)", ffn_only, flat0)

# --- layout only: partition + merge, both parities ---------------------


def layout_only(x0):
    lv = [x0] + srcs[1:]
    outs = []
    for shift in (False, True):
        sh = WIN // 2 if shift else 0
        xw_all, meta = [], []
        for x in lv:
            s = x.shape
            if sh:
                x = jnp.roll(x, (-sh, -sh), axis=(1, 2))
            x, hp, wp = we._pad_hw(x, WIN)
            xw_all.append(we.window_partition(x, WIN))
            meta.append((s[0], s[1], s[2], hp, wp, xw_all[-1].shape[0]))
        xw = jnp.concatenate(xw_all, axis=0)
        xw = xw + jnp.bfloat16(1e-9)  # keep the chain alive
        off, lv2 = 0, []
        for bb, h0, w0, hp, wp, n in meta:
            a = xw[off:off + n]
            off += n
            a = we.window_merge(a, bb, hp, wp, WIN)[:, :h0, :w0]
            if sh:
                a = jnp.roll(a, (sh, sh), axis=(1, 2))
            lv2.append(a)
        outs.append(lv2[0])
    return x0 + sum(jnp.mean(o).astype(x0.dtype) for o in outs) * 1e-9


timeit("layout x2 (partition+merge)", layout_only, srcs[0])

# --- fusion only --------------------------------------------------------
fuse = we.CrossLevelFusion(C, dtype=DT)
fzp = jax.jit(fuse.init)(jax.random.PRNGKey(5), srcs)


def fusion_only(x0):
    lv = [x0] + srcs[1:]
    out = fuse.apply(fzp, lv)
    return x0 + sum(jnp.mean(o).astype(x0.dtype) for o in out) * 1e-9


timeit("cross-level fusion (1x)", fusion_only, srcs[0])
