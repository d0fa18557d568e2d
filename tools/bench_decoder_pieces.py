"""Component-level decoder micro-bench at the HEADLINE batch.

tools/bench_headline_breakdown.py (B=8, flagship 800x1344, cached mode)
attributes ~116 ms/step to decode+heads — the decoder runs 6 exact-MSDA
layers over the CONCATENATED 2-frame memory (8 levels, ~44.6k tokens,
deformable_detr.py cached path). This tool times the decoder's pieces at
those exact shapes to find where the budget goes:

  * full decoder layer stack (6 shared-weight layers, timing proxy)
  * MSDA op alone at decoder shapes (8 levels)
  * MSDA split: gather levels only (the two 16.8k L0s) vs dense levels
  * self-attn + FFN only (the non-MSDA layer body)

Chained-K timing, ONE small readback, RTT subtracted (CLAUDE.md).

Usage: python tools/bench_decoder_pieces.py [B] [K]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.models.deformable_transformer import (
    DeformableDecoderLayer)
from trackformer_tpu.ops import msda

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
C, NH, NP, FF = 288, 8, 4, 1024
NQ = 640  # 500 object queries + 140 track slots (bench tracker config)
NL = 6
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
SHAPES2 = tuple(SHAPES + SHAPES)  # cached/parity: 2-frame concat memory
S2 = sum(h * w for h, w in SHAPES2)
D = C // NH
DT = jnp.bfloat16

rng = jax.random.PRNGKey(0)
mem = jax.random.normal(rng, (B, S2, C), DT)
tgt = jax.random.normal(jax.random.PRNGKey(1), (B, NQ, C), DT)
qpos = jax.random.normal(jax.random.PRNGKey(2), (B, NQ, C), DT)
dref = jnp.tile(
    jax.random.uniform(jax.random.PRNGKey(3), (B, NQ, 1, 2),
                       minval=0.2, maxval=0.8), (1, 1, len(SHAPES2), 1))
value = jax.random.normal(jax.random.PRNGKey(4), (B, S2, NH, D), DT)
locs = jnp.tile(
    jax.random.uniform(jax.random.PRNGKey(5),
                       (B, NQ, NH, 1, NP, 2), minval=0.1, maxval=0.9),
    (1, 1, 1, len(SHAPES2), 1, 1))
attw = jax.nn.softmax(
    jax.random.normal(jax.random.PRNGKey(6),
                      (B, NQ, NH, len(SHAPES2), NP)).reshape(
        B, NQ, NH, -1)).reshape(B, NQ, NH, len(SHAPES2), NP).astype(DT)


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
print(f"B={B} K={K} rtt={RTT*1e3:.1f}ms  NQ={NQ} S={S2} 8 levels bf16",
      flush=True)


def timeit(label, fn, x0):
    jfn = jax.jit(fn)
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
    print(f"{label:44s} {ms:8.2f} ms", flush=True)
    return ms


# --- full decoder stack (shared-weight proxy, as bench_parity_breakdown) —
dl = DeformableDecoderLayer(C, len(SHAPES2), NH, NP, FF, 0.0, dtype=DT,
                            attention="msda")
dp = dl.init(rng, tgt, qpos, dref, mem, SHAPES2)


def dec_stack(x):
    for _ in range(NL):
        x = dl.apply(dp, x, qpos, dref, mem, SHAPES2)
    return x


timeit(f"decoder {NL}L (full layers)", dec_stack, tgt)


# --- MSDA op alone, 8 levels -------------------------------------------
def msda_op(x):
    out = msda.ms_deform_attn(value, SHAPES2, locs + x * 1e-12, attw)
    return x + jnp.mean(out).astype(x.dtype) * 1e-9


timeit("MSDA op alone (8 levels)", msda_op, jnp.zeros((), DT))


# --- MSDA: only the two 16.8k gather levels ------------------------------
GL = tuple((h, w) for (h, w) in SHAPES2 if h * w > 6250)
sgl = sum(h * w for h, w in GL)
value_g = value[:, :sgl]
locs_g = locs[:, :, :, :len(GL)]
attw_g = attw[:, :, :, :len(GL)]


def msda_gather(x):
    out = msda.ms_deform_attn(value_g, GL, locs_g + x * 1e-12, attw_g)
    return x + jnp.mean(out).astype(x.dtype) * 1e-9


timeit("MSDA gather levels only (2x16.8k)", msda_gather, jnp.zeros((), DT))

# --- MSDA: only the six dense levels -------------------------------------
DL = tuple((h, w) for (h, w) in SHAPES2 if h * w <= 6250)
sdl = sum(h * w for h, w in DL)
value_d = value[:, :sdl]
locs_d = locs[:, :, :, :len(DL)]
attw_d = attw[:, :, :, :len(DL)]


def msda_dense(x):
    out = msda.ms_deform_attn(value_d, DL, locs_d + x * 1e-12, attw_d)
    return x + jnp.mean(out).astype(x.dtype) * 1e-9


timeit("MSDA dense levels only (6 small)", msda_dense, jnp.zeros((), DT))


# --- non-MSDA layer body: self-attn + FFN via a zero-level decoder? ------
# time the layer with the MSDA output subtracted out is not separable;
# approximate: self-attention (NQ x NQ) + FFN at decoder width
from flax import linen as nn

from trackformer_tpu.models.attention import MultiHeadAttention


class Body(nn.Module):
    @nn.compact
    def __call__(self, x):
        q = x + qpos
        a = MultiHeadAttention(C, NH, 0.0, DT, name="self_attn")(
            q, q, x, None, True)
        x = nn.LayerNorm(dtype=DT, name="norm2")(x + a)
        h = nn.relu(nn.Dense(FF, dtype=DT, name="linear1")(x))
        y = nn.Dense(C, dtype=DT, name="linear2")(h)
        return nn.LayerNorm(dtype=DT, name="norm3")(x + y)


body = Body()
bp = jax.jit(body.init)(jax.random.PRNGKey(7), tgt)


def body_stack(x):
    for _ in range(NL):
        x = body.apply(bp, x)
    return x


timeit(f"self-attn+FFN x{NL} (no MSDA)", body_stack, tgt)
