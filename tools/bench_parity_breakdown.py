"""Parity-mode latency breakdown at flagship scale (one TPU chip).

Times the exact-MSDA ENCODER stack (one-frame pass; the parity 2-frame
mode runs it twice) and the DECODER stack under BOTH conditions — the
one-frame 4-level memory (cached mode) and the parity-mode 8-level 2-frame
memory (num_feature_levels*2 levels over ~2S tokens, deformable_detr.py
multi-frame path) — so the parity frame budget can be attributed
component by component (PLAN.md "Parity-mode budget closed" table).
Chained K passes, one small readback, tunnel-RTT subtracted (CLAUDE.md
timing rule).

Usage: python tools/bench_parity_breakdown.py [K]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from trackformer_tpu.models.deformable_transformer import (
    DeformableDecoderLayer, DeformableEncoder)
from trackformer_tpu.utils.config import load_config, nested_namespace

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
# MOT17 800x1344 bucket backbone ladder; the 2-frame decoder condition
# doubles the levels/tokens below
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
S = sum(h * w for h, w in SHAPES)

cfg = load_config("train.yaml", ["deformable", "tracking", "multi_frame"], {})
args = nested_namespace(cfg)
# model dims from the flagship config so this bench cannot silently
# diverge from it (ADVICE r3)
B = 1
C, NH, FF = args.hidden_dim, args.nheads, args.dim_feedforward
NP = args.dec_n_points
NQ = args.num_queries + 150  # + default tracker max_tracks slots
rng = jax.random.PRNGKey(0)
dtype = jnp.bfloat16


def rtt_probe():
    @jax.jit
    def p(x):
        return x + 1.0
    float(p(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(p(jnp.float32(0)))
    return (time.perf_counter() - t0) / 10


def chain_time(fn, x, iters=K):
    """fn: x -> x (same pytree); chained, one readback."""
    jfn = jax.jit(fn)
    y = jfn(x)
    np.asarray(jax.tree.leaves(y)[0][..., :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = x
        for _ in range(iters):
            z = jfn(z)
        np.asarray(jax.tree.leaves(z)[0][..., :1])
        best = min(best, time.perf_counter() - t0 - RTT)
    return best / iters


RTT = rtt_probe()
print(f"rtt={RTT*1e3:.1f}ms  S={S}  shapes={SHAPES}  "
      f"C={C} NH={NH} NP={NP} FF={FF} NQ={NQ}")

src = jax.random.normal(rng, (B, S, C), dtype)
pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, C), dtype)
vr = jnp.ones((B, len(SHAPES), 2), jnp.float32)

enc = DeformableEncoder(C, len(SHAPES), num_layers=args.enc_layers,
                        n_heads=NH, n_points=args.enc_n_points,
                        dim_feedforward=FF, dropout=0.0,
                        dtype=dtype, scan_layers=True)
ep = enc.init(rng, src, tuple(SHAPES), vr, pos, None)
t_enc = chain_time(
    lambda x: enc.apply(ep, x, tuple(SHAPES), vr, pos, None), src)
print(f"encoder {args.enc_layers}L exact-MSDA (ONE frame; parity runs 2): "
      f"{t_enc*1e3:.2f} ms/pass")


def bench_decoder(shapes, label):
    s_tot = sum(h * w for h, w in shapes)
    mem = jax.random.normal(rng, (B, s_tot, C), dtype)
    tgt = jax.random.normal(rng, (B, NQ, C), dtype)
    qpos = jax.random.normal(jax.random.PRNGKey(2), (B, NQ, C), dtype)
    dref = jnp.tile(
        jax.random.uniform(jax.random.PRNGKey(3), (B, NQ, 1, 2),
                           minval=0.2, maxval=0.8), (1, 1, len(shapes), 1))
    dl = DeformableDecoderLayer(C, len(shapes), NH, NP, FF, 0.0,
                                dtype=dtype, attention="msda")
    dp = dl.init(rng, tgt, qpos, dref, mem, tuple(shapes))

    def dec(x):
        for _ in range(args.dec_layers):
            x = dl.apply(dp, x, qpos, dref, mem, tuple(shapes))
        return x

    t = chain_time(dec, tgt)
    print(f"decoder {args.dec_layers}L exact-MSDA, {label} "
          f"(shared-weight timing proxy): {t*1e3:.2f} ms/pass")
    return t


# cached-memory condition: 4 levels, one frame's tokens
t_dec1 = bench_decoder(SHAPES, f"{len(SHAPES)} levels, S={S} (cached mode)")
# parity-mode condition: num_feature_levels*2 levels over both frames'
# tokens (deformable_detr.py multi-frame concat) — larger gather tables
SHAPES2 = SHAPES + SHAPES
t_dec2 = bench_decoder(
    SHAPES2, f"{len(SHAPES2)} levels, S={2*S} (parity 2-frame mode)")

print(f"parity-frame attribution: 2 x {t_enc*1e3:.1f} (enc) "
      f"+ {t_dec2*1e3:.1f} (dec, 2-frame) = "
      f"{(2*t_enc+t_dec2)*1e3:.1f} ms; remainder vs the measured bench.py "
      f"parity frame is backbone + track logic + input proj + dispatch")
