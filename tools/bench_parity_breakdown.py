"""Parity-mode latency breakdown at flagship scale (one TPU chip).

PLAN.md's component table accounts for ~174 ms of the measured ~264 ms
parity-mode frame (exact-MSDA encoder+decoder, B=1, 800x1344). This tool
times the exact-MSDA ENCODER stack and DECODER stack in isolation (chained
K passes, one small readback, tunnel-RTT subtracted — CLAUDE.md timing
rule) so the gap can be attributed: MSDA op vs the per-layer glue
(offset/weight projections, softmax over (S, M, L*P) weights, FFN, norms).

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
B, C, NH, NP, FF = 1, 288, 8, 4, 1024
# MOT17 800x1344 bucket backbone ladder (2-frame: x2 tokens via n_levels*2
# in multi-frame mode; encoder here is the ONE-frame pass, as in the
# cached-memory mode — matches PLAN.md's component table rows)
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
S = sum(h * w for h, w in SHAPES)
NQ = 640

cfg = load_config("train.yaml", ["deformable", "tracking", "multi_frame"], {})
args = nested_namespace(cfg)
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
print(f"rtt={RTT*1e3:.1f}ms  S={S}  shapes={SHAPES}")

src = jax.random.normal(rng, (B, S, C), dtype)
pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, C), dtype)
vr = jnp.ones((B, len(SHAPES), 2), jnp.float32)

enc = DeformableEncoder(C, len(SHAPES), num_layers=6, n_heads=NH,
                        n_points=NP, dim_feedforward=FF, dropout=0.0,
                        dtype=dtype, scan_layers=True)
ep = enc.init(rng, src, tuple(SHAPES), vr, pos, None)
t_enc = chain_time(
    lambda x: enc.apply(ep, x, tuple(SHAPES), vr, pos, None), src)
print(f"encoder 6L exact-MSDA: {t_enc*1e3:.2f} ms/pass")

tgt = jax.random.normal(rng, (B, NQ, C), dtype)
qpos = jax.random.normal(jax.random.PRNGKey(2), (B, NQ, C), dtype)
dref = jnp.tile(
    jax.random.uniform(jax.random.PRNGKey(3), (B, NQ, 1, 2),
                       minval=0.2, maxval=0.8), (1, 1, len(SHAPES), 1))
dl = DeformableDecoderLayer(C, len(SHAPES), NH, NP, FF, 0.0, dtype=dtype,
                            attention="msda")
dp = dl.init(rng, tgt, qpos, dref, src, tuple(SHAPES))


def dec6(x):
    for _ in range(6):
        x = dl.apply(dp, x, qpos, dref, src, tuple(SHAPES))
    return x


t_dec = chain_time(dec6, tgt)
print(f"decoder 6L exact-MSDA (shared-weight timing proxy): "
      f"{t_dec*1e3:.2f} ms/pass")
print(f"enc+dec = {(t_enc+t_dec)*1e3:.1f} ms; parity frame measured ~264 ms "
      f"(bench.py) — remainder is backbone+track logic+input proj+dispatch")
