"""Micro-bench: fused Pallas windowed-encoder layer vs the module path.

Times ONE WindowedEncoder pass (6 layers + cross-level fusion) at flagship
scale per impl, sweeping GW (windows per kernel tile) for the fused kernel.
Chained-K protocol with one small readback (CLAUDE.md timing rule).

Usage: python tools/bench_window_attn.py [K] [gw1,gw2,...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import trackformer_tpu.ops.window_attn as wa  # noqa: E402
from trackformer_tpu.models import windowed_encoder as we  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
GWS = ([int(g) for g in sys.argv[2].split(",")]
       if len(sys.argv) > 2 else [2, 4, 8])
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
B, C, NH, FF, WIN = 1, 288, 8, 1024, 8
dtype = jnp.bfloat16

rng = jax.random.PRNGKey(0)
srcs = [jax.random.normal(jax.random.fold_in(rng, i), (B, h, w, C), dtype)
        for i, (h, w) in enumerate(SHAPES)]
poses = [jax.random.normal(jax.random.fold_in(rng, 100 + i), (B, h, w, C),
                           dtype)
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
print(f"rtt={RTT*1e3:.1f}ms")

enc = we.WindowedEncoder(C, num_layers=6, nheads=NH, dim_feedforward=FF,
                         window=WIN, dtype=dtype)
we.ATTN_IMPL = "module"
params = enc.init(jax.random.PRNGKey(1), srcs, masks, poses)


def time_encoder(label):
    @jax.jit
    def step(ss):
        out = enc.apply(params, ss, masks, poses)
        off, res = 0, []
        for h, w in SHAPES:
            res.append(out[:, off:off + h * w].reshape(B, h, w, C))
            off += h * w
        return res

    ss = step(srcs)
    np.asarray(ss[0][0, 0, 0, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = srcs
        for _ in range(K):
            z = step(z)
        np.asarray(z[0][0, 0, 0, :1])
        best = min(best, time.perf_counter() - t0 - RTT)
    print(f"{label}: {best/K*1e3:.2f} ms / encoder pass (6 layers)")
    return best / K


time_encoder("module path")
we.ATTN_IMPL = "fused"
for gw in GWS:
    wa.GW = gw
    try:
        time_encoder(f"fused gw={gw}")
    except Exception as e:
        print(f"fused gw={gw} FAILED: {type(e).__name__}: {e}")
