"""Microbench: MSDA gather strategies at encoder scale on the real chip.

Variants (all exact, same numerics contract):
  single: current production path — 4 single-row gathers per sample point
          (ops/msda.py), flat table over all levels.
  pair:   per-level table of (2D)-wide rows holding both x-corners
          (built by one shifted concat); 2 gathers per point.
  quad:   per-level table of (4D)-wide rows holding all 4 bilinear corners
          (padded 2x2 shift concat); 1 gather per point.

Timing per CLAUDE.md: chain K iterations inside jit-composed calls, one
small readback, subtract measured RTT.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M, D, P = 8, 36, 4
SHAPES = ((100, 168), (50, 84), (25, 42), (13, 21))  # 800x1344 /8../64
S = sum(h * w for h, w in SHAPES)
LQ = S  # encoder self-attention: every token is a query


def make_inputs(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    value = jax.random.normal(k1, (1, S, M, D), jnp.bfloat16)
    # clustered, realistic: each query's reference point is its own
    # normalized position; offsets within ~8 cells of the finest level
    ref = []
    for h, w in SHAPES:
        ys, xs = jnp.meshgrid(jnp.arange(h) + 0.5, jnp.arange(w) + 0.5,
                              indexing="ij")
        ref.append(jnp.stack([xs / w, ys / h], -1).reshape(-1, 2))
    ref = jnp.concatenate(ref)  # (S, 2)
    off = jax.random.normal(k2, (1, LQ, M, len(SHAPES), P, 2)) * 0.01
    loc = jnp.clip(ref[None, :, None, None, None] + off, 0.0, 1.0)
    attn = jax.nn.softmax(
        jax.random.normal(k3, (1, LQ, M, len(SHAPES), P)).reshape(
            1, LQ, M, -1)).reshape(1, LQ, M, len(SHAPES), P)
    return value, loc.astype(jnp.float32), attn.astype(jnp.float32)


def timeit(fn, value, loc, attn, iters=8):
    out = fn(value, loc, attn)
    np.asarray(out[0, 0, :1])

    @jax.jit
    def chain(v, l, a):
        def body(carry, _):
            o = fn(carry, l, a)
            # feed output back so iterations serialize
            return carry + 0.0 * o.reshape(v.shape[0], -1, M * D).reshape(
                v.shape).astype(v.dtype), ()
        c, _ = jax.lax.scan(body, v, None, length=iters)
        return c[0, 0, 0, :1]

    r = chain(value, loc, attn)
    np.asarray(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(value, loc, attn))
        best = min(best, time.perf_counter() - t0 - RTT)
    return best / iters


def run():
    from trackformer_tpu.ops.msda import ms_deform_attn
    from trackformer_tpu.ops import msda_table

    value, loc, attn = make_inputs(jax.random.PRNGKey(0))

    def f_single(v, l, a):
        return ms_deform_attn(v, SHAPES, l, a, dense_cell_budget=0)

    def f_quad(v, l, a):
        return msda_table.ms_deform_attn_quad(v, SHAPES, l, a)

    def f_pair(v, l, a):
        return msda_table.ms_deform_attn_pair(v, SHAPES, l, a)

    def f_perhead(v, l, a):
        return msda_table.ms_deform_attn_perhead(v, SHAPES, l, a)

    def f_cellmajor(v, l, a):
        return msda_table.ms_deform_attn_cellmajor(v, SHAPES, l, a)

    variants = [("single", f_single), ("perhead", f_perhead),
                ("cellmajor", f_cellmajor)]
    # correctness cross-check first (on-chip, loose bf16 tol)
    o1 = np.asarray(f_single(value, loc, attn), np.float32)
    for name, f in variants[1:]:
        o = np.asarray(f(value, loc, attn), np.float32)
        print(name, "maxdiff", np.abs(o1 - o).max())

    rows_per_pt = {"single": 4, "pair": 2, "quad": 1, "perhead": 4,
                   "cellmajor": 4}
    for name, f in variants:
        dt = timeit(f, value, loc, attn)
        rows = LQ * M * len(SHAPES) * P * rows_per_pt[name]
        print(f"{name:10s} {dt*1e3:8.2f} ms/layer-pass  "
              f"({rows/dt/1e6:.0f}M rows/s)")


if __name__ == "__main__":
    @jax.jit
    def _probe(x):
        return x + 1.0
    float(_probe(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(_probe(jnp.float32(0)))
    RTT = (time.perf_counter() - t0) / 10
    print(f"rtt {RTT*1e3:.1f} ms")
    run()
