"""Microbench: exact encoder-scale MSDA — gather-only vs Pallas dense
levels (ops/msda_dense.py) on the real chip.

Flagship encoder scale: 800x1344 input -> levels (100,168),(50,84),
(25,42),(13,21); Lq = S = 22323 tokens, M=8 heads, D=36, P=4 points.

Timing per CLAUDE.md: chain K iterations feeding outputs back into the
attention weights, one small readback at the end.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.ops.msda import ms_deform_attn

SHAPES = ((100, 168), (50, 84), (25, 42), (13, 21))
S = sum(h * w for h, w in SHAPES)
N, M, D, P = 1, 8, 36, 4
L = len(SHAPES)
K = 10


def make_inputs(seed=0, sigma=0.02):
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((N, S, M, D)), jnp.bfloat16)
    # encoder-like clustered sampling: per-query base position + small
    # offsets (raster order per level)
    base = []
    for h, w in SHAPES:
        ys, xs = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        base.append(np.stack([xs, ys], -1).reshape(-1, 2))
    base = np.concatenate(base, 0)  # (S, 2)
    off = rng.normal(0, sigma, (S, M, L, P, 2))
    loc = np.clip(base[:, None, None, None] + off, -0.1, 1.1)
    loc = jnp.asarray(loc[None], jnp.float32)
    attn = rng.uniform(0.1, 1.0, (N, S, M, L, P)).astype(np.float32)
    attn /= attn.sum((-2, -1), keepdims=True)
    return value, loc, jnp.asarray(attn)


def op_for_mode(mode):
    from trackformer_tpu.ops.msda_dense import dense_level_pallas_v2

    if mode in ("gather", "pallas_v1"):
        return lambda v, l, a: ms_deform_attn(
            v, SHAPES, l, a, pallas_dense=(mode == "pallas_v1"))

    if mode.startswith("v6"):
        # flat-walk row-strip kernel; "v6-256-16x64[-nslots|-debug]"
        from trackformer_tpu.ops.msda_patch import _msda_patch_v6_fwd
        parts = mode.split("-")
        tq = int(parts[1]) if len(parts) > 1 else None
        ph = pw = None
        if len(parts) > 2:
            ph, pw = (int(t) for t in parts[2].split("x"))
        nslots, debug = None, None
        for extra in parts[3:]:
            if extra.isdigit():
                nslots = int(extra)
            else:
                debug = extra
        return lambda v, l, a: _msda_patch_v6_fwd(
            v, SHAPES, l, a, tq=tq, ph=ph, pw=pw, nslots=nslots,
            debug=debug).reshape(N, S, M * D)

    if mode.startswith("v5"):
        # fused all-levels patch-walk kernel; "v5", "v5-512" (tq),
        # "v5-256-8x32" (tq + chunk geometry PHxPW)
        from trackformer_tpu.ops.msda_patch import _msda_patch_fwd
        parts = mode.split("-")
        tq = int(parts[1]) if len(parts) > 1 else None
        ph = pw = None
        if len(parts) > 2:
            ph, pw = (int(t) for t in parts[2].split("x"))
        debug = parts[3] if len(parts) > 3 else None  # bisection variants
        return lambda v, l, a: _msda_patch_fwd(
            v, SHAPES, l, a, tq=tq, ph=ph, pw=pw,
            debug=debug).reshape(N, S, M * D)

    def v2_all(value, loc, attn):
        acc = []
        off = 0
        for i, (h, w) in enumerate(SHAPES):
            acc.append(dense_level_pallas_v2(
                value[:, off:off + h * w], loc[:, :, :, i],
                attn[:, :, :, i], h, w, False))
            off += h * w
        return sum(acc).reshape(N, S, M * D)

    return v2_all


@functools.partial(jax.jit, static_argnames=("mode",))
def chain(value, loc, attn, mode):
    op = op_for_mode(mode)

    # feed attention back with a tiny perturbation so the scan is
    # serialized on-device
    def body2(carry, _):
        out = op(value, loc, carry)
        delta = jnp.tanh(out[..., :M]).reshape(N, S, M, 1, 1) * 1e-6
        return jax.nn.softmax(
            (carry + delta).reshape(N, S, M, L * P), -1
        ).reshape(N, S, M, L, P), out[0, 0, 0]

    final, outs = jax.lax.scan(body2, attn, None, length=K)
    return final[0, 0, 0, 0, 0], outs


def bench(mode, sigma):
    value, loc, attn = make_inputs(sigma=sigma)
    r = chain(value, loc, attn, mode)[0]
    float(r)  # compile + warm
    t0 = time.perf_counter()
    r = chain(value, loc, attn, mode)[0]
    float(r)
    dt = (time.perf_counter() - t0) / K
    return dt


@functools.partial(jax.jit, static_argnames=("lvl", "impl", "tq", "rows"))
def chain_level(value, loc, attn, lvl, impl, tq=None, rows=None):
    from trackformer_tpu.ops.msda_dense import (_dense_level_pallas_fwd,
                                                _dense_level_pallas_v2_fwd)
    h, w = SHAPES[lvl]
    off = sum(hh * ww for hh, ww in SHAPES[:lvl])
    v_l = value[:, off:off + h * w]

    def fn(v, l, a):
        if impl == "v1":
            return _dense_level_pallas_fwd(v, l, a, h, w)
        kw = {}
        if tq:
            kw["tq"] = tq
        if rows:
            kw["rows_per_tile"] = rows
        if impl.startswith("v4"):
            from trackformer_tpu.ops.msda_dense import (
                _dense_level_pallas_v4_fwd, spatial_sort_perm)
            if impl == "v4s":  # sorted + 64-wide x-chunks
                kw["cw"] = 64
                kw["perm"] = spatial_sort_perm(l, h, w)
            return _dense_level_pallas_v4_fwd(v, l, a, h, w, **kw)
        return _dense_level_pallas_v2_fwd(v, l, a, h, w, **kw)

    def body(carry, _):
        out = fn(v_l, loc[:, :, :, lvl], carry)
        delta = jnp.tanh(out[..., 0]).reshape(N, S, M, 1) * 1e-6
        return jax.nn.softmax(carry + delta, -1), out[0, 0, 0, 0]

    final, outs = jax.lax.scan(body, attn[:, :, :, 0], None, length=K)
    return final[0, 0, 0, 0], outs


def bench_level(lvl, impl, sigma, tq=None, rows=None):
    value, loc, attn = make_inputs(sigma=sigma)
    r = chain_level(value, loc, attn, lvl, impl, tq, rows)[0]
    float(r)
    t0 = time.perf_counter()
    r = chain_level(value, loc, attn, lvl, impl, tq, rows)[0]
    float(r)
    return (time.perf_counter() - t0) / K


if __name__ == "__main__":
    import sys
    args = sys.argv[1:]
    per_level = "--levels" in args
    tile_grid = "--tiles" in args
    sigmas = [float(s) for s in args
              if s not in ("--levels", "--tiles")] or [0.02]
    for sigma in sigmas:
        if tile_grid:
            # smaller q-tiles tighten each tile's y-extent (fewer active
            # pairs) and smaller row counts cut wasted hat rows (each query
            # has exactly 2 nonzero wy rows) — sweep below the defaults too.
            # Matrix env-overridable: TILES_LVLS/TILES_IMPLS/TILES_TQ/
            # TILES_ROWS as comma lists.
            import os as _os

            def _csv(name, default, cast):
                v = _os.environ.get(name)
                return default if not v else tuple(
                    cast(t) for t in v.split(","))

            for lvl in _csv("TILES_LVLS", (0, 1), int):
                for impl in _csv("TILES_IMPLS", ("v2", "v4"), str):
                    for tq in _csv("TILES_TQ", (128, 256, 512), int):
                        for rows in _csv("TILES_ROWS", (1, 2, 4, 8), int):
                            try:
                                dt = bench_level(lvl, impl, sigma, tq, rows)
                            except Exception as e:
                                print(f"sigma={sigma:5.3f} L{lvl} {impl} "
                                      f"tq={tq} rows={rows}: FAIL "
                                      f"{type(e).__name__}", flush=True)
                                continue
                            print(f"sigma={sigma:5.3f} L{lvl} {impl} "
                                  f"tq={tq} rows={rows}: {dt * 1e3:8.2f} ms",
                                  flush=True)
        elif per_level:
            for lvl in range(L):
                for impl in ("v1", "v2", "v4", "v4s"):
                    dt = bench_level(lvl, impl, sigma)
                    print(f"sigma={sigma:5.3f} L{lvl} {impl}: "
                          f"{dt * 1e3:8.2f} ms", flush=True)
        else:
            import os as _os
            modes = tuple((_os.environ.get(
                "BENCH_MODES", "gather,pallas_v1,v2_all,v5,v5-512")
            ).split(","))
            for mode in modes:
                try:
                    dt = bench(mode, sigma)
                except Exception as e:
                    print(f"sigma={sigma:5.3f} {mode:10s}: FAIL "
                          f"{type(e).__name__}: {e}", flush=True)
                    continue
                print(f"sigma={sigma:5.3f} {mode:10s}: {dt * 1e3:8.2f} ms "
                      f"/ layer-equivalent", flush=True)
