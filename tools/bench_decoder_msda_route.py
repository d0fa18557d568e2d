"""A/B the decoder's per-level MSDA formulations: XLA dense vs Pallas v1.

tools/bench_decoder_pieces.py attributes most of the headline decoder cost
(97.75 ms/step at B=8) to the MSDA dense levels: `_dense_level_out`
materializes the (N, Lq, M, H*W) hat tensor in HBM (cost-analysis: 2.3 GB
for L1 alone at B=8), while `dense_level_pallas` (v1) generates the hat in
VMEM and feeds the MXU directly.  The routing budget in ops/msda.py
(`DENSE_CELL_BUDGET`, compared against lq*m*h*w) is batch-blind, so at
B=8 the XLA dense path is selected far past its economical range.

This tool times both paths per level at decoder shapes (NQ=640, 8-level
2-frame memory) for B in {1, 8} so the budget can be set from data.

Chained-K timing, ONE small readback, RTT subtracted (CLAUDE.md).

Usage: python tools/bench_decoder_msda_route.py [K]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.ops.msda import _dense_level_out
from trackformer_tpu.ops.msda_dense import dense_level_pallas

K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SMOKE = bool(int(os.environ.get("SMOKE", "0")))
NQ, M, NP, D = 640, 8, 4, 36
LEVELS = [(50, 84), (25, 42), (13, 21)]  # the decoder's dense-path levels
DT = jnp.bfloat16
if SMOKE:
    NQ, K = 64, 1
    LEVELS = [(13, 21)]


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
print(f"K={K} rtt={RTT*1e3:.1f}ms  NQ={NQ} M={M} P={NP} bf16", flush=True)


def timeit(label, fn, x0):
    # the remote-compile HTTP hop drops connections transiently; retry the
    # cold compile a few times before declaring the variant failed
    for attempt in range(4):
        try:
            jfn = jax.jit(fn)
            y = jfn(x0)
            np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:1])
            break
        except Exception as e:  # noqa: BLE001 - transient tunnel errors
            print(f"{label}: compile attempt {attempt} failed: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            if attempt == 3:
                print(f"{label:40s}    FAILED", flush=True)
                return float("inf")
            time.sleep(20.0 * (attempt + 1))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = x0
        for _ in range(K):
            z = jfn(z)
        np.asarray(jax.tree.leaves(z)[0].reshape(-1)[:1])
        best = min(best, time.perf_counter() - t0 - RTT)
    ms = best / K * 1e3
    print(f"{label:40s} {ms:8.3f} ms", flush=True)
    return ms


# ---- gather-level structure A/B --------------------------------------
# The decoder's two 16.8k-cell levels run the flat row-gather; at B=8 the
# bench_decoder_pieces.py row puts them at 14.32 ms/op-call (1.31M rows,
# ~92M rows/s — 4x below the small-table gather speed).  Candidates:
#   g1 current: per-item (M*S, D) head-major table, serial item loop
#   g2 s-major per-item table (S*M, D): a query's heads/points/corners
#      land in one spatial neighborhood -> HBM locality
#   g3 batched take_along_axis over (N, M) batch dims, (C, D) tables
#   g4 per-item table restricted to the gathered levels' rows only
#   g5 one (N*M*S, D) mega-table, single gather
GL = [(100, 168), (100, 168)]
SL = [(100, 168), (50, 84), (25, 42), (13, 21)] * 2  # full 8-level memory
S_ALL = sum(h * w for h, w in SL)
GIDX = [0, 4]  # positions of the gather levels in the 8-level list


def _gather_ab(B):
    rng = jax.random.PRNGKey(7)
    value = jax.random.normal(rng, (B, S_ALL, M, D), DT)
    loc = jax.random.uniform(jax.random.PRNGKey(8), (B, NQ, M, NP, 2),
                             minval=0.05, maxval=0.95)
    at = jax.nn.softmax(jax.random.normal(
        jax.random.PRNGKey(9), (B, NQ, M, NP * len(GL))).reshape(
        B, NQ, M, len(GL), NP)).astype(jnp.float32)

    # corner indices/weights within ONE level's cells (shared by variants)
    h, w = GL[0]
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    dx, dy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    idx_c, w_c = [], []
    for cx, cy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        ix, iy = x0i + cx, y0i + cy
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx_c.append(jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1))
        w_c.append((dx if cx else 1 - dx) * (dy if cy else 1 - dy) * ok)
    cidx = jnp.stack(idx_c, -1)                      # (B,NQ,M,P,4) in-level
    cw = jnp.stack(w_c, -1)[:, :, :, None] * at[..., None]  # (B,NQ,M,L,P,4)
    offs = []
    off = 0
    for i, (hh, ww) in enumerate(SL):
        if i in GIDX:
            offs.append(off)
        off += hh * ww
    # global cell index per gathered level: (B,NQ,M,L,P,4)
    gidx = jnp.stack([cidx + o for o in offs], axis=3)
    k = len(GL) * NP * 4
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def g1(x):
        v_nm = value.transpose(0, 2, 1, 3)  # (B, M, S, D)
        idx = gidx + (jnp.arange(M) * S_ALL)[None, None, :, None, None, None]
        idx = idx + x.astype(jnp.int32)
        outs = []
        for i in range(B):
            table = v_nm[i].reshape(M * S_ALL, D)
            g = jax.lax.gather(
                table, idx[i].reshape(-1, 1), dn, slice_sizes=(1, D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            g = g.reshape(NQ, M, k, D)
            outs.append(jnp.einsum(
                "qmk,qmkd->qmd", cw[i].reshape(NQ, M, k).astype(DT), g,
                preferred_element_type=jnp.float32))
        return x + jnp.stack(outs).mean().astype(x.dtype) * 1e-9

    def g2(x):
        # s-major: row = s * M + m
        idx = gidx * M + jnp.arange(M)[None, None, :, None, None, None]
        idx = idx + x.astype(jnp.int32)
        outs = []
        for i in range(B):
            table = value[i].reshape(S_ALL * M, D)
            g = jax.lax.gather(
                table, idx[i].reshape(-1, 1), dn, slice_sizes=(1, D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            g = g.reshape(NQ, M, k, D)
            outs.append(jnp.einsum(
                "qmk,qmkd->qmd", cw[i].reshape(NQ, M, k).astype(DT), g,
                preferred_element_type=jnp.float32))
        return x + jnp.stack(outs).mean().astype(x.dtype) * 1e-9

    def g3(x):
        v_nm = value.transpose(0, 2, 1, 3)  # (B, M, S, D)
        idx = gidx.transpose(0, 2, 1, 3, 4, 5).reshape(B, M, NQ * k)
        idx = idx + x.astype(jnp.int32)
        g = jnp.take_along_axis(v_nm, idx[..., None], axis=2)
        g = g.reshape(B, M, NQ, k, D)
        out = jnp.einsum(
            "nmqk,nmqkd->nmqd",
            cw.transpose(0, 2, 1, 3, 4, 5).reshape(B, M, NQ, k).astype(DT),
            g, preferred_element_type=jnp.float32)
        return x + out.mean().astype(x.dtype) * 1e-9

    def g4(x):
        # compact the table to the gathered levels only
        parts, boffs, off2 = [], {}, 0
        off = 0
        for i, (hh, ww) in enumerate(SL):
            if i in GIDX:
                parts.append(value[:, off:off + hh * ww])
                boffs[off] = off2
                off2 += hh * ww
            off += hh * ww
        vg = jnp.concatenate(parts, 1)  # (B, Sg, M, D)
        sg = vg.shape[1]
        v_nm = vg.transpose(0, 2, 1, 3)
        lidx = jnp.stack([cidx + boffs[o] for o in offs], axis=3)
        idx = lidx + (jnp.arange(M) * sg)[None, None, :, None, None, None]
        idx = idx + x.astype(jnp.int32)
        outs = []
        for i in range(B):
            table = v_nm[i].reshape(M * sg, D)
            g = jax.lax.gather(
                table, idx[i].reshape(-1, 1), dn, slice_sizes=(1, D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            g = g.reshape(NQ, M, k, D)
            outs.append(jnp.einsum(
                "qmk,qmkd->qmd", cw[i].reshape(NQ, M, k).astype(DT), g,
                preferred_element_type=jnp.float32))
        return x + jnp.stack(outs).mean().astype(x.dtype) * 1e-9

    def g5(x):
        v_nm = value.transpose(0, 2, 1, 3).reshape(B * M * S_ALL, D)
        nm_off = (jnp.arange(B)[:, None] * M + jnp.arange(M)[None]) * S_ALL
        idx = gidx + nm_off[:, None, :, None, None, None]
        idx = idx + x.astype(jnp.int32)
        g = jax.lax.gather(
            v_nm, idx.reshape(-1, 1), dn, slice_sizes=(1, D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = g.reshape(B, NQ, M, k, D)
        out = jnp.einsum("nqmk,nqmkd->nqmd",
                         cw.reshape(B, NQ, M, k).astype(DT), g,
                         preferred_element_type=jnp.float32)
        return x + out.mean().astype(x.dtype) * 1e-9

    def g6(x):
        # g1 + queries sorted by their mean sampling location (snake-bucket
        # over the gather level's raster) so neighbouring queries' corner
        # rows cluster in HBM; output unsorted afterwards.
        h0, w0 = GL[0]
        mean_loc = loc.mean(axis=(2, 3))  # (B, NQ, 2)
        bx = jnp.clip((mean_loc[..., 0] * (w0 // 8)).astype(jnp.int32),
                      0, w0 // 8 - 1)
        by = jnp.clip((mean_loc[..., 1] * (h0 // 8)).astype(jnp.int32),
                      0, h0 // 8 - 1)
        bx_snake = jnp.where(by % 2 == 0, bx, w0 // 8 - 1 - bx)
        perm = jnp.argsort(by * (w0 // 8) + bx_snake, axis=1)  # (B, NQ)
        inv = jnp.argsort(perm, axis=1)
        v_nm = value.transpose(0, 2, 1, 3)
        idx = gidx + (jnp.arange(M) * S_ALL)[None, None, :, None, None, None]
        idx = idx + x.astype(jnp.int32)
        outs = []
        for i in range(B):
            idx_s = jnp.take(idx[i], perm[i], axis=0)
            cw_s = jnp.take(cw[i].reshape(NQ, M, k), perm[i], axis=0)
            table = v_nm[i].reshape(M * S_ALL, D)
            g = jax.lax.gather(
                table, idx_s.reshape(-1, 1), dn, slice_sizes=(1, D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            g = g.reshape(NQ, M, k, D)
            o = jnp.einsum("qmk,qmkd->qmd", cw_s.astype(DT), g,
                           preferred_element_type=jnp.float32)
            outs.append(jnp.take(o, inv[i], axis=0))
        return x + jnp.stack(outs).mean().astype(x.dtype) * 1e-9

    def g7(x):
        # g5 mega-table + globally sorted gather rows (one argsort over ALL
        # B*NQ*M*k rows), inverse-permuted on the weights side so no unsort
        # gather of the big output is needed.
        v_nm = value.transpose(0, 2, 1, 3).reshape(B * M * S_ALL, D)
        nm_off = (jnp.arange(B)[:, None] * M + jnp.arange(M)[None]) * S_ALL
        idx = gidx + nm_off[:, None, :, None, None, None]
        idx = (idx + x.astype(jnp.int32)).reshape(-1)
        order = jnp.argsort(idx)
        g = jax.lax.gather(
            v_nm, jnp.take(idx, order)[:, None], dn, slice_sizes=(1, D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = jnp.take(g, jnp.argsort(order), axis=0)
        g = g.reshape(B, NQ, M, k, D)
        out = jnp.einsum("nqmk,nqmkd->nqmd",
                         cw.reshape(B, NQ, M, k).astype(DT), g,
                         preferred_element_type=jnp.float32)
        return x + out.mean().astype(x.dtype) * 1e-9

    def g8(x):
        # g4 compact table + g6 query sort combined
        h0, w0 = GL[0]
        mean_loc = loc.mean(axis=(2, 3))
        bx = jnp.clip((mean_loc[..., 0] * (w0 // 8)).astype(jnp.int32),
                      0, w0 // 8 - 1)
        by = jnp.clip((mean_loc[..., 1] * (h0 // 8)).astype(jnp.int32),
                      0, h0 // 8 - 1)
        bx_snake = jnp.where(by % 2 == 0, bx, w0 // 8 - 1 - bx)
        perm = jnp.argsort(by * (w0 // 8) + bx_snake, axis=1)
        inv = jnp.argsort(perm, axis=1)
        parts, boffs, off2, off = [], {}, 0, 0
        for i, (hh, ww) in enumerate(SL):
            if i in GIDX:
                parts.append(value[:, off:off + hh * ww])
                boffs[off] = off2
                off2 += hh * ww
            off += hh * ww
        vg = jnp.concatenate(parts, 1)
        sg = vg.shape[1]
        v_nm = vg.transpose(0, 2, 1, 3)
        lidx = jnp.stack([cidx + boffs[o] for o in offs], axis=3)
        idx = lidx + (jnp.arange(M) * sg)[None, None, :, None, None, None]
        idx = idx + x.astype(jnp.int32)
        outs = []
        for i in range(B):
            idx_s = jnp.take(idx[i], perm[i], axis=0)
            cw_s = jnp.take(cw[i].reshape(NQ, M, k), perm[i], axis=0)
            table = v_nm[i].reshape(M * sg, D)
            g = jax.lax.gather(
                table, idx_s.reshape(-1, 1), dn, slice_sizes=(1, D),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            g = g.reshape(NQ, M, k, D)
            o = jnp.einsum("qmk,qmkd->qmd", cw_s.astype(DT), g,
                           preferred_element_type=jnp.float32)
            outs.append(jnp.take(o, inv[i], axis=0))
        return x + jnp.stack(outs).mean().astype(x.dtype) * 1e-9

    def _per_level(x, sort):
        # one gather per (item, level): table = that level's rows only
        h0, w0 = GL[0]
        if sort:
            mean_loc = loc.mean(axis=(2, 3))
            bx = jnp.clip((mean_loc[..., 0] * (w0 // 8)).astype(jnp.int32),
                          0, w0 // 8 - 1)
            by = jnp.clip((mean_loc[..., 1] * (h0 // 8)).astype(jnp.int32),
                          0, h0 // 8 - 1)
            bx_snake = jnp.where(by % 2 == 0, bx, w0 // 8 - 1 - bx)
            perm = jnp.argsort(by * (w0 // 8) + bx_snake, axis=1)
            inv = jnp.argsort(perm, axis=1)
        cells = h0 * w0
        kl = NP * 4
        outs = []
        for i in range(B):
            acc = 0.0
            for li, o_lvl in enumerate(offs):
                vl = value[i, o_lvl:o_lvl + cells]      # (cells, M, D)
                tab = vl.transpose(1, 0, 2).reshape(M * cells, D)
                # cidx[i]: (NQ, M, P, 4); add head offsets
                idx_l = cidx[i] + (jnp.arange(M) * cells)[None, :, None,
                                                          None]
                w_l = cw[i][:, :, li]                    # (NQ, M, P, 4)
                if sort:
                    idx_l = jnp.take(idx_l, perm[i], axis=0)
                    w_l = jnp.take(w_l, perm[i], axis=0)
                idx_l = idx_l + (x * 1e-12).astype(jnp.int32)
                g = jax.lax.gather(
                    tab, idx_l.reshape(-1, 1), dn, slice_sizes=(1, D),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                g = g.reshape(NQ, M, kl, D)
                o = jnp.einsum("qmk,qmkd->qmd",
                               w_l.reshape(NQ, M, kl).astype(DT), g,
                               preferred_element_type=jnp.float32)
                if sort:
                    o = jnp.take(o, inv[i], axis=0)
                acc = acc + o
            outs.append(acc)
        return x + jnp.stack(outs).mean().astype(x.dtype) * 1e-9

    def g9(x):
        return _per_level(x, False)

    def g10(x):
        return _per_level(x, True)

    only = os.environ.get("BENCH_ONLY", "")
    for name, fn in [("g1 per-item head-major (current)", g1),
                     ("g2 per-item s-major", g2),
                     ("g3 batched take_along_axis", g3),
                     ("g4 per-item compact table", g4),
                     ("g5 mega-table single gather", g5),
                     ("g6 per-item query-sorted", g6),
                     ("g7 mega-table row-sorted", g7),
                     ("g8 compact + sorted", g8),
                     ("g9 per-(item,level) tables", g9),
                     ("g10 per-(item,level) + sorted", g10)]:
        tag = name.split()[0]
        if only and tag not in only.split(","):
            continue
        timeit(f"B={B} {name}", fn, jnp.zeros((), jnp.float32))


for B in (8, 1):
    _gather_ab(B)

for B in (() if os.environ.get("BENCH_ONLY") else (8, 1)):
    for (h, w) in LEVELS:
        cells = h * w
        rng = jax.random.PRNGKey(cells)
        v = jax.random.normal(rng, (B, cells, M, D), DT)
        loc = jax.random.uniform(jax.random.PRNGKey(1), (B, NQ, M, NP, 2),
                                 minval=0.05, maxval=0.95)
        at = jax.nn.softmax(jax.random.normal(
            jax.random.PRNGKey(2), (B, NQ, M, NP))).astype(jnp.float32)

        def xla_dense(x, v=v, loc=loc, at=at, h=h, w=w):
            out = _dense_level_out(v, loc + x * 1e-12, at, h, w)
            return x + jnp.mean(out).astype(x.dtype) * 1e-9

        interp = jax.devices()[0].platform != "tpu"

        def pallas_v1(x, v=v, loc=loc, at=at, h=h, w=w, interp=interp):
            out = dense_level_pallas(v, loc + x * 1e-12, at, h, w, interp)
            return x + jnp.mean(out).astype(x.dtype) * 1e-9

        a = timeit(f"B={B} L({h}x{w}) xla dense", xla_dense,
                   jnp.zeros((), jnp.float32))
        b = timeit(f"B={B} L({h}x{w}) pallas v1", pallas_v1,
                   jnp.zeros((), jnp.float32))
        print(f"  -> {'v1' if b < a else 'dense'} wins "
              f"{min(a, b)/max(a, b)*100:.0f}% of loser", flush=True)
