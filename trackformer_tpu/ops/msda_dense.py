"""Pallas dense separable-bilinear MSDA — generated-LHS matmul kernel.

Exact-MSDA encoder levels are gather-bound on TPU: the XLA row-gather path
(ops/msda.py) moves ~360M rows/s and each encoder layer needs
Lq*M*P*4 ~ 2.9M rows PER LEVEL, ~32 ms/layer at flagship scale.  For a
level with C = H*W cells the same contribution is a dense matmul

    out[q, d] = sum_s w_full[q, s] * V[s, d],
    w_full[q, s] = sum_p attn[q,p] * max(0, 1-|y_qp - h_s|)
                                   * max(0, 1-|x_qp - w_s|)

(the bilinear corner weights written as a hat function over ALL integer
cells — identical numerics to 4-corner gathering incl. grid_sample's
zero padding, because out-of-range cells simply do not appear in the sum).
XLA cannot fuse the w_full producer into a dot operand, and materializing
w_full (Lq x C) in HBM is bandwidth-bound, so this kernel generates each
w_full tile on the VPU *inside VMEM* and feeds the MXU directly — no
gather, no HBM round-trip for the weights.  Semantics match the reference
CUDA kernel
(/root/reference/src/trackformer/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:166-237).

Worth it when C is small-to-mid (coarse levels; cost scales with Lq*C)
while the gather cost is level-independent (Lq*P*4 rows each): at flagship
encoder scale levels 1-3 (4200/1050/273 cells) run ~6x faster dense.

Backward: the forward is wrapped in jax.custom_vjp whose backward
re-derives gradients through the (numerically identical) XLA gather
formulation — scatter-adds are what the reference col2im kernels do too.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_UNROLL_MAX = 8  # static unroll bound for the points loop

# Tile knobs for the block-skipping kernels (v2/v4), read at trace time
# when the caller leaves tq/rows_per_tile unset (flipping after a
# same-shape call requires ms_deform_attn.clear_cache()).  Smaller q-tiles
# tighten each tile's y-extent (fewer active (q, s) pairs — raster-order
# extent scales with TQ) and smaller row counts cut wasted hat rows (each
# sample has exactly 2 nonzero wy rows); both raise per-step grid/DMA
# overhead, so the sweet spot is measured (tools/bench_msda_dense.py
# --tiles) and routed here.
V2_TQ = 256
V2_ROWS = None  # None = max(1, 1024 // wp)


# ---------------------------------------------------------------------------
# v2: block-skipping kernel (encoder scale, level 0 included)
#
# Encoder queries are the level tokens themselves in raster order, and their
# sampling points cluster around their own positions, so a tile of TQ
# consecutive queries touches only a narrow band of value ROWS.  Because an
# s-tile spans WHOLE (padded) rows, a (q-tile, s-tile) pair can be skipped
# exactly when the q-tile's y-range (over all heads/points, +-1 hat
# support) misses the s-tile's row range — a bound computed OUTSIDE the
# kernel on the VPU and prefetched as scalars.  Compute cost then scales
# with the TRUE offset locality and degrades gracefully to full dense.
# Heads run in an inner loop so per-grid-step overhead is amortized 8x.
# ---------------------------------------------------------------------------


def _kernel_v2(flags_ref, qinfo_ref, v_ref, o_ref, *, ts, wp, n_points,
               n_heads, d_head):
    """Grid (N, nQ, nS).  qinfo (1, TQ, M*3P); v (1, TS, M*D) whole padded
    rows; flags (N*nQ*nS,) int32 in SMEM; out (1, TQ, M*D) f32 revisited
    over s."""
    n_i = pl.program_id(0)
    q_i = pl.program_id(1)
    s_i = pl.program_id(2)
    n_s = pl.num_programs(2)
    n_q = pl.num_programs(1)

    @pl.when(s_i == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    flag = flags_ref[(n_i * n_q + q_i) * n_s + s_i]
    n_rows = ts // wp

    @pl.when(flag != 0)
    def _compute():
        # s tile = `n_rows` whole padded rows starting at row0 (cells with
        # w >= W carry zero value rows so spurious weight is harmless).
        # Row structure cuts the weight generation to 2 VPU ops per
        # (q, cell, point): hat_x factors are shared by every row of the
        # tile and the hat_y factor collapses to a per-row scalar column.
        row0 = (s_i * n_rows).astype(jnp.float32)
        wcoord = jax.lax.broadcasted_iota(
            jnp.int32, (1, wp), 1).astype(jnp.float32)             # (1, Wp)
        q = qinfo_ref[0]  # (TQ, M*3P)
        tiles = []
        for m in range(n_heads):
            base = m * 3 * n_points
            wx_p, y_p = [], []
            for p in range(n_points):
                x = q[:, base + p:base + p + 1]                    # (TQ, 1)
                a = q[:, base + 2 * n_points + p:base + 2 * n_points + p + 1]
                wx_p.append(
                    a * jnp.maximum(0.0, 1.0 - jnp.abs(x - wcoord)))
                y_p.append(q[:, base + n_points + p:base + n_points + p + 1])
            acc = None
            for r in range(n_rows):
                # per-row weight segment, immediately contracted against
                # that row's value slab (concatenating segments into a
                # (TQ, TS) operand costs more VMEM copies than the whole
                # weight build)
                hrow = row0 + r
                seg = None
                for p in range(n_points):
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_p[p] - hrow))
                    term = wy * wx_p[p]                           # (TQ, Wp)
                    seg = term if seg is None else seg + term
                v = v_ref[0, r * wp:(r + 1) * wp,
                          m * d_head:(m + 1) * d_head]            # (Wp, D)
                dot = jnp.dot(seg.astype(v.dtype), v,
                              preferred_element_type=jnp.float32)
                acc = dot if acc is None else acc + dot
            tiles.append(acc)
        o_ref[0] = o_ref[0] + jnp.concatenate(tiles, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "tq", "rows_per_tile",
                                    "interpret", "_force_flags"))
def _dense_level_pallas_v2_fwd(value_l, loc_l, attn_l, h, w,
                               tq=None, rows_per_tile=None, interpret=False,
                               _force_flags=None):
    """Block-skipping variant.  Same contract as `_dense_level_pallas_fwd`.

    value_l (N, H*W, M, D); loc_l (N, Lq, M, P, 2) in [0,1];
    attn_l (N, Lq, M, P) -> (N, Lq, M, D) f32.
    """
    if tq is None:
        tq = V2_TQ
    if rows_per_tile is None:
        rows_per_tile = V2_ROWS
    n, c, m, d = value_l.shape
    _, lq, _, p, _ = loc_l.shape
    assert c == h * w, (c, h, w)
    assert p <= P_UNROLL_MAX, p

    wp = max(128, -(-w // 128) * 128)
    if rows_per_tile is None:
        rows_per_tile = max(1, 1024 // wp)
    rows_per_tile = min(rows_per_tile, h)
    ts = rows_per_tile * wp

    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5
    qinfo = jnp.concatenate(
        [x, y, attn_l.astype(jnp.float32)], axis=-1)  # (N, Lq, M, 3P)
    qinfo = qinfo.reshape(n, lq, m * 3 * p)
    qinfo = _pad_to(qinfo, 1, tq)
    lqp = qinfo.shape[1]
    n_q = lqp // tq

    # value rows padded W -> Wp with zeros, then rows padded to tile mult
    v = value_l.reshape(n, h, w, m * d)
    v = _pad_to(v, 2, wp) if wp != w else v
    v = v.reshape(n, h * wp, m * d)
    v = _pad_to(v, 1, ts)
    cp = v.shape[1]
    n_s = cp // ts

    # exact skip bounds: per q-tile the y-range over heads/points, +-1 for
    # the hat support; an s-tile of rows [r0, r0+TH) can contribute iff the
    # ranges intersect.  (x never matters: s-tiles span whole rows.)
    y_t = y.reshape(n, lq, m * p)
    y_t = _pad_to(y_t, 1, tq).reshape(n, n_q, tq * m * p)
    ymin = jnp.floor(jnp.min(y_t, axis=2)) - 1.0   # corner y0 may be -1 low
    ymax = jnp.floor(jnp.max(y_t, axis=2)) + 1.0
    r0 = jnp.arange(n_s, dtype=jnp.float32) * rows_per_tile
    overlap = ((ymax[:, :, None] >= r0[None, None, :])
               & (ymin[:, :, None] <= r0[None, None, :] + rows_per_tile - 1))
    # padded queries (all-zero qinfo) decode to y = -0.5 -> rows {-1, 0};
    # harmless: attn is zero there
    flags = overlap.astype(jnp.int32).reshape(-1)
    if _force_flags is not None:  # benchmarking only: 0 = pure overhead
        flags = jnp.full_like(flags, _force_flags)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_q, n_s),
        in_specs=[
            pl.BlockSpec((1, tq, m * 3 * p), lambda i, j, k, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, m * d), lambda i, j, k, *_: (i, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, m * d), lambda i, j, k, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v2, ts=ts, wp=wp, n_points=p,
                          n_heads=m, d_head=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, lqp, m * d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * lqp * cp * m * (d + p),
            bytes_accessed=(qinfo.size * 4 + v.size * v.dtype.itemsize
                            + n * lqp * m * d * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(flags, qinfo, v)
    return out[:, :lq].reshape(n, lq, m, d)


def _kernel(qinfo_ref, v_ref, o_ref, *, ts, w_level, n_points):
    """One (nm, q-tile, s-tile) step: generate the (TQ, TS) weight tile,
    matmul with the (TS, D) value tile, accumulate into the (TQ, D) out.

    qinfo_ref: (1, TQ, 3P) packed [x, y, attn] per point, f32.
    v_ref:     (1, TS, D) value tile (level rows, zero-padded past H*W).
    o_ref:     (1, TQ, D) f32, revisited across the s grid dimension.
    """
    s_idx = pl.program_id(2)
    # cell coordinates of this s tile, from the flat row index (s = h*W + w;
    # rows past H*W decode to h >= H whose value rows are zero-padded, so
    # any weight they pick up contributes nothing)
    sg = s_idx * ts + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
    hcoord = (sg // w_level).astype(jnp.float32)  # (1, TS)
    wcoord = (sg % w_level).astype(jnp.float32)

    q = qinfo_ref[0]  # (TQ, 3P)
    acc = None
    for p in range(n_points):
        x = q[:, p:p + 1]                     # (TQ, 1)
        y = q[:, n_points + p:n_points + p + 1]
        a = q[:, 2 * n_points + p:2 * n_points + p + 1]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - wcoord))   # (TQ, TS)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - hcoord))
        term = (a * wy) * wx
        acc = term if acc is None else acc + term
    v = v_ref[0]
    tile = jnp.dot(acc.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)  # (TQ, D)

    @pl.when(s_idx == 0)
    def _init():
        o_ref[0] = tile

    @pl.when(s_idx != 0)
    def _acc():
        o_ref[0] = o_ref[0] + tile


# ---------------------------------------------------------------------------
# v3: v2 + spatially sorted queries + x-windowed compute
#
# Raster-consecutive query tiles have perfect ROW locality but span every
# COLUMN, so v2 can only skip in y.  v3 first sorts queries by their mean
# sample position on an 8x8-bucket tile-raster (image-space locality is
# level-independent, so one permutation serves all levels), making each
# query tile compact in BOTH axes.  Each (q-tile) then gets a CW-column
# window [xstart, xstart+CW): when every nonzero hat column fits (the
# common case; checked exactly outside the kernel), the weight build and
# the dot run on (TQ, CW) instead of (TQ, Wp); otherwise that q-tile
# falls back to the full-width v2 body — numerics identical either way.
# ---------------------------------------------------------------------------


def _kernel_v3(scal_ref, qinfo_ref, v_ref, o_ref, *, ts, wp, cw, n_points,
               n_heads, d_head):
    """Grid (N, nQ, nS).  scal_ref int32 layout:
    [flags (N*nQ*nS) | fits (N*nQ) | xstart (N*nQ)]."""
    n_i = pl.program_id(0)
    q_i = pl.program_id(1)
    s_i = pl.program_id(2)
    n_n = pl.num_programs(0)
    n_q = pl.num_programs(1)
    n_s = pl.num_programs(2)

    @pl.when(s_i == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    flag = scal_ref[(n_i * n_q + q_i) * n_s + s_i]
    nq_i = n_i * n_q + q_i
    n_rows = ts // wp

    def body(width, x0):
        """One full compute body over columns [x0, x0+width)."""
        row0 = (s_i * n_rows).astype(jnp.float32)
        wcoord = (x0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, width), 1)).astype(jnp.float32)
        q = qinfo_ref[0]  # (TQ, M*3P)
        tiles = []
        for m in range(n_heads):
            base = m * 3 * n_points
            wx_p, y_p = [], []
            for p in range(n_points):
                x = q[:, base + p:base + p + 1]                    # (TQ, 1)
                a = q[:, base + 2 * n_points + p:base + 2 * n_points + p + 1]
                wx_p.append(
                    a * jnp.maximum(0.0, 1.0 - jnp.abs(x - wcoord)))
                y_p.append(q[:, base + n_points + p:base + n_points + p + 1])
            acc = None
            for r in range(n_rows):
                hrow = row0 + r
                seg = None
                for p in range(n_points):
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_p[p] - hrow))
                    term = wy * wx_p[p]                        # (TQ, width)
                    seg = term if seg is None else seg + term
                v = v_ref[0, pl.ds(r * wp + x0, width),
                          m * d_head:(m + 1) * d_head]         # (width, D)
                dot = jnp.dot(seg.astype(v.dtype), v,
                              preferred_element_type=jnp.float32)
                acc = dot if acc is None else acc + dot
            tiles.append(acc)
        o_ref[0] = o_ref[0] + jnp.concatenate(tiles, axis=1)

    if cw < wp:
        fits = scal_ref[n_n * n_q * n_s + nq_i]
        # host code aligns xstart down to a multiple of 8; Mosaic needs the
        # static proof to vector.load a dynamic sublane offset
        xstart = pl.multiple_of(
            scal_ref[n_n * n_q * (n_s + 1) + nq_i], 8)

        @pl.when((flag != 0) & (fits != 0))
        def _windowed():
            body(cw, xstart)

        @pl.when((flag != 0) & (fits == 0))
        def _full():
            body(wp, 0)
    else:
        @pl.when(flag != 0)
        def _full():
            body(wp, 0)


# ---------------------------------------------------------------------------
# v4: compacted grid + manual double-buffered DMA (encoder scale)
#
# v2's cost floor is its grid: (nQ, nS) steps each pay ~2-4 us of Mosaic
# grid/pipelining overhead and DMA the s-tile whether or not the pair is
# skipped — at flagship L0 that is 2200 steps for ~660 active pairs.  The
# active s-tiles of a q-tile are a CONTIGUOUS range (the skip predicate is
# an interval overlap in y), so v4 grids over q-tiles ONLY and walks
# [lo_j, hi_j] with an in-kernel dynamic fori_loop, double-buffering the
# value-tile DMAs from HBM by hand (pallas guide "Patterns: Double
# Buffering").  Work and bytes moved both scale with the TRUE number of
# active pairs; there is no per-skipped-pair cost at all.
# ---------------------------------------------------------------------------


def _kernel_v4(ranges_ref, qinfo_ref, v_hbm, o_ref, *, ts, wp, cw, n_points,
               n_heads, d_head, md_pad, v_dtype):
    """Grid (N, nQ).  ranges int32 layout [lo | hi | xlo | xhi] (each
    N*nQ), hi/xhi inclusive; empty range encoded as lo > hi.  qinfo
    (1, TQ, M*3P) VMEM; v_hbm (N, CP, M*D) unblocked (ANY/HBM); out
    (1, TQ, M*D) f32.  The y-walk [lo, hi] double-buffers value-tile
    DMAs; each y-tile runs an x-chunk walk [xlo, xhi] over CW-column
    windows (one shared compute body — every cell column is owned by
    exactly one chunk, so chunk-straddling hat supports never double
    count)."""
    n_i = pl.program_id(0)
    q_i = pl.program_id(1)
    n_q = pl.num_programs(1)
    n_n = pl.num_programs(0)
    nq_i = n_i * n_q + q_i
    lo = ranges_ref[nq_i]
    hi = ranges_ref[n_n * n_q + nq_i]
    xlo = ranges_ref[2 * n_n * n_q + nq_i]
    xhi = ranges_ref[3 * n_n * n_q + nq_i]
    n_rows = ts // wp

    o_ref[0] = jnp.zeros_like(o_ref[0])

    def scoped(scratch, sems):
        def tile_dma(slot, k):
            return pltpu.make_async_copy(
                v_hbm.at[n_i, pl.ds(k * ts, ts), :],
                scratch.at[slot], sems.at[slot])

        @pl.when(lo <= hi)
        def _warmup():
            tile_dma(lo % 2, lo).start()

        q = qinfo_ref[0]  # (TQ, M*3P)
        chunk_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, cw), 1).astype(jnp.float32)              # (1, CW)

        def loop(k, _):
            slot = k % 2

            @pl.when(k < hi)
            def _prefetch():
                tile_dma((k + 1) % 2, k + 1).start()

            tile_dma(slot, k).wait()
            row0 = (k * n_rows).astype(jnp.float32)

            def xloop(c, _c):
                x0 = pl.multiple_of(c * cw, 8)
                wcoord = x0.astype(jnp.float32) + chunk_iota        # (1, CW)
                tiles = []
                for m in range(n_heads):
                    base = m * 3 * n_points
                    wx_p, y_p = [], []
                    for p in range(n_points):
                        x = q[:, base + p:base + p + 1]             # (TQ, 1)
                        a = q[:, base + 2 * n_points + p:
                              base + 2 * n_points + p + 1]
                        wx_p.append(
                            a * jnp.maximum(0.0, 1.0 - jnp.abs(x - wcoord)))
                        y_p.append(q[:, base + n_points + p:
                                     base + n_points + p + 1])
                    acc = None
                    for r in range(n_rows):
                        hrow = row0 + r
                        seg = None
                        for p in range(n_points):
                            wy = jnp.maximum(
                                0.0, 1.0 - jnp.abs(y_p[p] - hrow))
                            term = wy * wx_p[p]                     # (TQ, CW)
                            seg = term if seg is None else seg + term
                        v = scratch[slot, pl.ds(r * wp + x0, cw),
                                    m * d_head:(m + 1) * d_head]    # (CW, D)
                        dot = jnp.dot(seg.astype(v_dtype), v,
                                      preferred_element_type=jnp.float32)
                        acc = dot if acc is None else acc + dot
                    tiles.append(acc)
                o_ref[0] = o_ref[0] + jnp.concatenate(tiles, axis=1)
                return 0

            jax.lax.fori_loop(xlo, xhi + 1, xloop, 0)
            return 0

        jax.lax.fori_loop(lo, hi + 1, loop, 0)

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((2, ts, md_pad), v_dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "tq", "rows_per_tile", "cw",
                                    "interpret"))
def _dense_level_pallas_v4_fwd(value_l, loc_l, attn_l, h, w,
                               tq=None, rows_per_tile=None, cw=None,
                               perm=None, interpret=False):
    """Compacted-grid variant.  Same contract/numerics as v2.  `cw`
    (static, multiple of 8) sets the x-chunk width of the in-kernel
    column walk; None = full padded width (pure y-walk).  `perm`
    (N, Lq) sorts queries before tiling (raster-ordered encoder tiles
    span full rows, so x-chunking only pays with a 2-D-local order —
    pass spatial_sort_perm's output); outputs are unsorted back."""
    if tq is None:
        tq = V2_TQ
    if rows_per_tile is None:
        rows_per_tile = V2_ROWS
    n, c, m, d = value_l.shape
    _, lq, _, p, _ = loc_l.shape
    assert c == h * w, (c, h, w)
    assert p <= P_UNROLL_MAX, p

    wp = max(128, -(-w // 128) * 128)
    if rows_per_tile is None:
        rows_per_tile = max(1, 1024 // wp)
    rows_per_tile = min(rows_per_tile, h)
    ts = rows_per_tile * wp
    if cw is None:
        cw = wp
    assert cw % 8 == 0 and wp % cw == 0, (cw, wp)

    if perm is not None:
        loc_l = jnp.take_along_axis(
            loc_l, perm[:, :, None, None, None], axis=1)
        attn_l = jnp.take_along_axis(attn_l, perm[:, :, None, None], axis=1)

    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5
    qinfo = jnp.concatenate(
        [x, y, attn_l.astype(jnp.float32)], axis=-1)  # (N, Lq, M, 3P)
    qinfo = qinfo.reshape(n, lq, m * 3 * p)
    qinfo = _pad_to(qinfo, 1, tq)
    lqp = qinfo.shape[1]
    n_q = lqp // tq

    v = value_l.reshape(n, h, w, m * d)
    v = _pad_to(v, 2, wp) if wp != w else v
    v = v.reshape(n, h * wp, m * d)
    v = _pad_to(v, 1, ts)
    # Mosaic requires manual-DMA slice shapes 128-aligned in the minor
    # dim; pad the feature dim so the y-tile DMA copies whole lanes (head
    # column offsets are unchanged — padding is appended after head m-1).
    v = _pad_to(v, 2, 128)
    md_pad = v.shape[2]
    cp = v.shape[1]
    n_s = cp // ts

    # contiguous active range per q-tile (same interval predicate as v2's
    # flags): s-tile k rows [k*R, k*R+R-1] overlap [ymin, ymax] iff
    # ceil((ymin-R+1)/R) <= k <= floor(ymax/R)
    y_t = y.reshape(n, lq, m * p)
    y_t = _pad_to(y_t, 1, tq).reshape(n, n_q, tq * m * p)
    ymin = jnp.floor(jnp.min(y_t, axis=2)) - 1.0
    ymax = jnp.floor(jnp.max(y_t, axis=2)) + 1.0
    rr = float(rows_per_tile)
    lo = jnp.clip(jnp.ceil((ymin - rr + 1.0) / rr), 0, n_s - 1)
    hi = jnp.clip(jnp.floor(ymax / rr), -1, n_s - 1)
    # x-chunk range: the occupied corner columns per q-tile are
    # [floor(min x), floor(max x)+1], clipped to the real cell columns;
    # chunk c owns columns [c*CW, (c+1)*CW)
    x_t = x.reshape(n, lq, m * p)
    x_t = _pad_to(x_t, 1, tq).reshape(n, n_q, tq * m * p)
    left = jnp.clip(jnp.floor(jnp.min(x_t, axis=2)), 0, wp - 1)
    right = jnp.clip(jnp.floor(jnp.max(x_t, axis=2)) + 1.0, 0, wp - 1)
    xlo = jnp.floor(left / cw)
    xhi = jnp.floor(right / cw)
    # fully out-of-range tile -> empty walk (lo=0, hi=-1)
    ranges = jnp.concatenate(
        [lo.reshape(-1), hi.reshape(-1),
         xlo.reshape(-1), xhi.reshape(-1)]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_q),
        in_specs=[
            pl.BlockSpec((1, tq, m * 3 * p), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tq, m * d), lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v4, ts=ts, wp=wp, cw=cw, n_points=p,
                          n_heads=m, d_head=d, md_pad=md_pad,
                          v_dtype=value_l.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, lqp, m * d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * lqp * cp * m * (d + p),
            bytes_accessed=(qinfo.size * 4 + v.size * v.dtype.itemsize
                            + n * lqp * m * d * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ranges, qinfo, v)
    out = out[:, :lq]
    if perm is not None:
        inv = jnp.argsort(perm, axis=1)
        out = jnp.take_along_axis(out, inv[:, :, None], axis=1)
    return out.reshape(n, lq, m, d)


def spatial_sort_perm(loc_all, h, w, bucket=8):
    """Permutation sorting queries by their mean sample position on an
    (h/bucket, w/bucket) tile raster.  loc_all (N, Lq, M, P, 2) in [0,1]
    at ANY level (image-space locality is level-independent)."""
    xm = jnp.clip(jnp.mean(loc_all[..., 0], axis=(2, 3)) * w, 0, w - 1)
    ym = jnp.clip(jnp.mean(loc_all[..., 1], axis=(2, 3)) * h, 0, h - 1)
    ntx = -(-w // bucket)
    key = (ym.astype(jnp.int32) // bucket) * ntx \
        + xm.astype(jnp.int32) // bucket
    return jnp.argsort(key, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "tq", "rows_per_tile", "cw",
                                    "interpret", "_force_flags"))
def _dense_level_pallas_v3_fwd(value_l, loc_l, attn_l, h, w, tq=256,
                               rows_per_tile=None, cw=64, perm=None,
                               interpret=False, _force_flags=None):
    """v3: sorted queries + x-window.  Same contract/numerics as v2.
    `perm` (N, Lq) overrides the internally computed spatial sort."""
    n, c, m, d = value_l.shape
    _, lq, _, p, _ = loc_l.shape
    assert c == h * w, (c, h, w)
    assert p <= P_UNROLL_MAX, p

    wp = max(128, -(-w // 128) * 128)
    cw = min(cw, wp)
    if rows_per_tile is None:
        rows_per_tile = max(1, 1024 // wp)
    rows_per_tile = min(rows_per_tile, h)
    ts = rows_per_tile * wp

    if perm is None:
        perm = spatial_sort_perm(loc_l, h, w)
    loc_s = jnp.take_along_axis(loc_l, perm[:, :, None, None, None], axis=1)
    attn_s = jnp.take_along_axis(attn_l, perm[:, :, None, None], axis=1)

    x = loc_s[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_s[..., 1].astype(jnp.float32) * h - 0.5
    qinfo = jnp.concatenate(
        [x, y, attn_s.astype(jnp.float32)], axis=-1)  # (N, Lq, M, 3P)
    qinfo = qinfo.reshape(n, lq, m * 3 * p)
    qinfo = _pad_to(qinfo, 1, tq)
    lqp = qinfo.shape[1]
    n_q = lqp // tq

    v = value_l.reshape(n, h, w, m * d)
    v = _pad_to(v, 2, wp) if wp != w else v
    v = v.reshape(n, h * wp, m * d)
    v = _pad_to(v, 1, ts)
    cp = v.shape[1]
    n_s = cp // ts

    # y flags (as v2)
    y_t = _pad_to(y.reshape(n, lq, m * p), 1, tq) \
        .reshape(n, n_q, tq * m * p)
    ymin = jnp.floor(jnp.min(y_t, axis=2)) - 1.0
    ymax = jnp.floor(jnp.max(y_t, axis=2)) + 1.0
    r0 = jnp.arange(n_s, dtype=jnp.float32) * rows_per_tile
    overlap = ((ymax[:, :, None] >= r0[None, None, :])
               & (ymin[:, :, None] <= r0[None, None, :] + rows_per_tile - 1))
    flags = overlap.astype(jnp.int32)
    if _force_flags is not None:
        flags = jnp.full_like(flags, _force_flags)

    # x windows: nonzero hat columns of a sample lie in
    # {floor(x), floor(x)+1}; the q-tile fits when the occupied column
    # range (clipped to the real cells) spans <= CW
    x_t = _pad_to(x.reshape(n, lq, m * p), 1, tq).reshape(n, n_q, tq * m * p)
    xmin_f = jnp.floor(jnp.min(x_t, axis=2)).astype(jnp.int32)
    xmax_f = jnp.floor(jnp.max(x_t, axis=2)).astype(jnp.int32) + 1
    left = (jnp.maximum(0, xmin_f) // 8) * 8  # sublane-aligned (Mosaic
    # requires a provable multiple-of-8 dynamic start; see _kernel_v3)
    right = jnp.minimum(wp - 1, xmax_f)
    fits = ((right - left + 1) <= cw).astype(jnp.int32)
    xstart = jnp.clip(left, 0, (wp - cw) // 8 * 8).astype(jnp.int32)

    scal = jnp.concatenate(
        [flags.reshape(-1), fits.reshape(-1), xstart.reshape(-1)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_q, n_s),
        in_specs=[
            pl.BlockSpec((1, tq, m * 3 * p), lambda i, j, k, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, m * d), lambda i, j, k, *_: (i, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, m * d), lambda i, j, k, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v3, ts=ts, wp=wp, cw=cw, n_points=p,
                          n_heads=m, d_head=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, lqp, m * d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * lqp * cp * m * (d + p),
            bytes_accessed=(qinfo.size * 4 + v.size * v.dtype.itemsize
                            + n * lqp * m * d * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal, qinfo, v)
    out = out[:, :lq]
    inv = jnp.argsort(perm, axis=1)
    out = jnp.take_along_axis(out, inv[:, :, None], axis=1)
    return out.reshape(n, lq, m, d)


def _pad_to(arr, axis, mult):
    size = arr.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "tq", "ts", "interpret"))
def _dense_level_pallas_fwd(value_l, loc_l, attn_l, h, w,
                            tq=256, ts=512, interpret=False):
    """value_l (N, H*W, M, D); loc_l (N, Lq, M, P, 2) in [0,1];
    attn_l (N, Lq, M, P) -> (N, Lq, M, D) f32."""
    n, c, m, d = value_l.shape
    _, lq, _, p, _ = loc_l.shape
    assert c == h * w, (c, h, w)
    assert p <= P_UNROLL_MAX, p

    # grid_sample(align_corners=False) cell coordinates
    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5
    qinfo = jnp.concatenate(
        [x, y, attn_l.astype(jnp.float32)], axis=-1)      # (N, Lq, M, 3P)
    qinfo = qinfo.transpose(0, 2, 1, 3).reshape(n * m, lq, 3 * p)
    v = value_l.transpose(0, 2, 1, 3).reshape(n * m, c, d)

    qinfo = _pad_to(qinfo, 1, tq)
    v = _pad_to(v, 1, ts)
    lqp, cp = qinfo.shape[1], v.shape[1]

    grid = (n * m, lqp // tq, cp // ts)
    out = pl.pallas_call(
        functools.partial(_kernel, ts=ts, w_level=w, n_points=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, 3 * p), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda i, j, k: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * m, lqp, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * lqp * cp * (d + p),
            bytes_accessed=(qinfo.size * 4 + v.size * v.dtype.itemsize
                            + n * m * lqp * d * 4),
            transcendentals=0),
        interpret=interpret,
    )(qinfo, v)
    out = out[:, :lq].reshape(n, m, lq, d).transpose(0, 2, 1, 3)
    return out


def _level_out_gather(value_l, loc_l, attn_l, h, w):
    """XLA gather formulation of the same per-level contribution (used for
    the backward pass; numerics identical to the kernel)."""
    n, c, m, d = value_l.shape
    _, lq, _, p, _ = loc_l.shape
    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx, dy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    idx_c, w_c = [], []
    for cx, cy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        ix, iy = x0i + cx, y0i + cy
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx_c.append(jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1))
        wx = dx if cx else (1.0 - dx)
        wy = dy if cy else (1.0 - dy)
        w_c.append(wx * wy * valid * attn_l)
    idx = jnp.stack(idx_c, axis=-1)      # (N, Lq, M, P, 4)
    wgt = jnp.stack(w_c, axis=-1)
    # (N, M, Lq, P4) row-gather from (N, M, C, D)
    v = value_l.transpose(0, 2, 1, 3)
    idx_nm = idx.transpose(0, 2, 1, 3, 4).reshape(n, m, lq * p * 4)
    g = jnp.take_along_axis(v, idx_nm[..., None], axis=2)
    g = g.reshape(n, m, lq, p * 4, d)
    wgt_nm = wgt.transpose(0, 2, 1, 3, 4).reshape(n, m, lq, p * 4)
    out = jnp.einsum("nmqk,nmqkd->nmqd", wgt_nm.astype(value_l.dtype), g,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_level_pallas(value_l, loc_l, attn_l, h, w, interpret=False):
    """EXACT per-level MSDA contribution as a Pallas generated-LHS matmul.

    value_l (N, H*W, M, D); loc_l (N, Lq, M, P, 2); attn_l (N, Lq, M, P)
    -> (N, Lq, M, D) f32.  `interpret=True` runs the kernel in interpreter
    mode (CPU tests).  Gradients flow via the XLA gather formulation.
    """
    return _dense_level_pallas_fwd(value_l, loc_l, attn_l, h, w,
                                   interpret=interpret)


def _fwd(value_l, loc_l, attn_l, h, w, interpret):
    out = _dense_level_pallas_fwd(value_l, loc_l, attn_l, h, w,
                                  interpret=interpret)
    return out, (value_l, loc_l, attn_l)


def _bwd(h, w, interpret, res, g):
    value_l, loc_l, attn_l = res
    _, vjp = jax.vjp(
        lambda v, l, a: _level_out_gather(v, l, a, h, w),
        value_l, loc_l, attn_l)
    return vjp(g)


dense_level_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_level_pallas_v2(value_l, loc_l, attn_l, h, w, interpret=False):
    """Block-skipping variant of `dense_level_pallas` (see _kernel_v2):
    same exact semantics, cost scales with sampling locality, level 0
    viable.  Gradients flow via the XLA gather formulation."""
    return _dense_level_pallas_v2_fwd(value_l, loc_l, attn_l, h, w,
                                      interpret=interpret)


def _fwd_v2(value_l, loc_l, attn_l, h, w, interpret):
    out = _dense_level_pallas_v2_fwd(value_l, loc_l, attn_l, h, w,
                                     interpret=interpret)
    return out, (value_l, loc_l, attn_l)


dense_level_pallas_v2.defvjp(_fwd_v2, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_level_pallas_v3(value_l, loc_l, attn_l, h, w, interpret=False):
    """Sorted + x-windowed variant of `dense_level_pallas_v2` (see
    _kernel_v3): same exact semantics; compute scales with 2-D sampling
    locality.  Gradients flow via the XLA gather formulation."""
    return _dense_level_pallas_v3_fwd(value_l, loc_l, attn_l, h, w,
                                      interpret=interpret)


def _fwd_v3(value_l, loc_l, attn_l, h, w, interpret):
    out = _dense_level_pallas_v3_fwd(value_l, loc_l, attn_l, h, w,
                                     interpret=interpret)
    return out, (value_l, loc_l, attn_l)


dense_level_pallas_v3.defvjp(_fwd_v3, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_level_pallas_v4(value_l, loc_l, attn_l, h, w, interpret=False):
    """Compacted-grid variant of `dense_level_pallas_v2` (see _kernel_v4):
    same exact semantics; grid scales with q-tiles only and value tiles are
    hand-DMA'd over each tile's contiguous active range.  Gradients flow
    via the XLA gather formulation."""
    return _dense_level_pallas_v4_fwd(value_l, loc_l, attn_l, h, w,
                                      interpret=interpret)


def _fwd_v4(value_l, loc_l, attn_l, h, w, interpret):
    out = _dense_level_pallas_v4_fwd(value_l, loc_l, attn_l, h, w,
                                     interpret=interpret)
    return out, (value_l, loc_l, attn_l)


dense_level_pallas_v4.defvjp(_fwd_v4, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def dense_level_pallas_v4p(value_l, loc_l, attn_l, perm, h, w, cw,
                           interpret=False):
    """`dense_level_pallas_v4` with a caller-supplied sort permutation and
    x-chunk width — lets `ms_deform_attn` hoist ONE spatial argsort per op
    call instead of one per level (image-space locality is
    level-independent).  `perm` is integer data: its cotangent is float0."""
    return _dense_level_pallas_v4_fwd(value_l, loc_l, attn_l, h, w, cw=cw,
                                      perm=perm, interpret=interpret)


def _fwd_v4p(value_l, loc_l, attn_l, perm, h, w, cw, interpret):
    out = _dense_level_pallas_v4_fwd(value_l, loc_l, attn_l, h, w, cw=cw,
                                     perm=perm, interpret=interpret)
    return out, (value_l, loc_l, attn_l, perm)


def _bwd_v4p(h, w, cw, interpret, res, g):
    import numpy as np
    value_l, loc_l, attn_l, perm = res
    _, vjp = jax.vjp(
        lambda v, l, a: _level_out_gather(v, l, a, h, w),
        value_l, loc_l, attn_l)
    dv, dl, da = vjp(g)
    return dv, dl, da, np.zeros(perm.shape, jax.dtypes.float0)


dense_level_pallas_v4p.defvjp(_fwd_v4p, _bwd_v4p)
