"""Fused all-levels patch-walk MSDA kernel ("v5").

Round-3 finding (PLAN.md): the block-skipping kernels (ops/msda_dense.py
v2/v4) are floored by their VPU hat-weight build — every (q-tile, value
row) pair computes dense (TQ, padded-width) hat products although each
sample's bilinear support is 2 columns x 2 rows.  Their tiles span WHOLE
value rows, so only y-locality is exploitable and the x-extent is always
the full padded width (256 lanes at flagship level 0).

This kernel makes the compute field scale with TRUE 2-D locality:

  * Queries are pre-sorted by a STATIC snake-bucket permutation.  Encoder
    queries are the level tokens themselves, so each query's expected
    sample position is its own (static) grid position — the permutation is
    a compile-time numpy constant shared by every layer/frame/batch, with
    zero runtime argsort (the per-call sort/unsort gathers that made the
    v3 kernel a measured negative are replaced by two cheap fixed-index
    gathers).  Snake (boustrophedon) bucket order keeps tiles that wrap a
    bucket row spatially compact, unlike raster bucket order.
  * Values are re-tiled (one XLA block-transpose per level) into
    patch-major chunks of PH x PW = 8 x 16 cells = exactly 128 lanes, so a
    chunk's flattened cell axis fills the VPU/MXU lane dimension with no
    padding waste.
  * The grid runs over q-tiles only.  Each (q-tile, level) walks the
    rectangle of chunks its samples touch (corner cells +-1 hat support,
    computed outside on the VPU and prefetched as scalars), with manual
    double-buffered HBM->VMEM chunk DMA pipelined ACROSS levels — all four
    levels run in ONE pallas_call, so per-call XLA glue is paid once.
  * Inside a chunk, the hat weights are built over 128 flattened cells per
    (head, point) and fed straight to the MXU against the (128, D) chunk
    values — identical numerics to 4-corner gathering (grid_sample
    zero-padding included: out-of-level cells hold zero value rows).

Cost scales with sum over q-tiles of the tile's true 2-D bounding boxes,
degrading gracefully to the dense field when offsets spread — the same
contract as v2/v4, but in both axes.

Semantics match the reference CUDA kernel
(/root/reference/src/trackformer/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:166-237)
and its pure-PyTorch twin
(/root/reference/src/trackformer/models/ops/functions/ms_deform_attn_func.py:34-54).
Backward mirrors the reference col2im: gradients flow through the
numerically identical XLA gather formulation (jax.custom_vjp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda_dense import _level_out_gather, _pad_to

# chunk geometry default: PH x PW cells flatten to a whole number of
# 128-wide lane groups.  Bigger chunks amortize the per-chunk walk
# overhead (grid/DMA/loop bookkeeping, measured ~5-6 us) over more cells
# at the price of more alignment slop.  Defaults are the round-4 on-chip
# sweep winner (tools/bench_msda_dense.py --tiles, flagship encoder scale,
# sigma=0.02): tq=128 / 16x32 chunks = 16.14 ms/layer-equivalent vs 17.48
# for the previous 256 / 8x32 default (full table in PLAN.md).
V5_PH = 16
V5_PW = 32

# q-tile size; defaulted from the same sweep (smaller q-tiles tighten each
# tile's walked chunk rectangle more than they add grid steps).  Read at
# trace time — flipping after a same-shape call requires
# ms_deform_attn.clear_cache().
V5_TQ = 128

P_UNROLL_MAX = 8


@functools.lru_cache(maxsize=None)
def snake_bucket_perm(spatial_shapes, bucket=8):
    """Static permutation sorting the S = sum H_l*W_l encoder tokens by
    image-space locality.

    Tokens are bucketed on the level-0 grid (`bucket` L0 cells per side)
    and buckets are ordered boustrophedon (odd bucket rows reversed), so
    any run of consecutive sorted tokens — including runs that straddle a
    bucket-row boundary — covers a compact image region.  Ties (same
    bucket) keep the original level-major raster order (stable sort).

    Returns (perm, inv) as int32 numpy arrays: sorted[i] = tokens[perm[i]],
    tokens[j] = sorted[inv[j]].
    """
    h0, w0 = spatial_shapes[0]
    nbx = -(-w0 // bucket)
    keys = []
    for h, w in spatial_shapes:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        y0 = (yy + 0.5) / h * h0
        x0 = (xx + 0.5) / w * w0
        by = np.minimum(y0 / bucket, -(-h0 // bucket) - 1).astype(np.int64)
        bx = np.minimum(x0 / bucket, nbx - 1).astype(np.int64)
        bx_snake = np.where(by % 2 == 0, bx, nbx - 1 - bx)
        keys.append((by * nbx + bx_snake).reshape(-1))
    key = np.concatenate(keys)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    return perm, inv


def _kernel_v5(ranges_ref, qinfo_ref, v_hbm, o_ref, *, level_meta, tq,
               n_points, n_heads, d_head, mdp, v_dtype, ph, pw,
               debug=None):
    """Grid (N, nQ).  ranges int32 sections [cylo | cyhi | cxlo | cxhi],
    each N*nQ*L entries indexed ((n*nQ + q)*L + lvl).  qinfo
    (1, TQ, L*3*M*P) f32 VMEM, per-level blocks [x(m,p) | y(m,p) | a(m,p)].
    v_hbm (N, total_chunks*CS, MDp) unblocked; o (1, TQ, M*D) f32.

    Per level the kernel walks the chunk rectangle [cylo..cyhi] x
    [cxlo..cxhi] linearized, double-buffering chunk DMAs across level
    boundaries (the next level's first chunk prefetches behind the current
    level's last), building Sum_p a*haty*hatx over the 128 flattened chunk
    cells per head and accumulating one (TQ, D) dot per (chunk, head).
    """
    n_i = pl.program_id(0)
    q_i = pl.program_id(1)
    n_q = pl.num_programs(1)
    n_n = pl.num_programs(0)
    n_levels = len(level_meta)
    nl_tot = n_n * n_q * n_levels
    base_idx = (n_i * n_q + q_i) * n_levels
    mp = n_heads * n_points

    o_ref[0] = jnp.zeros_like(o_ref[0])

    cs = ph * pw

    def scoped(scratch, sems):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
        ydiv = (iota // pw).astype(jnp.float32)  # (1, cs) cell-row offset
        xmod = (iota % pw).astype(jnp.float32)   # (1, cs) cell-col offset

        walk = []
        for lvl in range(n_levels):
            cylo = ranges_ref[0 * nl_tot + base_idx + lvl]
            cyhi = ranges_ref[1 * nl_tot + base_idx + lvl]
            cxlo = ranges_ref[2 * nl_tot + base_idx + lvl]
            cxhi = ranges_ref[3 * nl_tot + base_idx + lvl]
            nx = cxhi - cxlo + 1
            walk.append((cylo, cxlo, nx, (cyhi - cylo + 1) * nx))

        def cid(lvl, t):
            """Global chunk id of walk step t of level lvl."""
            cylo, cxlo, nx, _ = walk[lvl]
            base, nx_l = level_meta[lvl]
            cy = cylo + t // nx
            cx = cxlo + t % nx
            return base + cy * nx_l + cx

        def dma(slot, chunk):
            return pltpu.make_async_copy(
                v_hbm.at[n_i, pl.ds(chunk * cs, cs), :],
                scratch.at[slot], sems.at[slot])

        dma(0, cid(0, 0)).start()

        g = jnp.int32(0)  # global chunk counter -> buffer parity
        for lvl in range(n_levels):
            cylo, cxlo, nx, total_l = walk[lvl]
            _, nx_l = level_meta[lvl]
            col0 = lvl * 3 * mp
            q = qinfo_ref[0]  # (TQ, L*3MP)

            def body(t, g, lvl=lvl, cylo=cylo, cxlo=cxlo, nx=nx,
                     total_l=total_l, col0=col0):
                slot = g % 2

                @pl.when(t + 1 < total_l)
                def _prefetch():
                    dma((g + 1) % 2, cid(lvl, t + 1)).start()

                if lvl + 1 < n_levels:
                    @pl.when(t + 1 == total_l)
                    def _prefetch_next_level():
                        dma((g + 1) % 2, cid(lvl + 1, 0)).start()

                dma(slot, cid(lvl, t)).wait()
                if debug == "nobody":  # walk + DMA only (bisection)
                    o_ref[0, :1, :1] = o_ref[0, :1, :1] + scratch[
                        slot, :1, :1].astype(jnp.float32)
                    return g + 1

                ybase = ((cylo + t // nx) * ph).astype(jnp.float32)
                xbase = ((cxlo + t % nx) * pw).astype(jnp.float32)
                ycell = ybase + ydiv  # (1, CS)
                xcell = xbase + xmod
                tiles = []
                for mh in range(n_heads):
                    if debug == "nohat":  # dots only (bisection)
                        seg = xcell + jnp.zeros((tq, 1), jnp.float32)
                    else:
                        seg = None
                        for pp in range(n_points):
                            c = col0 + mh * n_points + pp
                            x = q[:, c:c + 1]               # (TQ, 1)
                            y = q[:, mp + c:mp + c + 1]
                            a = q[:, 2 * mp + c:2 * mp + c + 1]
                            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - xcell))
                            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - ycell))
                            term = (a * wy) * wx            # (TQ, CS)
                            seg = term if seg is None else seg + term
                    if debug == "nodot":  # hat build only (bisection)
                        o_ref[0, :1, :1] = o_ref[0, :1, :1] + seg[:1, :1]
                        continue
                    v = scratch[slot, :, mh * d_head:(mh + 1) * d_head]
                    tiles.append(jnp.dot(seg.astype(v_dtype), v,
                                         preferred_element_type=jnp.float32))
                if debug != "nodot":
                    o_ref[0] = o_ref[0] + jnp.concatenate(tiles, axis=1)
                return g + 1

            g = jax.lax.fori_loop(0, total_l, body, g)

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((2, cs, mdp), v_dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit,
                   static_argnums=(1,),
                   static_argnames=("tq", "ph", "pw", "interpret", "debug"))
def _msda_patch_fwd(value, spatial_shapes, sampling_locations,
                    attention_weights, tq=None, ph=None, pw=None,
                    interpret=False, debug=None):
    """Full-op forward: value (N, S, M, D) raster all levels; locations
    (N, Lq, M, L, P, 2) in [0,1]; weights (N, Lq, M, L, P); Lq must equal
    S (encoder self-pattern — the static permutation assumes queries are
    the tokens).  Returns (N, Lq, M, D) f32.
    """
    if tq is None:
        tq = V5_TQ
    if ph is None:
        ph = V5_PH
    if pw is None:
        pw = V5_PW
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert lq == s, (lq, s)
    assert l == len(spatial_shapes)
    assert p <= P_UNROLL_MAX, p
    md = m * d
    mdp = -(-md // 128) * 128

    perm, inv = snake_bucket_perm(tuple(spatial_shapes))
    perm_j = jnp.asarray(perm)

    loc_s = jnp.take(sampling_locations, perm_j, axis=1)
    attn_s = jnp.take(attention_weights, perm_j, axis=1)

    # value chunking: per level (H, W, MD) -> zero-pad to (Hp, Wp, MDp) ->
    # patch-major (nY*nX, PH*PW, MDp) chunks, concatenated across levels
    chunk_arrs, level_meta = [], []
    base = 0
    offset = 0
    for h, w in spatial_shapes:
        hp = -(-h // ph) * ph
        wp2 = -(-w // pw) * pw
        v = value[:, offset:offset + h * w].reshape(n, h, w, md)
        v = _pad_to(_pad_to(_pad_to(v, 1, hp), 2, wp2), 3, mdp)
        ny, nx = hp // ph, wp2 // pw
        v = v.reshape(n, ny, ph, nx, pw, mdp).transpose(0, 1, 3, 2, 4, 5)
        chunk_arrs.append(v.reshape(n, ny * nx * ph * pw, mdp))
        level_meta.append((base, nx))
        base += ny * nx
        offset += h * w
    vc = jnp.concatenate(chunk_arrs, axis=1)  # (N, base*CS, MDp)

    # qinfo columns per level: [x (M*P) | y (M*P) | a (M*P)] in cell units
    qcols, rng_secs = [], ([], [], [], [])
    lqp = -(-lq // tq) * tq
    n_q = lqp // tq
    for lvl, (h, w) in enumerate(spatial_shapes):
        x = loc_s[:, :, :, lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = loc_s[:, :, :, lvl, :, 1].astype(jnp.float32) * h - 0.5
        a = attn_s[:, :, :, lvl].astype(jnp.float32)
        qcols += [x.reshape(n, lq, m * p), y.reshape(n, lq, m * p),
                  a.reshape(n, lq, m * p)]
        # chunk rectangle per q-tile: occupied corner cells are
        # [floor(min), floor(max)+1] clipped into the level, +- nothing
        # more (hat support is exactly the two corner cells)
        x_t = _pad_to(x.reshape(n, lq, m * p), 1, tq) \
            .reshape(n, n_q, tq * m * p)
        y_t = _pad_to(y.reshape(n, lq, m * p), 1, tq) \
            .reshape(n, n_q, tq * m * p)
        cxlo = jnp.clip(jnp.floor(jnp.min(x_t, axis=2)), 0, w - 1) // pw
        cxhi = jnp.clip(jnp.floor(jnp.max(x_t, axis=2)) + 1, 0, w - 1) // pw
        cylo = jnp.clip(jnp.floor(jnp.min(y_t, axis=2)), 0, h - 1) // ph
        cyhi = jnp.clip(jnp.floor(jnp.max(y_t, axis=2)) + 1, 0, h - 1) // ph
        for sec, arr in zip(rng_secs, (cylo, cyhi, cxlo, cxhi)):
            sec.append(arr)
    qinfo = _pad_to(jnp.concatenate(qcols, axis=-1), 1, tq)
    # sections stacked level-minor: ((n*nQ) major, level minor)
    ranges = jnp.concatenate([
        jnp.stack(sec, axis=-1).reshape(-1) for sec in rng_secs
    ]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_q),
        in_specs=[
            pl.BlockSpec((1, tq, l * 3 * m * p), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tq, md), lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v5, level_meta=tuple(level_meta), tq=tq,
                          n_points=p, n_heads=m, d_head=d, mdp=mdp,
                          v_dtype=value.dtype, ph=ph, pw=pw, debug=debug),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, lqp, md), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * lq * m * p * 4 * d * 8,
            bytes_accessed=(qinfo.size * 4 + 3 * vc.size * vc.dtype.itemsize
                            + n * lqp * md * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ranges, qinfo, vc)
    return jnp.take(out[:, :lq], jnp.asarray(inv), axis=1) \
        .reshape(n, lq, m, d)


def _full_gather_ref(value, spatial_shapes, loc, attn):
    """All-levels XLA gather formulation (numerics identical to the
    kernel); used for the custom-VJP backward, mirroring the reference
    col2im scatter-adds."""
    n, s, m, d = value.shape
    out = jnp.zeros((n, loc.shape[1], m, d), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        out = out + _level_out_gather(
            value[:, offset:offset + h * w], loc[:, :, :, lvl],
            attn[:, :, :, lvl], h, w)
        offset += h * w
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def msda_patch(value, spatial_shapes, sampling_locations,
               attention_weights, interpret=False):
    """EXACT all-levels MSDA as ONE fused patch-walk Pallas kernel (see
    module docstring).  Requires Lq == S (encoder).  Gradients flow via
    the XLA gather formulation."""
    return _msda_patch_fwd(value, spatial_shapes, sampling_locations,
                           attention_weights, interpret=interpret)


def _fwd(value, spatial_shapes, loc, attn, interpret):
    out = _msda_patch_fwd(value, spatial_shapes, loc, attn,
                          interpret=interpret)
    return out, (value, loc, attn)


def _bwd(spatial_shapes, interpret, res, g):
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, lo, a: _full_gather_ref(v, spatial_shapes, lo, a),
        value, loc, attn)
    return vjp(g)


msda_patch.defvjp(_fwd, _bwd)

# ---------------------------------------------------------------------------
# v6: flat precomputed walk + row-strip hat build + deep DMA ring
#
# The v5 bisection (PLAN.md round-4 table) measured a ~5.7 us per-visit
# floor in the walk itself (scalar div/mod, dual pl.when prefetch branches,
# 2-slot DMA ring with no latency slack) and an 11-op/cell hat build.  v6
# attacks both:
#   * the ENTIRE multi-level chunk walk is precomputed on the host as one
#     flat per-tile list of packed (lvl, cy, cx) codes (SMEM scalars, at
#     most sum-of-chunk-grids entries) — the kernel runs ONE fori over the
#     list with shift/mask decodes, no division, no level boundaries;
#   * the DMA ring is NSLOTS deep (prefetch NSLOTS-1 ahead), giving each
#     copy several compute-iterations of latency slack;
#   * the hat build is row-strip separable: per (head, point) the x-factor
#     (attention folded in) is built ONCE per chunk on (TQ, PW) and the
#     y-factor on (TQ, PH); each chunk row then costs 2 vector ops per
#     cell (broadcast-mul + accumulate) instead of 11.
# Semantics identical to v5/_level_out_gather.
#
# MEASURED NEGATIVE (TPU v5e, flagship encoder scale, sigma=0.02): v6 is
# ~2x SLOWER than v5 (41.8 ms vs 20.9 for the all-level op; 16x32: 49.3,
# 32x64: 57.1, tq=384: 44.9, nslots=8: 41.8 — geometry/ring-depth
# insensitive).  The walk+DMA skeleton alone ("nobody" bisection) is
# 7.8 ms, so the row-strip hat build + per-chunk dot dominate: the larger
# (PH x PW) chunks the row-strip build needs do MORE dense work per visit
# than v5's 128-cell chunks save in per-visit overhead.  Kept as a tested,
# numerics-exact variant (tests/test_msda_patch.py::test_v6_*); NOT routed.
# ---------------------------------------------------------------------------

V6_PH = 16
V6_PW = 64
V6_NSLOTS = 4


def _kernel_v6(scal_ref, qinfo_ref, v_hbm, o_ref, *, level_meta, tq,
               n_points, n_heads, d_head, mdp, v_dtype, ph, pw, qs, maxc,
               nslots, debug=None):
    """Grid (N, nQ).  scal layout: [codes (N*nQ*MAXC) | totals (N*nQ)];
    code = (lvl << 20) | (cy << 10) | cx.  qinfo (1, TQ, L*QS) f32 with
    per-level 128-aligned blocks [x (M*P) | y (M*P) | a (M*P) | pad];
    v_hbm (N, total_chunks*CS, MDp); o (1, TQ, M*D) f32."""
    n_i = pl.program_id(0)
    q_i = pl.program_id(1)
    n_q = pl.num_programs(1)
    n_n = pl.num_programs(0)
    ti = n_i * n_q + q_i
    mp = n_heads * n_points
    cs = ph * pw
    n_levels = len(level_meta)

    total = scal_ref[n_n * n_q * maxc + ti]

    o_ref[0] = jnp.zeros_like(o_ref[0])

    def scoped(scratch, sems):
        iota_pw = jax.lax.broadcasted_iota(
            jnp.int32, (1, pw), 1).astype(jnp.float32)
        iota_ph = jax.lax.broadcasted_iota(
            jnp.int32, (1, ph), 1).astype(jnp.float32)

        def decode(j):
            code = scal_ref[ti * maxc + j]
            lvl = code // (1 << 20)
            cy = (code // (1 << 10)) % (1 << 10)
            cx = code % (1 << 10)
            # static per-level base/grid-width, selected arithmetically
            base = jnp.int32(0)
            nxg = jnp.int32(0)
            for li, (b, nx_l) in enumerate(level_meta):
                hit = (lvl == li).astype(jnp.int32)
                base += hit * b
                nxg += hit * nx_l
            return lvl, cy, cx, base + cy * nxg + cx

        def dma(slot, chunk):
            return pltpu.make_async_copy(
                v_hbm.at[n_i, pl.ds(chunk * cs, cs), :],
                scratch.at[slot], sems.at[slot])

        for dpth in range(nslots - 1):
            @pl.when(dpth < total)
            def _warmup(dpth=dpth):
                dma(dpth % nslots, decode(dpth)[3]).start()

        def body(j, carry):
            slot = j % nslots

            @pl.when(j + nslots - 1 < total)
            def _prefetch():
                dma((j + nslots - 1) % nslots,
                    decode(j + nslots - 1)[3]).start()

            lvl, cy, cx, chunk = decode(j)
            dma(slot, chunk).wait()
            if debug == "nobody":  # walk + DMA only (bisection)
                o_ref[0, :1, :1] = o_ref[0, :1, :1] + scratch[
                    slot, :1, :1].astype(jnp.float32)
                return carry

            ybase = (cy * ph).astype(jnp.float32)
            xbase = (cx * pw).astype(jnp.float32)
            ycells = ybase + iota_ph                      # (1, PH)
            xcells = xbase + iota_pw                      # (1, PW)
            q_l = qinfo_ref[0, :, pl.ds(lvl * qs, qs)]    # (TQ, QS)

            tiles = []
            for mh in range(n_heads):
                if debug == "nohat":  # dots only (bisection)
                    seg = jnp.zeros((tq, cs), jnp.float32) + xbase
                else:
                    wx_p, wy_p = [], []
                    for pp in range(n_points):
                        c = mh * n_points + pp
                        x = q_l[:, c:c + 1]               # (TQ, 1)
                        y = q_l[:, mp + c:mp + c + 1]
                        a = q_l[:, 2 * mp + c:2 * mp + c + 1]
                        wx_p.append(a * jnp.maximum(
                            0.0, 1.0 - jnp.abs(x - xcells)))   # (TQ, PW)
                        wy_p.append(jnp.maximum(
                            0.0, 1.0 - jnp.abs(y - ycells)))   # (TQ, PH)
                    rows = []
                    for r in range(ph):
                        seg_r = None
                        for pp in range(n_points):
                            t = wy_p[pp][:, r:r + 1] * wx_p[pp]
                            seg_r = t if seg_r is None else seg_r + t
                        rows.append(seg_r)
                    seg = jnp.concatenate(rows, axis=1)   # (TQ, CS)
                if debug == "nodot":  # hat build only (bisection)
                    o_ref[0, :1, :1] = o_ref[0, :1, :1] + seg[:1, :1]
                    continue
                v = scratch[slot, :, mh * d_head:(mh + 1) * d_head]
                tiles.append(jnp.dot(seg.astype(v_dtype), v,
                                     preferred_element_type=jnp.float32))
            if debug != "nodot":
                o_ref[0] = o_ref[0] + jnp.concatenate(tiles, axis=1)
            return carry

        jax.lax.fori_loop(0, total, body, 0)

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((nslots, cs, mdp), v_dtype),
        sems=pltpu.SemaphoreType.DMA((nslots,)),
    )


@functools.partial(jax.jit,
                   static_argnums=(1,),
                   static_argnames=("tq", "ph", "pw", "nslots", "interpret",
                                    "debug"))
def _msda_patch_v6_fwd(value, spatial_shapes, sampling_locations,
                       attention_weights, tq=None, ph=None, pw=None,
                       nslots=None, interpret=False, debug=None):
    """v6 forward — same contract/numerics as `_msda_patch_fwd`."""
    if tq is None:
        tq = V5_TQ
    if ph is None:
        ph = V6_PH
    if pw is None:
        pw = V6_PW
    if nslots is None:
        nslots = V6_NSLOTS
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert lq == s, (lq, s)
    assert l == len(spatial_shapes)
    assert p <= P_UNROLL_MAX, p
    md = m * d
    mdp = -(-md // 128) * 128
    qs = -(-3 * m * p // 128) * 128

    perm, inv = snake_bucket_perm(tuple(spatial_shapes))
    loc_s = jnp.take(sampling_locations, jnp.asarray(perm), axis=1)
    attn_s = jnp.take(attention_weights, jnp.asarray(perm), axis=1)

    chunk_arrs, level_meta = [], []
    base = 0
    offset = 0
    for h, w in spatial_shapes:
        v = value[:, offset:offset + h * w].reshape(n, h, w, md)
        v = _pad_to(_pad_to(_pad_to(v, 1, ph), 2, pw), 3, mdp)
        ny, nx = v.shape[1] // ph, v.shape[2] // pw
        v = v.reshape(n, ny, ph, nx, pw, mdp).transpose(0, 1, 3, 2, 4, 5)
        chunk_arrs.append(v.reshape(n, ny * nx * ph * pw, mdp))
        level_meta.append((base, nx))
        base += ny * nx
        offset += h * w
    vc = jnp.concatenate(chunk_arrs, axis=1)
    maxc = base  # worst case: every chunk of every level

    lqp = -(-lq // tq) * tq
    n_q = lqp // tq
    qcols = []
    rect = []  # per level (cylo, cyhi, cxlo, cxhi) each (n, n_q)
    for lvl, (h, w) in enumerate(spatial_shapes):
        x = loc_s[:, :, :, lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = loc_s[:, :, :, lvl, :, 1].astype(jnp.float32) * h - 0.5
        a = attn_s[:, :, :, lvl].astype(jnp.float32)
        block = jnp.concatenate(
            [x.reshape(n, lq, m * p), y.reshape(n, lq, m * p),
             a.reshape(n, lq, m * p)], axis=-1)
        qcols.append(_pad_to(block, 2, qs))
        x_t = _pad_to(x.reshape(n, lq, m * p), 1, tq) \
            .reshape(n, n_q, tq * m * p)
        y_t = _pad_to(y.reshape(n, lq, m * p), 1, tq) \
            .reshape(n, n_q, tq * m * p)
        rect.append((
            (jnp.clip(jnp.floor(jnp.min(y_t, axis=2)), 0, h - 1) // ph),
            (jnp.clip(jnp.floor(jnp.max(y_t, axis=2)) + 1, 0, h - 1) // ph),
            (jnp.clip(jnp.floor(jnp.min(x_t, axis=2)), 0, w - 1) // pw),
            (jnp.clip(jnp.floor(jnp.max(x_t, axis=2)) + 1, 0, w - 1) // pw)))
    qinfo = _pad_to(jnp.concatenate(qcols, axis=-1), 1, tq)

    # flat walk list: per (n, tile) the packed (lvl, cy, cx) codes of all
    # levels' rectangles, concatenated; entries past `total` are unused
    counts = jnp.stack([(r[1] - r[0] + 1) * (r[3] - r[2] + 1)
                        for r in rect], axis=-1)          # (n, nQ, L)
    cum = jnp.concatenate([jnp.zeros_like(counts[..., :1]),
                           jnp.cumsum(counts, axis=-1)], axis=-1)
    totals = cum[..., -1]                                  # (n, nQ)
    j = jnp.arange(maxc)                                   # (MAXC,)
    jb = j[None, None, :]
    lvl_j = (jb >= cum[..., 1:, None]).sum(axis=-2)        # (n, nQ, MAXC)
    lvl_j = jnp.minimum(lvl_j, l - 1)
    t_j = jb - jnp.take_along_axis(
        cum, lvl_j.reshape(n, n_q, -1), axis=-1)
    t_j = jnp.maximum(t_j, 0)
    sel = lambda arrs: jnp.take_along_axis(  # noqa: E731
        jnp.stack(arrs, axis=-1), lvl_j, axis=-1)
    nx_j = sel([r[3] - r[2] + 1 for r in rect])
    cy = sel([r[0] for r in rect]) + t_j // jnp.maximum(nx_j, 1)
    cx = sel([r[2] for r in rect]) + t_j % jnp.maximum(nx_j, 1)
    codes = (lvl_j * (1 << 20) + cy * (1 << 10) + cx).astype(jnp.int32)
    scal = jnp.concatenate(
        [codes.reshape(-1), totals.reshape(-1).astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_q),
        in_specs=[
            pl.BlockSpec((1, tq, l * qs), lambda i, jj, *_: (i, jj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tq, md), lambda i, jj, *_: (i, jj, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v6, level_meta=tuple(level_meta), tq=tq,
                          n_points=p, n_heads=m, d_head=d, mdp=mdp,
                          v_dtype=value.dtype, ph=ph, pw=pw, qs=qs,
                          maxc=maxc, nslots=nslots, debug=debug),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, lqp, md), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * lq * m * p * 4 * d * 8,
            bytes_accessed=(qinfo.size * 4 + 3 * vc.size * vc.dtype.itemsize
                            + n * lqp * md * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(scal, qinfo, vc)
    return jnp.take(out[:, :lq], jnp.asarray(inv), axis=1) \
        .reshape(n, lq, m, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def msda_patch_v6(value, spatial_shapes, sampling_locations,
                  attention_weights, interpret=False):
    """EXACT all-levels MSDA as the v6 flat-walk Pallas kernel (see the
    v6 section comment).  Requires Lq == S (encoder).  Gradients flow via
    the XLA gather formulation."""
    return _msda_patch_v6_fwd(value, spatial_shapes, sampling_locations,
                              attention_weights, interpret=interpret)


def _fwd_v6(value, spatial_shapes, loc, attn, interpret):
    out = _msda_patch_v6_fwd(value, spatial_shapes, loc, attn,
                             interpret=interpret)
    return out, (value, loc, attn)


msda_patch_v6.defvjp(_fwd_v6, _bwd)
