"""Multi-scale deformable attention (MSDA) — TPU-native core op.

Semantic spec: the reference CUDA extension
(/root/reference/src/trackformer/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:166-237)
and its pure-PyTorch twin `ms_deform_attn_core_pytorch`
(/root/reference/src/trackformer/models/ops/functions/ms_deform_attn_func.py:34-54):
for every (batch, query, head) the op bilinearly samples the flattened
multi-level value tensor at P points per level (grid_sample semantics:
align_corners=False, zero padding) and reduces with softmaxed attention
weights.

Shapes (contract identical to the reference op,
/root/reference/src/trackformer/models/ops/modules/ms_deform_attn.py:49-59):
  value:              (N, S, M, D)   S = sum_l H_l*W_l
  spatial_shapes:     static tuple ((H_0, W_0), ..., (H_{L-1}, W_{L-1}))
  sampling_locations: (N, Lq, M, L, P, 2) in [0, 1] (x, y)
  attention_weights:  (N, Lq, M, L, P) normalized over L*P
  -> output:          (N, Lq, M*D)

TPU design: instead of the CUDA per-thread scalar loop, each level is one
big batched take-along-axis gather (XLA lowers this to vectorized HBM/VMEM
gathers) of the 4 bilinear corners, fused with the corner/attention weight
multiply-reduce. Backward falls out of autodiff (gather -> scatter-add),
mirroring the col2im kernels. Spatial shapes must be Python ints so the op
is shape-static under jit.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _corner_indices_weights(spatial_shapes, sampling_locations,
                            attention_weights, levels=None):
    """Global row indices + folded weights for all (level, point, corner)
    samples.

    Returns idx (N, Lq, M, L, P, 4) int32 into a head-major flat value table
    of N*M*S rows, and weights of the same shape (bilinear corner weight *
    attention weight * in-bounds mask). Index layout: row (n, m, s) ->
    (n * M + m) * S + level_offset + y * W + x.

    `levels` restricts the build to a subset of level indices (the L axis of
    the result then has len(levels) entries); offsets still span ALL levels
    so indices stay valid in the full flat table.
    """
    n, lq, m, l, p, _ = sampling_locations.shape
    s_total = sum(h * w for h, w in spatial_shapes)

    idx_levels, w_levels = [], []
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        if levels is not None and lvl not in levels:
            offset += h * w
            continue
        loc = sampling_locations[:, :, :, lvl]  # (N, Lq, M, P, 2)
        # grid_sample(align_corners=False): x = loc_x * W - 0.5
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        attn = attention_weights[:, :, :, lvl]  # (N, Lq, M, P)

        idx_c, w_c = [], []
        for cx, cy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            ix = x0i + cx
            iy = y0i + cy
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            idx = offset + jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
            wx = dx if cx else (1.0 - dx)
            wy = dy if cy else (1.0 - dy)
            idx_c.append(idx)
            w_c.append(wx * wy * valid * attn)
        idx_levels.append(jnp.stack(idx_c, axis=-1))  # (N, Lq, M, P, 4)
        w_levels.append(jnp.stack(w_c, axis=-1))
        offset += h * w

    idx = jnp.stack(idx_levels, axis=3)  # (N, Lq, M, L, P, 4)
    weights = jnp.stack(w_levels, axis=3)
    # head-major flat table offset
    nm_off = (jnp.arange(n)[:, None] * m + jnp.arange(m)[None, :]) * s_total
    idx = idx + nm_off[:, None, :, None, None, None]
    return idx, weights


def _dense_level_out(value_l, loc_l, attn_l, h, w):
    """EXACT MSDA contribution of ONE level as a dense separable-bilinear
    weight matmul — no gather.

    For integer cell coords s, the bilinear corner weights are exactly
    wx(sx) = max(0, 1 - |x - sx|) (and likewise wy): the two corners
    floor(x)/floor(x)+1 receive (1-dx)/dx and every other cell 0, with
    out-of-bounds corners naturally unrepresented. So
    out[q,m] = sum_p attn_p * wy_p^T V wx_p, built as one small weight
    tensor on the VPU and one matmul on the MXU. Beats the gather when
    Lq*M*H*W is small (coarse decoder levels): gather rows are uniform
    across levels (Lq*M*P*4 each) while dense cost scales with the cell
    count.

    value_l (N, H*W, M, D); loc_l (N, Lq, M, P, 2); attn_l (N, Lq, M, P)
    -> (N, Lq, M, D) float32.
    """
    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        x[..., None] - jnp.arange(w, dtype=jnp.float32)))  # (N,Lq,M,P,W)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        y[..., None] - jnp.arange(h, dtype=jnp.float32)))  # (N,Lq,M,P,H)
    wy = wy * attn_l[..., None].astype(jnp.float32)
    w_full = jnp.einsum("nqmph,nqmpw->nqmhw", wy, wx)
    n, lq, m, _, _ = w_full.shape
    w_full = w_full.reshape(n, lq, m, h * w).astype(value_l.dtype)
    return jnp.einsum("nqms,nsmd->nqmd", w_full, value_l,
                      preferred_element_type=jnp.float32)


# dense path for a level when N*Lq*M*cells is below this budget.  Batch-aware
# since round 5: the XLA dense path materializes an (N, Lq, M, H*W) hat in
# HBM, so its cost scales with N while the v1 Pallas kernel builds the hat
# in VMEM — measured on v5e at decoder shapes (tools/bench_decoder_msda_route
# .py, B=8): v1 wins every dense level (L1 2.29 vs 2.76 ms, L2 0.67 vs 1.11,
# L3 0.18 vs 0.69) and at B=1 wins L1 (0.026 vs 0.173).  8M keeps only the
# cheapest B=1 levels on the XLA path.
DENSE_CELL_BUDGET = 8_000_000

# Pallas generated-LHS-matmul paths (ops/msda_dense.py) for levels that
# overflow the XLA dense budget.  v2 (block-skipping, row tiles) needs
# query raster-locality to skip work, which holds when queries are the
# level tokens themselves (the encoder: Lq >= PALLAS_V2_MIN_QUERIES);
# there it covers every level incl. the finest.  v1 (plain tiling) is
# locality-independent and handles mid-size levels otherwise.  Measured
# v5e flagship-encoder op: gather 53.5 ms -> v2 all levels 22.7 ms.
PALLAS_DENSE_MAX_CELLS = 8192
PALLAS_V2_MAX_CELLS = 32768
PALLAS_V2_MIN_QUERIES = 4096

# which block-skipping kernel generation serves the "v2 levels":
# "v2" = (nQ, nS) grid with scalar flags, "v4" = compacted (N, nQ) grid
# with an in-kernel dynamic range walk + manual double-buffered DMA,
# x-chunk width PALLAS_V4_CW, and (when PALLAS_V4_SORT) ONE hoisted
# spatial argsort shared by every level of the call.
# "v5" = the fused all-levels patch-walk kernel (ops/msda_patch.py): ONE
# pallas_call serving every level, 8x16-cell chunks walked per q-tile's
# 2-D bounding rectangle, queries pre-sorted by a STATIC snake-bucket
# permutation (requires the encoder self-pattern Lq == S; other calls
# fall through to the v2/v4 routing below).
# Module-level so benches can flip them; read at trace time — flipping
# after a same-shape call requires ms_deform_attn.clear_cache().
# "v5" is the measured-good default (PLAN.md round-4 table); the env
# override lets a deployment re-route without a code change (bench.py
# auto-picks between the generations at bench time).
PALLAS_SKIP_IMPL = os.environ.get("PALLAS_SKIP_IMPL", "v5")
PALLAS_V4_CW = 64
PALLAS_V4_SORT = True

# Gather-path tuning (decoder shapes; tools/bench_decoder_msda_route.py on
# v5e).  COMPACT gathers each level from its OWN per-item (M*cells, D)
# table instead of one (M*S, D) all-levels table — smaller tables gather
# with better HBM locality (B=8: 5.74 vs 7.27 ms for the two fine levels;
# B=1: 0.86 vs 1.73).  SORT additionally orders queries by a static
# snake-bucket walk over their mean sampling location so neighbour queries'
# corner rows cluster — combined with per-level tables a 6x win at B=1
# (0.285 ms, ~the machine's clustered-gather roofline) but a slight loss at
# B=8 where the per-item gathers already pipeline; "auto" sorts only
# single-item calls.  Both are pure permutations — numerics are exact.
MSDA_GATHER_COMPACT = os.environ.get("MSDA_GATHER_COMPACT", "1") == "1"
MSDA_GATHER_SORT = os.environ.get("MSDA_GATHER_SORT", "auto")

# DECODER block-skipping (round 5): the v2/v4 kernels were gated on
# Lq >= PALLAS_V2_MIN_QUERIES because block-skipping needs query raster
# locality, which encoder self-queries have for free.  Decoder queries are
# scattered — but sorting them by mean sampling location (spatial_sort_perm)
# restores the locality, and the v4p kernel takes exactly such a
# caller-supplied permutation.  MEASURED NEGATIVE on v5e at decoder shapes
# (tools/bench_decoder_pieces.py, 8-level op call): B=8 49.6 ms vs 14.1 for
# the compact XLA gather, B=1 5.8 vs ~1.1 — even sorted, 640 scattered
# queries leave each q-tile walking most of the level, and the walk's DMA
# grid overhead swamps the gather it replaces.  Kept as a tested variant
# (tests/test_msda.py::test_decoder_skip_path_exact), default OFF.
MSDA_DEC_SKIP = os.environ.get("MSDA_DEC_SKIP", "0") == "1"


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("dense_cell_budget", "pallas_dense"))
def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Tuple[Tuple[int, int], ...],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   *, dense_cell_budget: int = DENSE_CELL_BUDGET,
                   pallas_dense: bool | None = None) -> jnp.ndarray:
    """Multi-scale deformable attention core (see module docstring).

    Hybrid execution, numerics identical in all three paths: levels whose
    Lq*M*H*W fits `dense_cell_budget` are computed as dense
    separable-bilinear matmuls (`_dense_level_out`); levels over budget
    with at most PALLAS_DENSE_MAX_CELLS cells use the Pallas
    generated-LHS-matmul kernel (`pallas_dense`: None = auto-enable on
    TPU, interpreter mode elsewhere); the rest are fused into ONE flat
    row-gather — the layout XLA:TPU lowers to its fastest gather path —
    with the bilinear/attention weighting in the gather consumer.
    """
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert l == len(spatial_shapes), (l, spatial_shapes)
    assert s == sum(h * w for h, w in spatial_shapes)

    if pallas_dense is None:
        pallas_dense = _on_tpu()

    # v5: encoder self-pattern (queries == tokens) -> ONE fused patch-walk
    # kernel over all levels; exact numerics for ANY query set (the static
    # sort only shapes the walk rectangles), but the locality win assumes
    # Lq == S, which is also what makes the permutation static.
    if (PALLAS_SKIP_IMPL == "v5" and pallas_dense and lq == s
            and lq >= PALLAS_V2_MIN_QUERIES and p <= 8):
        from .msda_patch import msda_patch
        out = msda_patch(value, spatial_shapes, sampling_locations,
                         attention_weights, not _on_tpu())
        return out.astype(value.dtype).reshape(n, lq, m * d)

    dense_levels = [i for i, (h, w) in enumerate(spatial_shapes)
                    if n * lq * m * h * w <= dense_cell_budget]
    v2_levels = [i for i, (h, w) in enumerate(spatial_shapes)
                 if pallas_dense and i not in dense_levels
                 and lq >= PALLAS_V2_MIN_QUERIES
                 and h * w <= PALLAS_V2_MAX_CELLS]
    v1_levels = [i for i, (h, w) in enumerate(spatial_shapes)
                 if pallas_dense and i not in dense_levels
                 and i not in v2_levels
                 and h * w <= PALLAS_DENSE_MAX_CELLS]
    dec_skip_levels = [i for i, (h, w) in enumerate(spatial_shapes)
                      if MSDA_DEC_SKIP and pallas_dense
                      and lq < PALLAS_V2_MIN_QUERIES
                      and i not in dense_levels and i not in v2_levels
                      and i not in v1_levels
                      and h * w <= PALLAS_V2_MAX_CELLS]
    gather_levels = [i for i in range(l)
                     if i not in dense_levels and i not in v2_levels
                     and i not in v1_levels and i not in dec_skip_levels]

    v4 = PALLAS_SKIP_IMPL == "v4"
    perm = None
    if v2_levels and v4 and PALLAS_V4_SORT:
        from .msda_dense import spatial_sort_perm
        h0, w0 = spatial_shapes[0]
        perm = spatial_sort_perm(sampling_locations[:, :, :, 0], h0, w0)
    dec_perm = None
    if dec_skip_levels:
        from .msda_dense import spatial_sort_perm
        g0 = dec_skip_levels[0]
        h0, w0 = spatial_shapes[g0]
        dec_perm = spatial_sort_perm(sampling_locations[:, :, :, g0], h0, w0)

    acc = jnp.zeros((n, lq, m, d), jnp.float32)
    offset = 0
    for i, (h, w) in enumerate(spatial_shapes):
        if i in dense_levels:
            acc = acc + _dense_level_out(
                value[:, offset:offset + h * w],
                sampling_locations[:, :, :, i],
                attention_weights[:, :, :, i], h, w)
        elif i in dec_skip_levels:
            from .msda_dense import dense_level_pallas_v4p
            acc = acc + dense_level_pallas_v4p(
                value[:, offset:offset + h * w],
                sampling_locations[:, :, :, i],
                attention_weights[:, :, :, i], dec_perm, h, w,
                PALLAS_V4_CW, not _on_tpu())
        elif i in v2_levels or i in v1_levels:
            from .msda_dense import (dense_level_pallas,
                                     dense_level_pallas_v2,
                                     dense_level_pallas_v4p)
            if i in v2_levels and v4 and perm is not None:
                acc = acc + dense_level_pallas_v4p(
                    value[:, offset:offset + h * w],
                    sampling_locations[:, :, :, i],
                    attention_weights[:, :, :, i], perm, h, w,
                    PALLAS_V4_CW, not _on_tpu())
            elif i in v2_levels and v4:
                from .msda_dense import dense_level_pallas_v4
                acc = acc + dense_level_pallas_v4(
                    value[:, offset:offset + h * w],
                    sampling_locations[:, :, :, i],
                    attention_weights[:, :, :, i], h, w, not _on_tpu())
            else:
                fn = (dense_level_pallas_v2 if i in v2_levels
                      else dense_level_pallas)
                acc = acc + fn(
                    value[:, offset:offset + h * w],
                    sampling_locations[:, :, :, i],
                    attention_weights[:, :, :, i], h, w, not _on_tpu())
        offset += h * w

    if gather_levels:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))

        # SORT: cluster queries by sampling location (see knob comment)
        do_sort = (MSDA_GATHER_SORT == "1"
                   or (MSDA_GATHER_SORT == "auto" and n == 1))
        if do_sort:
            h0, w0 = spatial_shapes[gather_levels[0]]
            mloc = sampling_locations[:, :, :, gather_levels[0]].mean(
                axis=(2, 3))  # (N, Lq, 2)
            nx, ny = max(1, w0 // 8), max(1, h0 // 8)
            bx = jnp.clip((mloc[..., 0] * nx).astype(jnp.int32), 0, nx - 1)
            by = jnp.clip((mloc[..., 1] * ny).astype(jnp.int32), 0, ny - 1)
            bxs = jnp.where(by % 2 == 0, bx, nx - 1 - bx)
            perm = jnp.argsort(by * nx + bxs, axis=1)  # (N, Lq)
            inv = jnp.argsort(perm, axis=1)

        if MSDA_GATHER_COMPACT:
            # per-(item, level) tables: each level gathered from its own
            # (M*cells, D) table — the smallest table the rows can live in
            kl = p * 4
            level_off = [0]
            for h, w in spatial_shapes:
                level_off.append(level_off[-1] + h * w)
            outs = []
            for i in range(n):
                acc_i = jnp.zeros((lq, m, d), jnp.float32)
                for lvl in gather_levels:
                    h, w = spatial_shapes[lvl]
                    off = level_off[lvl]
                    idx_l, w_l = _corner_indices_weights(
                        ((h, w),),
                        sampling_locations[i:i + 1, :, :, lvl:lvl + 1],
                        attention_weights[i:i + 1, :, :, lvl:lvl + 1])
                    idx_l = idx_l[0].reshape(lq, m, kl)  # head-major rows
                    w_l = w_l[0].reshape(lq, m, kl)
                    if do_sort:
                        idx_l = jnp.take(idx_l, perm[i], axis=0)
                        w_l = jnp.take(w_l, perm[i], axis=0)
                    table = value[i, off:off + h * w].transpose(
                        1, 0, 2).reshape(m * h * w, d)
                    g = jax.lax.gather(
                        table, idx_l.reshape(-1, 1), dn, slice_sizes=(1, d),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                    g = g.reshape(lq, m, kl, d)
                    acc_i = acc_i + jnp.einsum(
                        "qmk,qmkd->qmd", w_l.astype(value.dtype), g,
                        preferred_element_type=jnp.float32)
                if do_sort:
                    acc_i = jnp.take(acc_i, inv[i], axis=0)
                outs.append(acc_i)
            acc = acc + jnp.stack(outs)
            return acc.astype(value.dtype).reshape(n, lq, m * d)

        idx, weights = _corner_indices_weights(
            spatial_shapes, sampling_locations, attention_weights,
            levels=gather_levels)
        k = len(gather_levels) * p * 4
        value_nm = value.transpose(0, 2, 1, 3)  # (N, M, S, D)

        # Gather per batch item: gather throughput degrades sharply with
        # table size (HBM locality), so keep each table at (M*S, D) instead
        # of one (N*M*S, D) mega-table. N is small and static.
        outs = []
        per_item = m * s
        for i in range(n):
            table = value_nm[i].reshape(per_item, d)
            idx_i = idx[i] - i * per_item
            w_i = weights[i].reshape(lq, m, k)
            if do_sort:
                idx_i = jnp.take(idx_i, perm[i], axis=0)
                w_i = jnp.take(w_i, perm[i], axis=0)
            g = jax.lax.gather(
                table, idx_i.reshape(-1, 1), dn, slice_sizes=(1, d),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            g = g.reshape(lq, m, k, d)
            o = jnp.einsum(
                "qmk,qmkd->qmd", w_i.astype(value.dtype),
                g, preferred_element_type=jnp.float32)
            if do_sort:
                o = jnp.take(o, inv[i], axis=0)
            outs.append(o)
        acc = acc + jnp.stack(outs)
    return acc.astype(value.dtype).reshape(n, lq, m * d)


def ms_deform_attn_reference(value: jnp.ndarray,
                             spatial_shapes: Sequence[Tuple[int, int]],
                             sampling_locations: jnp.ndarray,
                             attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Naive per-point reference (readable, used only in tests)."""
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    out = jnp.zeros((n, lq, m, d), dtype=jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset:offset + h * w].reshape(n, h, w, m, d)
        for pt in range(p):
            loc = sampling_locations[:, :, :, lvl, pt]  # (N, Lq, M, 2)
            aw = attention_weights[:, :, :, lvl, pt]  # (N, Lq, M)
            x = loc[..., 0] * w - 0.5
            y = loc[..., 1] * h - 0.5
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            dx, dy = x - x0, y - y0
            acc = jnp.zeros((n, lq, m, d), jnp.float32)
            for cx, cy in ((0, 0), (1, 0), (0, 1), (1, 1)):
                ix, iy = x0 + cx, y0 + cy
                ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                ixc = jnp.clip(ix, 0, w - 1)
                iyc = jnp.clip(iy, 0, h - 1)
                wgt = (dx if cx else 1 - dx) * (dy if cy else 1 - dy) * ok
                # explicit per-element gather via vmap
                g = jax.vmap(  # over batch
                    jax.vmap(  # over query
                        jax.vmap(lambda vv, yy, xx: vv[yy, xx],
                                 in_axes=(2, 0, 0), out_axes=0),
                        in_axes=(None, 0, 0)),
                    in_axes=(0, 0, 0))(v, iyc, ixc)
                acc = acc + g * wgt[..., None]
            out = out + acc * aw[..., None]
        offset += h * w
    return out.reshape(n, lq, m * d)
