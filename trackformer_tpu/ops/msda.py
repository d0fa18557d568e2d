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


# dense path for a level when Lq*M*cells is below this budget (measured on
# v5e: the decoder's coarse levels win big, the finest level and every
# encoder level — where Lq is the full token count — stay on the gather)
DENSE_CELL_BUDGET = 32_000_000

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
                    if lq * m * h * w <= dense_cell_budget]
    v2_levels = [i for i, (h, w) in enumerate(spatial_shapes)
                 if pallas_dense and i not in dense_levels
                 and lq >= PALLAS_V2_MIN_QUERIES
                 and h * w <= PALLAS_V2_MAX_CELLS]
    v1_levels = [i for i, (h, w) in enumerate(spatial_shapes)
                 if pallas_dense and i not in dense_levels
                 and i not in v2_levels
                 and h * w <= PALLAS_DENSE_MAX_CELLS]
    gather_levels = [i for i in range(l)
                     if i not in dense_levels and i not in v2_levels
                     and i not in v1_levels]

    v4 = PALLAS_SKIP_IMPL == "v4"
    perm = None
    if v2_levels and v4 and PALLAS_V4_SORT:
        from .msda_dense import spatial_sort_perm
        h0, w0 = spatial_shapes[0]
        perm = spatial_sort_perm(sampling_locations[:, :, :, 0], h0, w0)

    acc = jnp.zeros((n, lq, m, d), jnp.float32)
    offset = 0
    for i, (h, w) in enumerate(spatial_shapes):
        if i in dense_levels:
            acc = acc + _dense_level_out(
                value[:, offset:offset + h * w],
                sampling_locations[:, :, :, i],
                attention_weights[:, :, :, i], h, w)
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
        idx, weights = _corner_indices_weights(
            spatial_shapes, sampling_locations, attention_weights,
            levels=gather_levels)
        k = len(gather_levels) * p * 4
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        value_nm = value.transpose(0, 2, 1, 3)  # (N, M, S, D)

        # Gather per batch item: gather throughput degrades sharply with
        # table size (HBM locality), so keep each table at (M*S, D) instead
        # of one (N*M*S, D) mega-table. N is small and static.
        outs = []
        per_item = m * s
        for i in range(n):
            table = value_nm[i].reshape(per_item, d)
            idx_i = idx[i].reshape(-1, 1) - i * per_item
            g = jax.lax.gather(
                table, idx_i, dn, slice_sizes=(1, d),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            g = g.reshape(lq, m, k, d)
            outs.append(jnp.einsum(
                "qmk,qmkd->qmd",
                weights[i].reshape(lq, m, k).astype(value.dtype),
                g, preferred_element_type=jnp.float32))
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
