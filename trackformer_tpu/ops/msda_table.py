"""Corner-packed table variants of the exact MSDA gather.

The production op (ops/msda.py) fetches the 4 bilinear corners of every
sample point as 4 independent single-row gathers from a (M*S, D) table.
With D = hidden/heads = 36, each gathered row fills only 36 of 128 vector
lanes and the gather row count is 4x the sample count.

These variants pre-pack corners into wider rows so ONE gather fetches
several corners (semantics identical to the reference CUDA kernel,
/root/reference/src/trackformer/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:166-237):

  pair: per-level table with rows (2D) = [cell(y,x), cell(y,x+1)]
        (x-padded shifted concat) -> 2 gathers per point (y0/y1 rows).
  quad: per-level table with rows (4D) = the full 2x2 corner neighborhood
        (zero-padded on all sides)  -> 1 gather per point.

Build cost is a few contiguous shifted copies of the value tensor per call
(HBM-bandwidth cheap); tables stay well inside the fast-gather size regime
measured on v5e. Out-of-bounds corners are exact: padding supplies zero
rows for the one-past-the-edge cells and the per-corner validity masks
(computed from the TRUE un-clamped corner coordinates) zero the weights of
anything farther out, exactly like grid_sample's zero padding mode.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))


def _corner_terms(loc_l, h, w):
    """floor cell, fractional weights and per-corner validity for one level.

    loc_l (..., 2) in [0, 1] -> (x0i, y0i int32; dx, dy f32;
    valid (..., 4) bool in corner order (0,0),(1,0),(0,1),(1,1) = (cx,cy)).
    """
    x = loc_l[..., 0].astype(jnp.float32) * w - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    valids = []
    for cx, cy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        ix = x0i + cx
        iy = y0i + cy
        valids.append((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h))
    return x0i, y0i, dx, dy, jnp.stack(valids, axis=-1)


def _gather_rows(table, idx, width):
    """idx (...,) int32 rows from table (rows, width) -> (..., width)."""
    g = jax.lax.gather(
        table, idx.reshape(-1, 1), _DN, slice_sizes=(1, width),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return g.reshape(idx.shape + (width,))


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn_quad(value: jnp.ndarray,
                        spatial_shapes: Tuple[Tuple[int, int], ...],
                        sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Exact MSDA, one (4D)-row gather per sample point.

    Same contract as ops.msda.ms_deform_attn.
    """
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert s == sum(h * w for h, w in spatial_shapes)

    acc = jnp.zeros((n, lq, m, d), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset:offset + h * w].reshape(n, h, w, m, d)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        # rows indexed by (y0+1, x0+1) in [0,h]x[0,w]; row = 2x2 corners
        quad = jnp.concatenate(
            [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
            axis=-1)  # (n, h+1, w+1, m, 4d)
        rows_l = (h + 1) * (w + 1)
        quad = quad.reshape(n, rows_l, m, 4 * d).transpose(0, 2, 1, 3)

        loc = sampling_locations[:, :, :, lvl]  # (n, lq, m, p, 2)
        attn = attention_weights[:, :, :, lvl]  # (n, lq, m, p)
        x0i, y0i, dx, dy, valid = _corner_terms(loc, h, w)
        cell = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
                + (jnp.clip(x0i, -1, w - 1) + 1))
        w4 = jnp.stack([(1 - dx) * (1 - dy), dx * (1 - dy),
                        (1 - dx) * dy, dx * dy], axis=-1)
        w4 = w4 * valid * attn[..., None].astype(jnp.float32)
        w4 = w4.astype(value.dtype)

        for i in range(n):
            table = quad[i].reshape(m * rows_l, 4 * d)
            idx_i = cell[i] + (jnp.arange(m, dtype=jnp.int32)
                               * rows_l)[None, :, None]
            g = _gather_rows(table, idx_i, 4 * d)  # (lq, m, p, 4d)
            g = g.reshape(lq, m, p, 4, d)
            out_i = jnp.einsum("qmpc,qmpcd->qmd", w4[i], g,
                               preferred_element_type=jnp.float32)
            acc = acc.at[i].add(out_i)
        offset += h * w
    return acc.astype(value.dtype).reshape(n, lq, m * d)


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn_perhead(value: jnp.ndarray,
                           spatial_shapes: Tuple[Tuple[int, int], ...],
                           sampling_locations: jnp.ndarray,
                           attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Exact MSDA, one gather per (batch, level, head) from a tiny
    (H_l*W_l, D) single-head table.

    Rationale (measured on v5e): the gather engine is byte-rate-limited on
    random access; throughput recovers when the table is small and the
    index stream is nearly sorted. Per-head level tables are ~1.2 MB at
    encoder scale and the encoder's query order is row-major, so each
    gather's indices walk the table almost monotonically.
    """
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert s == sum(h * w for h, w in spatial_shapes)

    acc = jnp.zeros((n, lq, m, d), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = value[:, offset:offset + h * w]  # (n, hw, m, d)
        loc = sampling_locations[:, :, :, lvl]
        attn = attention_weights[:, :, :, lvl]
        x0i, y0i, dx, dy, valid = _corner_terms(loc, h, w)
        idx_c, w_c = [], []
        for k, (cx, cy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
            ix = jnp.clip(x0i + cx, 0, w - 1)
            iy = jnp.clip(y0i + cy, 0, h - 1)
            idx_c.append(iy * w + ix)
            wx = dx if cx else (1.0 - dx)
            wy = dy if cy else (1.0 - dy)
            w_c.append(wx * wy * valid[..., k])
        idx4 = jnp.stack(idx_c, axis=-1)  # (n, lq, m, p, 4)
        w4 = (jnp.stack(w_c, axis=-1)
              * attn[..., None].astype(jnp.float32)).astype(value.dtype)
        for i in range(n):
            outs_m = []
            for mi in range(m):
                table = v_l[i, :, mi]  # (hw, d)
                g = _gather_rows(table, idx4[i, :, mi].reshape(-1), d)
                g = g.reshape(lq, p * 4, d)
                outs_m.append(jnp.einsum(
                    "qk,qkd->qd", w4[i, :, mi].reshape(lq, p * 4), g,
                    preferred_element_type=jnp.float32))
            acc = acc.at[i].add(jnp.stack(outs_m, axis=1))
        offset += h * w
    return acc.astype(value.dtype).reshape(n, lq, m * d)


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn_cellmajor(value: jnp.ndarray,
                             spatial_shapes: Tuple[Tuple[int, int], ...],
                             sampling_locations: jnp.ndarray,
                             attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Exact MSDA, one flat gather with CELL-major table layout
    (row = cell * M + head instead of head * S + cell): one query's 8 head
    samples at similar spatial positions land within a few rows of each
    other, so consecutive gather indices share HBM sectors.
    """
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert s == sum(h * w for h, w in spatial_shapes)

    idx_levels, w_levels = [], []
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]
        attn = attention_weights[:, :, :, lvl]
        x0i, y0i, dx, dy, valid = _corner_terms(loc, h, w)
        idx_c, w_c = [], []
        for k, (cx, cy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
            ix = jnp.clip(x0i + cx, 0, w - 1)
            iy = jnp.clip(y0i + cy, 0, h - 1)
            idx_c.append(offset + iy * w + ix)
            wx = dx if cx else (1.0 - dx)
            wy = dy if cy else (1.0 - dy)
            w_c.append(wx * wy * valid[..., k])
        idx_levels.append(jnp.stack(idx_c, axis=-1))
        w_levels.append(jnp.stack(w_c, axis=-1)
                        * attn[..., None].astype(jnp.float32))
        offset += h * w
    idx = jnp.stack(idx_levels, axis=3)  # (n, lq, m, l, p, 4) cell index
    weights = jnp.stack(w_levels, axis=3).astype(value.dtype)
    # cell-major row: cell * M + head
    head_ids = jnp.arange(m, dtype=jnp.int32)[None, None, :, None, None,
                                              None]
    idx = idx * m + head_ids

    k = l * p * 4
    outs = []
    for i in range(n):
        table = value[i].reshape(s * m, d)
        g = _gather_rows(table, idx[i].reshape(-1), d)
        g = g.reshape(lq, m, k, d)
        outs.append(jnp.einsum(
            "qmk,qmkd->qmd", weights[i].reshape(lq, m, k), g,
            preferred_element_type=jnp.float32))
    acc = jnp.stack(outs)
    return acc.astype(value.dtype).reshape(n, lq, m * d)


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn_pair(value: jnp.ndarray,
                        spatial_shapes: Tuple[Tuple[int, int], ...],
                        sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Exact MSDA, two (2D)-row gathers per sample point (y0 and y1 rows).

    Same contract as ops.msda.ms_deform_attn.
    """
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert s == sum(h * w for h, w in spatial_shapes)

    acc = jnp.zeros((n, lq, m, d), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset:offset + h * w].reshape(n, h, w, m, d)
        vpx = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
        # rows indexed by (y, x0+1), y in [0,h), x0+1 in [0,w]
        pair = jnp.concatenate([vpx[:, :, :-1], vpx[:, :, 1:]], axis=-1)
        rows_l = h * (w + 1)
        pair = pair.reshape(n, rows_l, m, 2 * d).transpose(0, 2, 1, 3)

        loc = sampling_locations[:, :, :, lvl]
        attn = attention_weights[:, :, :, lvl]
        x0i, y0i, dx, dy, valid = _corner_terms(loc, h, w)
        xcol = jnp.clip(x0i, -1, w - 1) + 1
        wy = jnp.stack([1 - dy, dy], axis=-1)  # (..., 2) for cy in (0, 1)
        wx = jnp.stack([1 - dx, dx], axis=-1)
        # valid stack order was (0,0),(1,0),(0,1),(1,1) = (cx,cy) pairs,
        # i.e. flat index 2*cy + cx -> reshape to (..., cy, cx)
        vmask = valid.reshape(valid.shape[:-1] + (2, 2))
        w_cycx = (wy[..., :, None] * wx[..., None, :]) * vmask
        w_cycx = (w_cycx * attn[..., None, None].astype(jnp.float32)
                  ).astype(value.dtype)

        for i in range(n):
            table = pair[i].reshape(m * rows_l, 2 * d)
            head_off = (jnp.arange(m, dtype=jnp.int32) * rows_l)[None, :,
                                                                 None]
            out_i = jnp.zeros((lq, m, d), jnp.float32)
            for cy in range(2):
                yrow = jnp.clip(y0i[i] + cy, 0, h - 1)
                idx_i = yrow * (w + 1) + xcol[i] + head_off
                g = _gather_rows(table, idx_i, 2 * d).reshape(lq, m, p, 2, d)
                out_i = out_i + jnp.einsum(
                    "qmpc,qmpcd->qmd", w_cycx[i, :, :, :, cy], g,
                    preferred_element_type=jnp.float32)
            acc = acc.at[i].add(out_i)
        offset += h * w
    return acc.astype(value.dtype).reshape(n, lq, m * d)
