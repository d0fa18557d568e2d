"""Pallas TPU kernel for multi-scale deformable attention (experimental).

Status and findings (TPU v5e, 2026-08; see git history for the experiments):

  * The production MSDA path is `ops/msda.py`: one fused XLA row-gather.
    Measured ~360M sampled rows/s — close to the random-access roofline of
    the memory system (each 144B row costs ~a 512B sector).
  * Mosaic exposes no usable large-scale dynamic gather today:
    `tpu.dynamic_gather` (via take_along_axis) compiles only within a single
    (8, 128) tile — larger shapes crash the Mosaic compiler — and per-row
    DMA issue overhead exceeds XLA's gather throughput.
  * This kernel therefore processes samples with per-sample dynamic row
    slices from a VMEM-resident value block: correct, single-pass, fused
    weighting — but serialized on the sublane port (~10-20x slower than the
    XLA gather at encoder scale). It is kept as (a) a correctness oracle
    that runs fully inside one kernel, and (b) the scaffold to revisit when
    Mosaic grows cross-tile gather support.

Use `ms_deform_attn_pallas(..., interpret=True)` on CPU for testing.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import _corner_indices_weights


def _msda_kernel(idx_ref, w_ref, value_ref, out_ref):
    """Per-(batch*head) program: out[q] = sum_k w[q,k] * value[idx[q,k]].

    Block shapes: idx/w (1, Lq, K); value (1, S, D); out (1, Lq, D).
    """
    _, lq, k = idx_ref.shape
    d = value_ref.shape[2]

    def q_body(q, _):
        idx_row = idx_ref[0, pl.ds(q, 1), :]  # (1, K)
        w_row = w_ref[0, pl.ds(q, 1), :]  # (1, K)
        acc = jnp.zeros((1, d), jnp.float32)
        # static unroll over samples: lane indices must be static on TPU
        for j in range(k):
            row = value_ref[0, pl.ds(idx_row[0, j], 1), :]  # (1, D)
            acc = acc + w_row[0, j] * row
        out_ref[0, pl.ds(q, 1), :] = acc
        return ()

    jax.lax.fori_loop(0, lq, q_body, ())


@functools.partial(jax.jit, static_argnums=(1, 4))
def ms_deform_attn_pallas(value: jnp.ndarray,
                          spatial_shapes: Tuple[Tuple[int, int], ...],
                          sampling_locations: jnp.ndarray,
                          attention_weights: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Same contract as ops.msda.ms_deform_attn (see there)."""
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    k = l * p * 4

    idx, weights = _corner_indices_weights(
        spatial_shapes, sampling_locations, attention_weights)
    # strip the (n, m) flat-table offset: the kernel gets per-(n, m) blocks
    nm_off = (jnp.arange(n)[:, None] * m + jnp.arange(m)[None, :]) * s
    idx = idx - nm_off[:, None, :, None, None, None]
    idx = idx.transpose(0, 2, 1, 3, 4, 5).reshape(n * m, lq, k)
    weights = weights.transpose(0, 2, 1, 3, 4, 5).reshape(
        n * m, lq, k).astype(jnp.float32)
    value_nm = value.transpose(0, 2, 1, 3).reshape(n * m, s, d).astype(
        jnp.float32)
    # Mosaic requires lane-aligned (multiple-of-128) last dims for dynamic
    # sublane slicing; pad the head dim up
    d_pad = ((d + 127) // 128) * 128
    if d_pad != d:
        value_nm = jnp.pad(value_nm, ((0, 0), (0, 0), (0, d_pad - d)))

    out = pl.pallas_call(
        _msda_kernel,
        grid=(n * m,),
        in_specs=[
            pl.BlockSpec((1, lq, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq, d_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * m, lq, d_pad), jnp.float32),
        interpret=interpret,
    )(idx, weights, value_nm)

    out = out[..., :d]
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(
        n, lq, m * d).astype(value.dtype)
