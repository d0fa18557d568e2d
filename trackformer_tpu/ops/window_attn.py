"""Fused windowed-encoder layer as ONE Pallas TPU kernel (VERDICT r3 #3).

The windowed encoder layer (models/windowed_encoder.py) is measured ~5x over
its FLOP bound: at (NW~366, 64, C=288) each of its ~20 XLA ops per layer is
individually latency/HBM-bound, and the per-(window, head) attention matmuls
have contraction dim d_head=36 — a ~7% MXU shape. This kernel runs the WHOLE
layer body (q/k/v projection, windowed multi-head attention with key-padding,
out projection, residual + LayerNorm, FFN, residual + LayerNorm) in one
pallas_call over tiles of GW windows, with two tricks:

  * head-masked full-width matmuls: per head h, scores are computed as
    dot(q * colmask_h, k^T) contracting over ALL C=288 columns (the masked
    columns contribute exact zeros), so every MXU pass has a >=288-wide
    contraction instead of 36; same for attn @ (v * colmask_h), whose
    disjoint output columns reassemble the head concat.
  * GW windows stacked per tile: rows fill the 128-row MXU; cross-window
    score blocks are masked to -inf (softmax exactly reproduces the
    per-window batch semantics of the module path).

Numerics match models/attention.MultiHeadAttention + the windowed layer's
residual/LayerNorm/FFN chain op-for-op (f32 matmul accumulation cast to the
compute dtype, f32 softmax/LayerNorm stats, eps 1e-6) — asserted by
tests/test_window_attn.py. Deterministic path only (dropout must be 0 or
deterministic=True; the module path remains for training with dropout).

MEASURED NEGATIVE (TPU v5e, flagship encoder scale, 6 layers): fused
6.74 ms/pass at the best tile size (GW sweep 2/4/8 -> 7.29/6.74/8.74)
vs 5.62 ms for the module path — which round-4 re-measurement shows
already dropped from the 10.2 ms that motivated this kernel (the r3
windowed-layout residual/FFN change + XLA fusion). The head-masked
full-width matmuls do 8x the MACs to win MXU shape, and at C=288 that
overhead exceeds the saved op-dispatch latency. Kept as a tested variant;
bench.py A/Bs it each bench run and routes the winner (module path today).

Reference counterpart: this replaces the hot encoder loop the reference runs
as CUDA MSDA (/root/reference/src/trackformer/models/deformable_transformer.py:300-327)
in the TPU-fast (windowed) mode.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = jnp.finfo(jnp.float32).min

# Windows stacked per kernel tile (T = GW * win^2 rows). 4 fills two
# 128-row MXU passes per matmul at win=8; env-tunable for on-chip sweeps
# (tools/bench_window_attn.py).
GW = int(os.environ.get("WINDOW_ATTN_GW", "4"))


def _kernel(x_ref, p_ref, kp_ref, wqk_ref, bqk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, g1_ref, b1n_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, g2_ref, b2n_ref, o_ref, *, n_heads, d_model, ws,
            dtype):
    f32 = jnp.float32
    t = x_ref.shape[0]
    dh = d_model // n_heads

    x = x_ref[...]
    q_in = x + p_ref[...]

    # q/k projection: one concatenated matmul (identical per-column math)
    qk = jnp.dot(q_in, wqk_ref[...],
                 preferred_element_type=f32).astype(dtype) + bqk_ref[0]
    q = qk[:, :d_model]
    k = qk[:, d_model:]
    v = jnp.dot(x, wv_ref[...],
                preferred_element_type=f32).astype(dtype) + bv_ref[0]

    # masks: key padding (1 = exclude) OR cross-window block
    kp = kp_ref[0, 0, :] > 0.5                            # (T,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0) // ws
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) // ws
    excl = (rows != cols) | kp[None, :]

    cid = jax.lax.broadcasted_iota(jnp.int32, (1, d_model), 1) // dh
    scale = 1.0 / jnp.sqrt(f32(dh))

    o_acc = jnp.zeros((t, d_model), f32)
    for h in range(n_heads):
        hm = (cid == h).astype(dtype)                     # (1, C)
        logits = jax.lax.dot_general(
            q * hm, k, (((1,), (1,)), ((), ())),
            preferred_element_type=f32) * scale           # (T, T)
        logits = jnp.where(excl, NEG, logits)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        attn = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dtype)
        o_acc = o_acc + jnp.dot(attn, v * hm,
                                preferred_element_type=f32)

    out = jnp.dot(o_acc.astype(dtype), wo_ref[...],
                  preferred_element_type=f32).astype(dtype) + bo_ref[0]

    def layer_norm(y, g_ref, b_ref):
        y32 = y.astype(f32)
        mean = jnp.mean(y32, axis=-1, keepdims=True)
        var = jnp.mean(y32 * y32, axis=-1, keepdims=True) - mean * mean
        z = (y32 - mean) * jax.lax.rsqrt(var + 1e-6)
        return (z * g_ref[0].astype(f32)
                + b_ref[0].astype(f32)).astype(dtype)

    x1 = layer_norm(x + out, g1_ref, b1n_ref)
    h1 = jnp.dot(x1, w1_ref[...],
                 preferred_element_type=f32).astype(dtype) + b1_ref[0]
    h1 = jnp.maximum(h1, 0.0)
    h2 = jnp.dot(h1, w2_ref[...],
                 preferred_element_type=f32).astype(dtype) + b2_ref[0]
    o_ref[...] = layer_norm(x1 + h2, g2_ref, b2n_ref)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "gw", "interpret"))
def _fused_window_layer(xw: jnp.ndarray, pw: jnp.ndarray, kp: jnp.ndarray,
                        weights: dict, n_heads: int, gw: int,
                        interpret: bool = False) -> jnp.ndarray:
    """One windowed encoder layer, fused.

    xw/pw: (NW, WS, C) tokens / positional embeds in the windowed layout;
    kp: (NW, WS) bool key-padding (True = exclude);
    weights: dict with q/k/v/out kernels+biases (f32, (C, C)/(C,)), norm1/2
    scale+bias, linear1/2 kernels+biases — the caller casts nothing; this
    function applies the same dtype discipline as the module path.
    Returns (NW, WS, C) in xw.dtype.
    """
    nw, ws, c = xw.shape
    dtype = xw.dtype
    ff = weights["linear1_kernel"].shape[1]
    t = gw * ws
    nwp = -(-nw // gw) * gw
    if nwp != nw:
        pad = ((0, nwp - nw), (0, 0), (0, 0))
        xw = jnp.pad(xw, pad)
        pw = jnp.pad(pw, pad)
        kp = jnp.pad(kp, ((0, nwp - nw), (0, 0)), constant_values=True)
    n_tiles = nwp // gw

    x2 = xw.reshape(n_tiles * t, c)
    p2 = pw.astype(dtype).reshape(n_tiles * t, c)
    # (n_tiles, 1, t) with block (1, 1, t): Mosaic requires the last two
    # block dims be (8, 128)-divisible OR equal to the array dims — (1, t)
    # satisfies the equality rule for any t, where a (n_tiles, t) layout
    # with block (1, t) does not (real-chip lowering error; interpret mode
    # does not enforce it)
    kpf = kp.astype(jnp.float32).reshape(n_tiles, 1, t)

    cast = lambda w: w.astype(dtype)  # noqa: E731
    row = lambda b: b.astype(dtype).reshape(1, -1)  # noqa: E731
    wqk = jnp.concatenate([cast(weights["q_kernel"]),
                           cast(weights["k_kernel"])], axis=1)
    bqk = jnp.concatenate([row(weights["q_bias"]),
                           row(weights["k_bias"])], axis=1)
    operands = (
        x2, p2, kpf, wqk, bqk,
        cast(weights["v_kernel"]), row(weights["v_bias"]),
        cast(weights["out_kernel"]), row(weights["out_bias"]),
        row(weights["norm1_scale"]), row(weights["norm1_bias"]),
        cast(weights["linear1_kernel"]), row(weights["linear1_bias"]),
        cast(weights["linear2_kernel"]), row(weights["linear2_bias"]),
        row(weights["norm2_scale"]), row(weights["norm2_bias"]),
    )

    def tile_spec(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0))

    def full_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim)

    in_specs = [tile_spec((t, c)), tile_spec((t, c)),
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))]
    in_specs += [full_spec(a) for a in operands[3:]]

    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, d_model=c, ws=ws,
                          dtype=dtype),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tile_spec((t, c)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * t, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nwp * ws * c * (2 * c + c + c + 2 * ff)
            + 2 * nwp * ws * t * c * 2 * n_heads,
            bytes_accessed=2 * x2.size * x2.dtype.itemsize,
            transcendentals=nwp * ws * t),
        interpret=interpret,
    )(*operands)
    return out.reshape(nwp, ws, c)[:nw]


def fused_window_layer(xw, pw, kp, weights, n_heads, gw=None,
                       interpret=False):
    """See `_fused_window_layer`; gw defaults to the module-level GW knob
    (read at call time so benches can sweep it)."""
    return _fused_window_layer(xw, pw, kp, weights, n_heads,
                               gw=GW if gw is None else gw,
                               interpret=interpret)
