"""Deformable transformer building blocks (encoder stack + decoder layers).

Parity target: /root/reference/src/trackformer/models/deformable_transformer.py
(flatten/valid-ratios :136-157, separate per-frame encoders :160-173,
encoder ref-point grid :307-319, enc/dec layers :258-383, two-stage proposal
generation :92-122) and the MSDeformAttn module
(/root/reference/src/trackformer/models/ops/modules/ms_deform_attn.py:15-89).

TPU-first differences:
  * the iterative-box-refinement decoder loop lives in the DeformableDETR
    head (deformable_detr.py) so the bbox/class heads are naturally shared
    with refinement instead of the reference's module back-reference hack;
  * all shapes static; level spatial shapes are Python tuples baked into the
    jit; the MSDA core is `trackformer_tpu.ops.ms_deform_attn`.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.msda import ms_deform_attn
from .attention import MultiHeadAttention


def msda_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional bias init for sampling offsets: 8 compass directions,
    point p scaled by (p+1) (reference ms_deform_attn.py:35-41)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1

    def init(key, shape, dtype=jnp.float32):
        assert shape == (n_heads * n_levels * n_points * 2,), shape
        return jnp.asarray(grid.reshape(-1), dtype)
    return init


class MSDeformAttnModule(nn.Module):
    """Projection + sampling wrapper around the MSDA core op."""
    d_model: int
    n_levels: int
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, src, spatial_shapes,
                 src_padding_mask=None):
        """query (B, Lq, C); reference_points (B, Lq, L, 2|4) in [0,1];
        src (B, S, C) flattened levels; spatial_shapes static tuple;
        src_padding_mask (B, S) True=pad."""
        b, lq, _ = query.shape
        s = src.shape[1]
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(src)
        if src_padding_mask is not None:
            value = jnp.where(src_padding_mask[..., None], 0.0, value)
        value = value.reshape(b, s, m, d)

        offsets = nn.Dense(
            m * l * p * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=msda_offset_bias_init(m, l, p),
            name="sampling_offsets")(query).reshape(b, lq, m, l, p, 2)
        attn = nn.Dense(
            m * l * p, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights")(query).reshape(b, lq, m, l * p)
        attn = nn.softmax(attn, axis=-1).reshape(b, lq, m, l, p)

        # NOTE: the reference normalizes the (x, y) offsets by (H, W) —
        # ops/modules/ms_deform_attn.py:79 divides by input_spatial_shapes
        # rows directly — unlike the original Deformable-DETR repo's
        # (W, H) offset_normalizer. Its released checkpoints embody this
        # convention, so weight-conversion parity requires matching it.
        shapes_hw = jnp.asarray(list(spatial_shapes), jnp.float32)
        if reference_points.shape[-1] == 2:
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / shapes_hw[None, None, None, :, None, :])
        else:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / p * reference_points[:, :, None, :, None, 2:]
                   * 0.5)

        # value stays in the compute dtype: bf16 rows gather ~2.5x faster
        # than f32 (half the bytes/row) and the weighted sum accumulates in
        # f32 inside the op; locations/weights stay f32 for index math
        out = ms_deform_attn(value,
                             tuple(spatial_shapes),
                             loc.astype(jnp.float32),
                             attn.astype(jnp.float32)).astype(self.dtype)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class DeformableEncoderLayer(nn.Module):
    d_model: int
    n_levels: int
    n_heads: int = 8
    n_points: int = 4
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 padding_mask=None, deterministic=True):
        drop = nn.Dropout(self.dropout)
        src2 = MSDeformAttnModule(self.d_model, self.n_levels, self.n_heads,
                                  self.n_points, self.dtype,
                                  name="self_attn")(
            src + pos if pos is not None else src,
            reference_points, src, spatial_shapes, padding_mask)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            src + drop(src2, deterministic=deterministic))
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
            drop(nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype,
                                  name="linear1")(src)),
                 deterministic=deterministic))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(
            src + drop(ffn, deterministic=deterministic))


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]],
                             valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """Per-token center grid normalized by valid extent -> (B, S, L, 2).

    Reference: deformable_transformer.py:307-319.
    """
    b = valid_ratios.shape[0]
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ref_y = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        ref_x = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        ref_y = jnp.broadcast_to(ref_y, (h, w)).reshape(-1)
        ref_x = jnp.broadcast_to(ref_x, (h, w)).reshape(-1)
        ry = ref_y[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = ref_x[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], -1))  # (B, HW, 2)
    reference_points = jnp.concatenate(refs, axis=1)
    return reference_points[:, :, None] * valid_ratios[:, None]


class _EncoderScanBody(nn.Module):
    """One encoder layer in (carry, *broadcast) -> (carry, None) form for
    nn.scan. Static per-call context (spatial shapes, determinism) lives in
    module fields so it never enters the scan as a traced value."""
    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    dim_feedforward: int
    dropout: float
    dtype: Any
    spatial_shapes: Tuple[Tuple[int, int], ...]
    deterministic: bool

    @nn.compact
    def __call__(self, src, pos, reference_points, padding_mask):
        out = DeformableEncoderLayer(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.dim_feedforward, self.dropout, self.dtype, name="layer")(
                src, pos, reference_points, self.spatial_shapes,
                padding_mask, self.deterministic)
        return out, None


class DeformableEncoder(nn.Module):
    d_model: int
    n_levels: int
    num_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False
    # lax.scan over layers: one traced/compiled layer body instead of
    # `num_layers` unrolled copies (~6x smaller HLO; the remote-compiler
    # hop makes graph size the compile-time driver on this setup). Params
    # are stacked on a leading axis — see utils/checkpoint.py scan bridge.
    scan_layers: bool = False

    @nn.compact
    def __call__(self, src, spatial_shapes, valid_ratios, pos=None,
                 padding_mask=None, deterministic=True):
        reference_points = encoder_reference_points(spatial_shapes,
                                                    valid_ratios)
        if self.scan_layers:
            body = nn.scan(
                nn.remat(_EncoderScanBody) if self.remat
                else _EncoderScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast, out_axes=0,
                length=self.num_layers)(
                    self.d_model, self.n_levels, self.n_heads,
                    self.n_points, self.dim_feedforward, self.dropout,
                    self.dtype, tuple(spatial_shapes), deterministic,
                    name="layers")
            out, _ = body(src, pos, reference_points, padding_mask)
            return out
        layer_cls = DeformableEncoderLayer
        if self.remat:
            layer_cls = nn.remat(DeformableEncoderLayer,
                                 static_argnums=(4, 6))
        out = src
        for i in range(self.num_layers):
            out = layer_cls(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, self.dim_feedforward, self.dropout,
                            self.dtype, name=f"layer_{i}")(
                out, pos, reference_points, tuple(spatial_shapes),
                padding_mask, deterministic)
        return out


class DeformableDecoderLayer(nn.Module):
    d_model: int
    n_levels: int
    n_heads: int = 8
    n_points: int = 4
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # 'msda' = exact deformable sampling (reference parity); 'dense' = full
    # cross-attention over all tokens — on TPU the MXU makes this CHEAPER
    # than the gather-bound deformable path at DETR query counts
    attention: str = "msda"

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 src_padding_mask=None, tgt_key_padding_mask=None,
                 deterministic=True, src_pos=None):
        """reference_points here are already valid-ratio scaled (B, Q, L, 2|4)."""
        drop = nn.Dropout(self.dropout)
        q = k = tgt + query_pos if query_pos is not None else tgt
        t2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                self.dtype, name="self_attn")(
            q, k, tgt, tgt_key_padding_mask, deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            tgt + drop(t2, deterministic=deterministic))

        if self.attention == "dense":
            t2 = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                    self.dtype, name="cross_attn")(
                tgt + query_pos if query_pos is not None else tgt,
                src + src_pos.astype(src.dtype) if src_pos is not None
                else src,
                src, src_padding_mask, deterministic)
        else:
            t2 = MSDeformAttnModule(self.d_model, self.n_levels,
                                    self.n_heads, self.n_points, self.dtype,
                                    name="cross_attn")(
                tgt + query_pos if query_pos is not None else tgt,
                reference_points, src, spatial_shapes, src_padding_mask)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            tgt + drop(t2, deterministic=deterministic))

        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
            drop(nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype,
                                  name="linear1")(tgt)),
                 deterministic=deterministic))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(
            tgt + drop(ffn, deterministic=deterministic))


def get_valid_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) pad mask -> (B, 2) ratio of valid (w, h)."""
    _, h, w = mask.shape
    valid_h = jnp.sum(~mask[:, :, 0], axis=1).astype(jnp.float32)
    valid_w = jnp.sum(~mask[:, 0, :], axis=1).astype(jnp.float32)
    return jnp.stack([valid_w / w, valid_h / h], -1)


def proposal_pos_embed(proposals: jnp.ndarray,
                       num_pos_feats: int = 128,
                       temperature: float = 10000.0) -> jnp.ndarray:
    """Sine embedding of (unactivated) proposal boxes for two-stage
    (reference :77-90): (B, Q, 4) -> (B, Q, 4*num_pos_feats)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos = jax.nn.sigmoid(proposals) * scale
    pos = pos[..., None] / dim_t
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)
    return pos.reshape(*proposals.shape[:2], -1)


def gen_encoder_output_proposals(memory: jnp.ndarray,
                                 memory_padding_mask: jnp.ndarray,
                                 spatial_shapes: Sequence[Tuple[int, int]]):
    """Two-stage proposal grid (reference :92-122).

    Returns (output_memory, output_proposals) where invalid positions carry
    +inf proposals / zeroed memory; the caller applies enc_output layers.
    """
    b, s, c = memory.shape
    proposals = []
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        mask_l = memory_padding_mask[:, offset:offset + h * w].reshape(
            b, h, w, 1)
        valid_h = jnp.sum(~mask_l[:, :, 0, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~mask_l[:, 0, :, 0], axis=1).astype(jnp.float32)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], -1)  # (H, W, 2)
        scale = jnp.stack([valid_w, valid_h], -1).reshape(b, 1, 1, 2)
        grid = (grid[None] + 0.5) / scale
        wh = jnp.ones_like(grid) * 0.05 * (2.0 ** lvl)
        proposals.append(
            jnp.concatenate([grid, wh], -1).reshape(b, -1, 4))
        offset += h * w
    output_proposals = jnp.concatenate(proposals, axis=1)
    valid = jnp.all((output_proposals > 0.01) & (output_proposals < 0.99),
                    axis=-1, keepdims=True)
    output_proposals = jnp.log(
        output_proposals / (1.0 - output_proposals))
    inf = jnp.float32(jnp.inf)
    output_proposals = jnp.where(memory_padding_mask[..., None], inf,
                                 output_proposals)
    output_proposals = jnp.where(~valid, inf, output_proposals)

    output_memory = jnp.where(memory_padding_mask[..., None], 0.0, memory)
    output_memory = jnp.where(~valid, 0.0, output_memory)
    return output_memory, output_proposals


def decoder_reference_input(reference_points: jnp.ndarray,
                            valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """Scale decoder reference points by per-level valid ratios
    (reference :403-408): (B, Q, 2|4) -> (B, Q, L, 2|4)."""
    if reference_points.shape[-1] == 4:
        vr = jnp.concatenate([valid_ratios, valid_ratios], -1)
    else:
        vr = valid_ratios
    return reference_points[:, :, None] * vr[:, None]
