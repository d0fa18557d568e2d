"""Positional encodings: 2D sine, 3D (frame-axis) sine, learned.

Parity targets: /root/reference/src/trackformer/models/position_encoding.py
(Sine :84-120, Sine3D :12-81, Learned :123-148, builder :151-169). Values are
computed from the pad mask via cumulative sums so padded regions do not shift
the phase — identical numerics, NHWC output layout.
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def sine_position_encoding(mask: jnp.ndarray, num_pos_feats: int,
                           temperature: float = 10000.0,
                           scale: float = 2 * math.pi,
                           dtype: Any = jnp.float32) -> jnp.ndarray:
    """2D sine embedding from a (B, H, W) pad mask -> (B, H, W, 2*num_pos_feats).

    Matches PositionEmbeddingSine(normalize=True): y/x indices are cumsums of
    not-mask, shifted by -0.5 and normalized by the valid extent.
    """
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def sine_position_encoding_3d(mask: jnp.ndarray, num_pos_feats: int,
                              num_frames: int = 2,
                              temperature: float = 10000.0,
                              scale: float = 2 * math.pi,
                              dtype: Any = jnp.float32) -> jnp.ndarray:
    """Frame-aware sine embedding -> (B, F, H, W, 3*num_pos_feats).

    The frame axis z gets its own sine stack (Sine3D, reference :31-81; note
    the reference normalizes without the -0.5 shift in the 3D variant).
    """
    b, h, w = mask.shape
    not_mask = (~mask).astype(jnp.float32)[:, None].repeat(num_frames, axis=1)
    z_embed = jnp.cumsum(not_mask, axis=1)
    y_embed = jnp.cumsum(not_mask, axis=2)
    x_embed = jnp.cumsum(not_mask, axis=3)
    eps = 1e-6
    z_embed = z_embed / (z_embed[:, -1:, :, :] + eps) * scale
    y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    def enc(e):
        p = e[..., None] / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         axis=-1).reshape(*p.shape[:-1], -1)

    pos = jnp.concatenate([enc(z_embed), enc(y_embed), enc(x_embed)], axis=-1)
    return pos.astype(dtype)


class LearnedPositionEncoding(nn.Module):
    """Learned row/col embeddings (reference :123-148), 50x50 grid."""
    num_pos_feats: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        b, h, w = mask.shape
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (50, self.num_pos_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (50, self.num_pos_feats))
        x_emb = col[:w][None, :, :]  # (1, W, C)
        y_emb = row[:h][:, None, :]  # (H, 1, C)
        pos = jnp.concatenate([
            jnp.broadcast_to(x_emb, (h, w, self.num_pos_feats)),
            jnp.broadcast_to(y_emb, (h, w, self.num_pos_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (b, h, w, 2 * self.num_pos_feats)
                                ).astype(self.dtype)


def build_position_encoding_fn(args):
    """Returns pos(mask) -> (B, H, W, C) or (B, F, H, W, C) for multi-frame.

    Builder parity: hidden_dim//3 per axis for multi-frame 3D encoding,
    hidden_dim//2 otherwise (reference :151-169).
    """
    multi_frame = args.multi_frame_attention and args.multi_frame_encoding
    if args.position_embedding in ("v2", "sine"):
        if multi_frame:
            n = args.hidden_dim // 3
            return lambda mask: sine_position_encoding_3d(mask, n)
        n = args.hidden_dim // 2
        return lambda mask: sine_position_encoding(mask, n)
    raise ValueError(
        f"unsupported position_embedding {args.position_embedding!r} "
        "(learned embeddings are a module: LearnedPositionEncoding)")
