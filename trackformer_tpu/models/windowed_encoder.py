"""TPU-fast encoder: shifted-window dense self-attention per feature level.

Motivation (measured on TPU v5e, see bench notes): exact multi-scale
deformable attention is gather-bound — XLA's gather tops out near the random
-access roofline (~30 ms per encoder layer pass at MOT17 scale), which no
amount of kernel work meaningfully beats on this hardware. The TPU-native
answer for the ENCODER (where queries == all tokens) is windowed dense
attention on the MXU: 8x8 token windows, alternating half-window shifts for
cross-window flow (Swin-style), plus a top-down cross-level fusion so levels
still exchange information (MSDA's L-axis sampling). ~60x less encoder time
at equal token counts.

Opt-in via `tpu.encoder_attention: windowed` (default remains `msda` for
semantic parity with the reference). The decoder keeps exact MSDA — its
query count is tiny, so the gather cost is negligible there.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiHeadAttention


def _pad_hw(x: jnp.ndarray, win: int) -> Tuple[jnp.ndarray, int, int]:
    b, h, w, c = x.shape
    ph = (-h) % win
    pw = (-w) % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, h + ph, w + pw


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nWin, win*win, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_merge(x: jnp.ndarray, b: int, h: int, w: int, win: int):
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class WindowedEncoderLayer(nn.Module):
    d_model: int
    nheads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    window: int = 8
    shift: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x/pos: (B, H, W, C); mask: (B, H, W) True = pad."""
        b, h0, w0, c = x.shape
        win = self.window
        sh = win // 2 if self.shift else 0

        def to_windows(t, fill=0.0):
            if sh:
                t = jnp.roll(t, (-sh, -sh), axis=(1, 2))
            t, hp, wp = _pad_hw(t, win)
            return window_partition(t, win), hp, wp

        xw, hp, wp = to_windows(x)
        posw, _, _ = to_windows(pos)
        maskw = mask[..., None].astype(jnp.float32)
        if sh:
            maskw = jnp.roll(maskw, (-sh, -sh), axis=(1, 2))
        maskw = jnp.pad(maskw, ((0, 0), (0, hp - h0), (0, wp - w0),
                                (0, 0)), constant_values=1.0)
        maskw = window_partition(maskw, win)[..., 0] > 0.5  # (BW, win*win)
        # fully-padded windows would make softmax degenerate; un-mask them
        all_pad = jnp.all(maskw, axis=1, keepdims=True)
        key_pad = maskw & ~all_pad

        q = k = xw + posw
        attn_out = MultiHeadAttention(self.d_model, self.nheads, self.dropout,
                                      self.dtype, name="self_attn")(
            q, k, xw, key_pad, deterministic)
        attn_out = window_merge(attn_out, b, hp, wp, win)[:, :h0, :w0]
        if sh:
            attn_out = jnp.roll(attn_out, (sh, sh), axis=(1, 2))

        drop = nn.Dropout(self.dropout)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            x + drop(attn_out, deterministic=deterministic))
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
            drop(nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype,
                                  name="linear1")(x)),
                 deterministic=deterministic))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(
            x + drop(ffn, deterministic=deterministic))


class CrossLevelFusion(nn.Module):
    """Top-down + bottom-up level mixing (stands in for MSDA's cross-level
    sampling): each level receives resized, 1x1-projected neighbors."""
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray]) -> List[jnp.ndarray]:
        out = []
        for i, x in enumerate(levels):
            acc = x
            if i + 1 < len(levels):
                up = jax.image.resize(levels[i + 1], x.shape, "nearest")
                acc = acc + nn.Dense(self.d_model, dtype=self.dtype,
                                     name=f"up_{i}")(up)
            if i > 0:
                down = jax.image.resize(levels[i - 1], x.shape, "nearest")
                acc = acc + nn.Dense(self.d_model, dtype=self.dtype,
                                     name=f"down_{i}")(down)
            out.append(nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(acc))
        return out


class WindowedEncoder(nn.Module):
    """Drop-in encoder over per-level maps; returns flattened memory in the
    same token order as the deformable encoder."""
    d_model: int
    num_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    window: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, srcs: Sequence[jnp.ndarray],
                 masks: Sequence[jnp.ndarray],
                 poses: Sequence[jnp.ndarray],
                 deterministic: bool = True) -> jnp.ndarray:
        levels = list(srcs)
        for li in range(self.num_layers):
            new_levels = []
            for lv, (x, m, p) in enumerate(zip(levels, masks, poses)):
                x = WindowedEncoderLayer(
                    self.d_model, self.nheads, self.dim_feedforward,
                    self.dropout, self.window, shift=bool(li % 2),
                    dtype=self.dtype, name=f"layer_{li}_lvl_{lv}")(
                        x, p.astype(x.dtype), m, deterministic)
                new_levels.append(x)
            levels = CrossLevelFusion(self.d_model, dtype=self.dtype,
                                      name=f"fuse_{li}")(new_levels)
        b = levels[0].shape[0]
        return jnp.concatenate(
            [x.reshape(b, -1, self.d_model) for x in levels], axis=1)
