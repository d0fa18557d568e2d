"""Instance/panoptic segmentation heads.

Parity target: /root/reference/src/trackformer/models/detr_segmentation.py —
`MHAttentionMap` (:181-216, per-query spatial attention over encoder memory),
`MaskHeadSmallConv` (:105-178, FPN-style conv head over per-query attention
maps), the Segm model variants (:29-98) and PostProcessSegm (:219-253).

NHWC + fixed shapes: masks come out at stride-4 resolution for all Q query
slots; consumers mask with `query_valid` and do per-image crop/rescale on the
host (the only genuinely ragged step).
"""
from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..structures import FrameBatch, Targets
from .backbone import downsample_mask
from .deformable_detr import DeformableDETR
from .detr import DETR


class MHAttentionMap(nn.Module):
    """2D attention map (softmax over pixels, no value product)."""
    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, mask: Optional[jnp.ndarray] = None):
        """q (B, Q, C); k (B, H, W, C); mask (B, H, W) True=pad
        -> (B, Q, heads, H, W) softmax over (H, W)."""
        b, nq, _ = q.shape
        _, h, w, _ = k.shape
        heads, dh = self.num_heads, self.hidden_dim // self.num_heads
        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_linear")(q)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_linear")(k)
        qh = q.reshape(b, nq, heads, dh) * (dh ** -0.5)
        kh = k.reshape(b, h, w, heads, dh)
        logits = jnp.einsum("bqnc,bhwnc->bqnhw", qh, kh,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask[:, None, None], -jnp.inf, logits)
        flat = logits.reshape(b, nq, heads, h * w)
        attn = jax.nn.softmax(flat, axis=-1).reshape(b, nq, heads, h, w)
        return attn.astype(self.dtype)


class MaskHeadSmallConv(nn.Module):
    """FPN-style conv head; operates on (B*Q, H, W, C) batches."""
    dim: int  # hidden + nheads
    context_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fpns: List[jnp.ndarray]):
        inter = [self.dim, self.context_dim // 2, self.context_dim // 4,
                 self.context_dim // 8, self.context_dim // 16]
        conv = lambda c, n: nn.Conv(  # noqa: E731
            c, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=n)
        gn = lambda g, n: nn.GroupNorm(num_groups=g, dtype=self.dtype, name=n)  # noqa: E731

        x = nn.relu(gn(8, "gn1")(conv(inter[0], "lay1")(x)))
        x = nn.relu(gn(8, "gn2")(conv(inter[1], "lay2")(x)))
        for i, (fpn, c_out) in enumerate(zip(fpns, inter[2:5])):
            adapted = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                              name=f"adapter{i + 1}")(fpn)
            # expand per query: fpn (B, H, W, C) -> (B*Q, H, W, C)
            reps = x.shape[0] // adapted.shape[0]
            adapted = jnp.repeat(adapted, reps, axis=0)
            x = adapted + jax.image.resize(
                x, (x.shape[0],) + adapted.shape[1:3] + (x.shape[-1],),
                method="nearest")
            x = nn.relu(gn(8, f"gn{i + 3}")(
                conv(c_out, f"lay{i + 3}")(x)))
        return nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       name="out_lay")(x)


class _SegmMixin:
    """Shared mask-head forward, appended after the detector forward."""

    def _segm_setup(self):
        self.bbox_attention = MHAttentionMap(self.hidden_dim, self.nheads,
                                             dtype=self.dtype)
        self.mask_head = MaskHeadSmallConv(self.hidden_dim + self.nheads,
                                           self.hidden_dim, dtype=self.dtype)

    def _segm_forward(self, out, features, memory, hs, batch: FrameBatch):
        feats = [f for f, m in features]
        if isinstance(memory, (list, tuple)):
            # deformable: stride-16 level (reference detr_segmentation.py:44-53)
            src = self.input_proj[max(len(self.input_proj) - 3, 0)](feats[-2])
            mask = downsample_mask(batch.mask, src.shape[1:3])
            fpns = [feats[-2], feats[-3], feats[-4]]
            mem = memory[-3]
        else:
            src = self.input_proj(feats[-1])
            mask = downsample_mask(batch.mask, src.shape[1:3])
            fpns = [feats[2], feats[1], feats[0]]
            mem = memory

        bbox_mask = self.bbox_attention(hs[-1], mem, mask=mask)  # (B,Q,n,h,w)
        b, nq, heads, h, w = bbox_mask.shape
        src_e = jnp.repeat(src, nq, axis=0)  # (B*Q, h, w, C)
        attn_e = bbox_mask.transpose(0, 1, 3, 4, 2).reshape(
            b * nq, h, w, heads)
        x = jnp.concatenate([src_e, attn_e.astype(src_e.dtype)], axis=-1)
        seg = self.mask_head(x, fpns)  # (B*Q, H4, W4, 1)
        out["pred_masks"] = seg.reshape(
            b, nq, seg.shape[1], seg.shape[2]).astype(jnp.float32)
        return out


class DETRSegm(DETR, _SegmMixin):
    freeze_detr: bool = False

    def setup(self):
        super().setup()
        self._segm_setup()

    def __call__(self, batch, targets=None, prev_features=None,
                 deterministic=True):
        out, targets, features, memory, hs = super().__call__(
            batch, targets, prev_features, deterministic)
        out = self._segm_forward(out, features, memory, hs, batch)
        return out, targets, features, memory, hs


class DeformableDETRSegm(DeformableDETR, _SegmMixin):
    freeze_detr: bool = False

    def setup(self):
        super().setup()
        self._segm_setup()

    def __call__(self, batch, targets=None, prev_features=None,
                 deterministic=True):
        out, targets, features, memory, hs = super().__call__(
            batch, targets, prev_features, deterministic)
        out = self._segm_forward(out, features, memory, hs, batch)
        return out, targets, features, memory, hs


def postprocess_segm(results, outputs, target_hw, threshold=0.5,
                     return_probs=False):
    """Upsample pred masks to the padded input resolution (static shape).

    Per-image crop to the valid region and rescale to orig size happen on
    the host (datasets/tracking writers), as they are genuinely ragged.
    """
    pred = outputs["pred_masks"]  # (B, Q, h, w)
    b, q, _, _ = pred.shape
    masks = jax.image.resize(pred, (b, q) + tuple(target_hw),
                             method="bilinear")
    masks = jax.nn.sigmoid(masks)
    if not return_probs:
        masks = masks > threshold
    results = dict(results)
    results["masks"] = masks
    return results
