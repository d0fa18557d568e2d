"""DETR detection head (vanilla transformer variant).

Parity target: /root/reference/src/trackformer/models/detr.py:17-136 — ResNet
backbone + 1x1 input projection + DETR transformer + class/box heads, with
track-query injection: previous-frame output embeddings become extra decoder
targets with zero positional embedding (detr.py:94-112).

Static-shape adaptation: track queries occupy a fixed K-slot prefix with a
validity mask (instead of ragged per-image concat); invalid slots are
excluded from decoder self-attention keys and flagged in `query_valid` so
the matcher/criterion ignore them.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..structures import FrameBatch, Targets
from .backbone import Backbone
from .position_encoding import sine_position_encoding
from .transformer import Transformer


class MLP(nn.Module):
    """ReLU MLP head (reference detr.py:493-507)."""
    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32
    last_zero_init: bool = False
    last_bias_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer_{i}")(x))
        kernel_init = (nn.initializers.zeros if self.last_zero_init
                       else nn.initializers.lecun_normal())
        bias_init = (self.last_bias_init if self.last_bias_init is not None
                     else nn.initializers.zeros)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        kernel_init=kernel_init, bias_init=bias_init,
                        name=f"layer_{self.num_layers - 1}")(x)


def build_decoder_inputs(targets: Optional[Targets], query_embed, batch_size,
                         hidden_dim, dtype):
    """Assemble (query_pos, tgt, tgt_key_padding_mask, query_valid).

    Track-query slots (prefix) carry prev-frame hs embeddings as tgt with
    zero query_pos (reference detr.py:100-109 / deformable path
    deformable_transformer.py:211-225); object queries follow.
    """
    q, c = query_embed.shape[-2], hidden_dim
    query_pos = jnp.broadcast_to(query_embed[None], (batch_size, q, c))
    if targets is None or targets.tq_hs_embeds is None:
        tgt = None
        key_pad = None
        query_valid = jnp.ones((batch_size, q), bool)
        return query_pos.astype(dtype), tgt, key_pad, query_valid

    k = targets.tq_hs_embeds.shape[1]
    track_pos = jnp.zeros((batch_size, k, c), dtype)
    query_pos = jnp.concatenate([track_pos, query_pos.astype(dtype)], axis=1)
    tgt = jnp.concatenate(
        [targets.tq_hs_embeds.astype(dtype),
         jnp.zeros((batch_size, q, c), dtype)], axis=1)
    key_pad = jnp.concatenate(
        [~targets.tq_valid, jnp.zeros((batch_size, q), bool)], axis=1)
    query_valid = ~key_pad
    return query_pos, tgt, key_pad, query_valid


class DETR(nn.Module):
    """Vanilla DETR with optional track queries."""
    num_classes: int  # model head classes (factory passes C-1 when focal)
    num_queries: int = 100
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    backbone_name: str = "resnet50"
    dilation: bool = False
    aux_loss: bool = True
    overflow_boxes: bool = False
    track_attention: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = Backbone(self.backbone_name, self.dilation,
                                 return_interm_layers=True, dtype=self.dtype)
        self.input_proj = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                                  name="input_proj")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))
        self.transformer = Transformer(
            d_model=self.hidden_dim, nheads=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            pre_norm=self.pre_norm, track_attention=self.track_attention,
            num_queries=self.num_queries, dtype=self.dtype)
        self.class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                    name="class_embed")
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, dtype=self.dtype,
                              name="bbox_embed")

    def __call__(self, batch: FrameBatch, targets: Optional[Targets] = None,
                 prev_features=None, deterministic: bool = True):
        features, masks = self.backbone(batch)
        src = self.input_proj(features[-1])
        mask = masks[-1]
        pos = sine_position_encoding(mask, self.hidden_dim // 2,
                                     dtype=self.dtype)

        query_pos, tgt, key_pad, query_valid = build_decoder_inputs(
            targets, self.query_embed, batch.batch_size, self.hidden_dim,
            self.dtype)

        hs, hs_raw, memory = self.transformer(
            src, mask, query_pos, pos, tgt, key_pad, deterministic)

        outputs_class = self.class_embed(hs)
        outputs_coord = nn.sigmoid(self.bbox_embed(hs).astype(jnp.float32))
        outputs_class = outputs_class.astype(jnp.float32)

        out = {
            "pred_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
            "hs_embed": hs_raw[-1].astype(jnp.float32),
            "query_valid": query_valid,
        }
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": outputs_class[i],
                 "pred_boxes": outputs_coord[i],
                 "query_valid": query_valid}
                for i in range(self.dec_layers - 1)]

        feature_pairs = list(zip(features, masks))
        return out, targets, feature_pairs, memory, hs
