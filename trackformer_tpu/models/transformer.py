"""Vanilla DETR transformer: encoder/decoder with pre/post-norm variants and
optional dedicated track-query attention layers.

Parity target: /root/reference/src/trackformer/models/transformer.py
(Transformer :18-80, encoder :83-104, decoder :107-163 incl. track_attention
:134-148, layers :166-308). Batch-first (B, L, C) throughout; decoder returns
all intermediate layer outputs (normed and raw) for aux losses and hs_embed.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiHeadAttention


def with_pos(x, pos):
    return x if pos is None else x + pos


class EncoderLayer(nn.Module):
    d_model: int
    nheads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, key_padding_mask=None,
                 deterministic=True):
        attn = MultiHeadAttention(self.d_model, self.nheads, self.dropout,
                                  self.dtype, name="self_attn")
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        drop = nn.Dropout(self.dropout)

        if self.pre_norm:
            s2 = norm1(src)
            q = k = with_pos(s2, pos)
            s2 = attn(q, k, s2, key_padding_mask, deterministic)
            src = src + drop(s2, deterministic=deterministic)
            s2 = norm2(src)
            s2 = lin2(drop(nn.relu(lin1(s2)), deterministic=deterministic))
            return src + drop(s2, deterministic=deterministic)

        q = k = with_pos(src, pos)
        s2 = attn(q, k, src, key_padding_mask, deterministic)
        src = norm1(src + drop(s2, deterministic=deterministic))
        s2 = lin2(drop(nn.relu(lin1(src)), deterministic=deterministic))
        return norm2(src + drop(s2, deterministic=deterministic))


class DecoderLayer(nn.Module):
    d_model: int
    nheads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 deterministic=True):
        self_attn = MultiHeadAttention(self.d_model, self.nheads, self.dropout,
                                       self.dtype, name="self_attn")
        cross_attn = MultiHeadAttention(self.d_model, self.nheads,
                                        self.dropout, self.dtype,
                                        name="multihead_attn")
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        drop = nn.Dropout(self.dropout)

        if self.pre_norm:
            t2 = norm1(tgt)
            q = k = with_pos(t2, query_pos)
            t2 = self_attn(q, k, t2, tgt_key_padding_mask, deterministic)
            tgt = tgt + drop(t2, deterministic=deterministic)
            t2 = norm2(tgt)
            t2 = cross_attn(with_pos(t2, query_pos), with_pos(memory, pos),
                            memory, memory_key_padding_mask, deterministic)
            tgt = tgt + drop(t2, deterministic=deterministic)
            t2 = norm3(tgt)
            t2 = lin2(drop(nn.relu(lin1(t2)), deterministic=deterministic))
            return tgt + drop(t2, deterministic=deterministic)

        q = k = with_pos(tgt, query_pos)
        t2 = self_attn(q, k, tgt, tgt_key_padding_mask, deterministic)
        tgt = norm1(tgt + drop(t2, deterministic=deterministic))
        t2 = cross_attn(with_pos(tgt, query_pos), with_pos(memory, pos),
                        memory, memory_key_padding_mask, deterministic)
        tgt = norm2(tgt + drop(t2, deterministic=deterministic))
        t2 = lin2(drop(nn.relu(lin1(tgt)), deterministic=deterministic))
        return norm3(tgt + drop(t2, deterministic=deterministic))


class Transformer(nn.Module):
    """DETR encoder-decoder over one flattened feature map.

    __call__(src (B,H,W,C), mask (B,H,W), query_embed (Q,C), pos (B,H,W,C),
    tgt optional (B,Qt,C), tgt_key_padding_mask optional) ->
    (hs (Lyr,B,Q,C) normed, hs_raw, memory (B,H,W,C)).
    """
    d_model: int = 512
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pre_norm: bool = False
    track_attention: bool = False
    num_queries: int = 100  # object-query count, for track_attention split
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, mask, query_embed, pos, tgt=None,
                 tgt_key_padding_mask=None, deterministic=True):
        b, h, w, c = src.shape
        src_t = src.reshape(b, h * w, c)
        pos_t = pos.reshape(b, h * w, c).astype(self.dtype)
        mask_t = mask.reshape(b, h * w)

        memory = src_t
        for i in range(self.num_encoder_layers):
            memory = EncoderLayer(self.d_model, self.nheads,
                                  self.dim_feedforward, self.dropout,
                                  self.pre_norm, self.dtype,
                                  name=f"encoder_layer_{i}")(
                memory, pos_t, mask_t, deterministic)
        if self.pre_norm:
            memory = nn.LayerNorm(dtype=self.dtype, name="encoder_norm")(memory)

        if query_embed.ndim == 2:
            query_pos = jnp.broadcast_to(query_embed[None],
                                         (b,) + query_embed.shape)
        else:
            query_pos = query_embed
        query_pos = query_pos.astype(self.dtype)
        if tgt is None:
            tgt = jnp.zeros_like(query_pos)

        n_obj = self.num_queries
        if self.track_attention:
            # track queries keep their pos only inside the dedicated
            # track-attention layers (reference transformer.py:134-148)
            track_query_pos = query_pos[:, :-n_obj]
            query_pos = query_pos.at[:, :-n_obj].set(0.0)

        decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        inter, inter_raw = [], []
        out = tgt
        for i in range(self.num_decoder_layers):
            if self.track_attention:
                track_out = EncoderLayer(
                    self.d_model, self.nheads, self.dim_feedforward,
                    self.dropout, self.pre_norm, self.dtype,
                    name=f"track_attention_layer_{i}")(
                        out[:, :-n_obj], track_query_pos,
                        None if tgt_key_padding_mask is None
                        else tgt_key_padding_mask[:, :-n_obj],
                        deterministic)
                out = jnp.concatenate([track_out, out[:, -n_obj:]], axis=1)
            out = DecoderLayer(self.d_model, self.nheads,
                               self.dim_feedforward, self.dropout,
                               self.pre_norm, self.dtype,
                               name=f"decoder_layer_{i}")(
                out, memory, query_pos, pos_t,
                tgt_key_padding_mask, mask_t, deterministic)
            inter.append(decoder_norm(out))
            inter_raw.append(out)

        hs = jnp.stack(inter)  # (L, B, Q, C)
        hs_raw = jnp.stack(inter_raw)
        return hs, hs_raw, memory.reshape(b, h, w, c)
