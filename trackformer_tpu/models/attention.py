"""Multi-head attention with key-padding masks, batch-first, flax.

Used by the vanilla DETR transformer and by the decoder self-attention of
the deformable stack (reference uses torch nn.MultiheadAttention,
/root/reference/src/trackformer/models/transformer.py:171,231-232). Written
as plain dense projections + dot-product attention so XLA fuses the QK^T /
softmax / PV chain onto the MXU; params stay f32, compute follows `dtype`.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .fused_params import DenseParams

# When the SAME array is passed as query and key (encoder window
# self-attention, decoder self-attention — q = k = x + pos), the q/k
# projections share their input and can be ONE concatenated-kernel matmul
# instead of two: identical contractions per output column, identical
# parameter tree (fused_params.DenseParams), so numerics and checkpoints
# are unchanged. Module-level so bench.py can A/B it on the live chip.
QK_FUSED = os.environ.get("ATTN_QK_FUSED", "0") == "1"


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """query (B, Q, C), key/value (B, K, C);
        key_padding_mask (B, K) bool, True = exclude key."""
        b, lq, _ = query.shape
        lk = key.shape[1]
        h, dh = self.num_heads, self.d_model // self.num_heads

        if QK_FUSED and query is key:
            c_in = query.shape[-1]
            kq, bq = DenseParams(self.d_model, c_in, name="q_proj")()
            kk, bk = DenseParams(self.d_model, c_in, name="k_proj")()
            w = jnp.concatenate([kq, kk], axis=1).astype(self.dtype)
            bias2 = jnp.concatenate([bq, bk]).astype(self.dtype)
            qk = query.astype(self.dtype) @ w + bias2
            q, k = qk[..., :self.d_model], qk[..., self.d_model:]
        else:
            q = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(query)
            k = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(value)

        q = q.reshape(b, lq, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(dh))
        if key_padding_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        attn = nn.softmax(logits, axis=-1).astype(self.dtype)
        # head-averaged weights for attention-map visualization (zero cost
        # unless apply() requests mutable=['intermediates'])
        self.sow("intermediates", "attn_weights",
                 jnp.mean(attn.astype(jnp.float32), axis=1))
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)
