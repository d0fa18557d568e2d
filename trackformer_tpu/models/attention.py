"""Multi-head attention with key-padding masks, batch-first, flax.

Used by the vanilla DETR transformer and by the decoder self-attention of
the deformable stack (reference uses torch nn.MultiheadAttention,
/root/reference/src/trackformer/models/transformer.py:171,231-232). Written
as plain dense projections + dot-product attention so XLA fuses the QK^T /
softmax / PV chain onto the MXU; params stay f32, compute follows `dtype`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


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
