"""Parameter-only flax modules for exact-numerics op fusion.

Several latency-bound spots apply multiple small `nn.Dense` / `nn.LayerNorm`
modules whose math can be folded into fewer, larger XLA ops (concatenated
kernels, stacked per-level weights). To keep CHECKPOINT and INIT parity with
the unfused formulation, the fused code paths must expose the exact same
parameter tree: these helpers declare a submodule with the same name and the
same `kernel`/`bias` (resp. `scale`/`bias`) leaves — created with the same
initializers and the same per-path RNG folding as `nn.Dense` /
`nn.LayerNorm` — but perform no compute, returning the raw parameters for
the caller to combine. Verified by
tests/test_models.py::test_fused_smallops_equivalence (identical pytrees and
leaf values between fused and unfused inits).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class DenseParams(nn.Module):
    """Parameters of an ``nn.Dense(features)`` applied to ``in_features``
    inputs, without the matmul. Same leaves: kernel (in, out), bias (out,)."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


class LayerNormParams(nn.Module):
    """Parameters of an ``nn.LayerNorm`` over ``dim`` features: scale/bias."""
    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.dim,), jnp.float32)
        return scale, bias
