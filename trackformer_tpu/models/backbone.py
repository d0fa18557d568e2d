"""ResNet backbone with frozen batch-norm, NHWC, flax.linen.

Capability parity with the reference backbone
(/root/reference/src/trackformer/models/backbone.py:19-134): torchvision-style
ResNet-50/101 with FrozenBatchNorm2d, intermediate feature maps at strides
[4, 8, 16, 32] with channels [256, 512, 1024, 2048], optional DC5 dilation in
the last stage, and pad-mask downsampling per level.

TPU-first choices: NHWC layout (native for TPU convs), bf16 conv compute with
f32 params, frozen-BN folded into a single scale/shift (y = x*k + b with
k = gamma/sqrt(var+eps), precomputed once per step from the stored statistics
so torchvision weights load 1:1).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..structures import FrameBatch


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine parameters frozen.

    Parameters are stored exactly like torchvision (weight, bias,
    running_mean, running_var) for 1:1 checkpoint conversion, but the
    forward pass folds them into one multiply-add.
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        weight = self.param("weight", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("running_mean", nn.initializers.zeros, shape)
        var = self.param("running_var", nn.initializers.ones, shape)
        k = weight * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * k
        return x * k.astype(x.dtype) + b.astype(x.dtype)


class Bottleneck(nn.Module):
    """ResNet bottleneck block (1x1 -> 3x3 -> 1x1, expansion 4)."""
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(self.dilation, self.dilation)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.features * 4,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-compatible ResNet-50/101 trunk returning layer1..layer4."""
    layers: Sequence[int]  # blocks per stage, e.g. (3, 4, 6, 3) for R50
    dilation: bool = False  # DC5: stride->dilation in layer4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        # 3x3 max pool stride 2, padding 1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        widths = (64, 128, 256, 512)
        for stage, (width, n_blocks) in enumerate(zip(widths, self.layers)):
            stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.dilation:
                stride, dilation = 1, 2
            for i in range(n_blocks):
                x = Bottleneck(
                    width,
                    stride=stride if i == 0 else 1,
                    dilation=dilation,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}")(x)
            feats[f"layer{stage + 1}"] = x
        return feats


RESNET_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}
BACKBONE_CHANNELS = [256, 512, 1024, 2048]
BACKBONE_STRIDES = [4, 8, 16, 32]


def downsample_mask(mask: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-downsample a (B, H, W) bool pad mask to feature resolution
    (parity with F.interpolate on the float mask, backbone.py:86)."""
    b, h, w = mask.shape
    th, tw = hw
    ys = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
    return mask[:, ys][:, :, xs]


class Backbone(nn.Module):
    """Joiner of trunk features + per-level pad masks.

    Returns ordered dicts of feature maps (NHWC) and masks for the requested
    layers. Positional encodings are computed by the caller (they depend on
    the multi-frame config).
    """
    name_: str = "resnet50"
    dilation: bool = False
    return_interm_layers: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: FrameBatch):
        feats = ResNet(RESNET_LAYERS[self.name_], dilation=self.dilation,
                       dtype=self.dtype, name="trunk")(
                           batch.images.astype(self.dtype))
        names = (["layer1", "layer2", "layer3", "layer4"]
                 if self.return_interm_layers else ["layer4"])
        features, masks = [], []
        for n in names:
            f = feats[n]
            features.append(f)
            masks.append(downsample_mask(batch.mask, f.shape[1:3]))
        return features, masks

    @property
    def num_channels(self):
        if not self.return_interm_layers:
            return [BACKBONE_CHANNELS[-1]]
        return list(BACKBONE_CHANNELS)

    @property
    def strides(self):
        if not self.return_interm_layers:
            return [BACKBONE_STRIDES[-1]]
        return list(BACKBONE_STRIDES)
