"""EfficientNet backbones (B0 / B1).

From-scratch Flax implementation of the MBConv architecture for the timm
names the reference uses for its flagship multimodal model
(reference: model_cards/example_multi.yaml:9 "efficientnet_b0",
scripts/train_image.sh:12-13). NHWC layout; depthwise convs via
``feature_group_count``; SiLU activations; squeeze-excite with ratio 0.25 of
the block input channels.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

# (expand_ratio, channels, repeats, stride, kernel) per stage — B0 table
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class _SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class _MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand_ratio: int
    stride: int
    kernel: int
    se_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        mid = self.in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="expand_bn")(y)
            y = nn.silu(y)
        p = self.kernel // 2
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="dw_bn")(y)
        y = nn.silu(y)
        if self.se_ratio > 0:
            y = _SqueezeExcite(max(1, int(self.in_ch * self.se_ratio)),
                               self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + identity
        return y


class EfficientNet(nn.Module):
    depth_mult: float = 1.0
    in_chans: int = 1
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return 1280

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = image.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.silu(x)

        in_ch = 32
        for si, (expand, ch, repeats, stride, kernel) in enumerate(_B0_STAGES):
            repeats = _round_repeats(repeats, self.depth_mult)
            for b in range(repeats):
                s = stride if b == 0 else 1
                x = _MBConv(in_ch, ch, expand, s, kernel, self.se_ratio,
                            self.dtype, name=f"stage{si + 1}_block{b}")(
                    x, train=train)
                in_ch = ch

        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="head_bn")(x)
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2))


def efficientnet_b0(**kw) -> EfficientNet:
    return EfficientNet(depth_mult=1.0, **kw)


def efficientnet_b1(**kw) -> EfficientNet:
    return EfficientNet(depth_mult=1.1, **kw)
