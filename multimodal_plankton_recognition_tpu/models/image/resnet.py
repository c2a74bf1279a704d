"""2-D ResNet backbones (resnet18 / resnet50).

From-scratch Flax implementation of the classic architecture for the timm
names the reference sweeps (reference: scripts/train_image.sh:8-9). NHWC
layout (XLA's native TPU conv layout), BatchNorm with global-batch statistics
(GSPMD turns them into cross-replica reductions under a sharded data axis).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class _BasicBlock(nn.Module):
    channels: int
    stride: int
    use_projection: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        if self.use_projection:
            identity = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="proj_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="proj_bn")(identity)
        return nn.relu(y + identity)


class _Bottleneck(nn.Module):
    channels: int  # bottleneck width; output is channels * 4
    stride: int
    use_projection: bool
    dtype: jnp.dtype
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        out_ch = self.channels * self.expansion
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn3")(y)
        if self.use_projection:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="proj_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="proj_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    in_chans: int = 1
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return 512 * (4 if self.bottleneck else 1)

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = image.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block = _Bottleneck if self.bottleneck else _BasicBlock
        expansion = 4 if self.bottleneck else 1
        in_ch = 64
        for stage, repeats in enumerate(self.stage_sizes):
            width = 64 * (2 ** stage)
            for b in range(repeats):
                stride = 2 if (stage > 0 and b == 0) else 1
                proj = b == 0 and (stride != 1 or in_ch != width * expansion)
                x = block(width, stride, proj, self.dtype,
                          name=f"stage{stage + 1}_block{b}")(x, train=train)
                in_ch = width * expansion
        return jnp.mean(x, axis=(1, 2))  # global average pool


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), bottleneck=False, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), bottleneck=True, **kw)
