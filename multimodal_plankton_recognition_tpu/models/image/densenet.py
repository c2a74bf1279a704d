"""DenseNet backbones (121 / 169).

From-scratch Flax implementation for the timm names in the reference's image
sweep (reference: scripts/train_image.sh:10-11). BN-ReLU-Conv ordering,
bottleneck factor 4, growth rate 32, 0.5 transition compression, NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class _DenseLayer(nn.Module):
    growth: int
    bn_size: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, *, train: bool):
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    block_config: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    bn_size: int = 4
    in_chans: int = 1
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> int:
        ch = 64
        for i, n in enumerate(self.block_config):
            ch += n * self.growth
            if i != len(self.block_config) - 1:
                ch //= 2
        return ch

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = image.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = _DenseLayer(self.growth, self.bn_size, self.dtype,
                                name=f"block{bi + 1}_layer{li}")(x, train=train)
            if bi != len(self.block_config) - 1:
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name=f"trans{bi + 1}_bn")(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"trans{bi + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="final_bn")(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))


def densenet121(**kw) -> DenseNet:
    return DenseNet(block_config=(6, 12, 24, 16), **kw)


def densenet169(**kw) -> DenseNet:
    return DenseNet(block_config=(6, 12, 32, 32), **kw)
