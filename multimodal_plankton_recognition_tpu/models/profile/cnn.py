"""1-D ResNet profile encoder.

TPU-native redesign of the reference's ``ProfileCNN``
(reference: src/profile_encoder.py:111-240): stem Conv1d(k3,s2)+BN+ReLU+
MaxPool(3,2,1), four stages of basic residual blocks with channel doubling
and stride-2 downsampling, and a global max-pool head.

Layout is channel-last (B, L, C) throughout — XLA's native TPU conv layout —
instead of the reference's torch (B, C, L) transpose (src/profile_encoder.py:215).
BatchNorm statistics are computed over the full logical batch; under a
GSPMD-sharded data axis XLA turns the batch mean/var into a cross-replica
reduction automatically (sync-BN for free).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ...data.tokenize import tokenize_cnn


def _make_norm(kind: str, dtype, name: str, train: bool):
    """norm='batch' (reference parity; global-batch stats = sync-BN under
    GSPMD) or norm='group' (batch-independent, no running stats — the
    conventional alternative for small per-device batches, SURVEY section 7)."""
    if kind == "group":
        return nn.GroupNorm(num_groups=None, group_size=8, dtype=dtype,
                            name=name)
    return nn.BatchNorm(use_running_average=not train, dtype=dtype, name=name)


class _BasicBlock1D(nn.Module):
    """conv(k3,s)+norm+ReLU -> conv(k3,1)+norm, residual add, ReLU
    (reference: src/profile_encoder.py:111-148)."""

    channels: int
    stride: int
    use_projection: bool
    dtype: jnp.dtype
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        identity = x
        y = nn.Conv(self.channels, (3,), strides=(self.stride,),
                    padding=[(1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _make_norm(self.norm, self.dtype, "bn1", train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3,), strides=(1,), padding=[(1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _make_norm(self.norm, self.dtype, "bn2", train)(y)
        if self.use_projection:
            identity = nn.Conv(self.channels, (1,), strides=(self.stride,),
                               padding="VALID", use_bias=False,
                               dtype=self.dtype, name="proj_conv")(x)
            identity = _make_norm(self.norm, self.dtype, "proj_bn",
                                  train)(identity)
        return nn.relu(y + identity)


class ProfileCNN(nn.Module):
    dim_in: int = 6
    blocks: Sequence[int] = (2, 2, 2, 2)
    groups: int = 1
    base_channels: int = 32
    dropout: float = 0.1
    metadata: bool = True
    norm: str = "batch"   # 'batch' (reference parity) or 'group'
    dtype: jnp.dtype = jnp.float32

    @property
    def dim_out(self) -> int:
        return self.base_channels * 8 + int(self.metadata)

    def tokenize(self, profiles, pad_to: Optional[int] = None):
        return tokenize_cnn(profiles, pad_to)

    @nn.compact
    def __call__(self, profile: jnp.ndarray,
                 profile_len: Optional[jnp.ndarray] = None,
                 train: bool = False, **kwargs) -> jnp.ndarray:
        x = profile.astype(self.dtype)  # (B, L, D) channel-last
        x = nn.Conv(self.base_channels, (3,), strides=(2,), padding=[(1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = _make_norm(self.norm, self.dtype, "stem_bn", train)(x)
        x = nn.relu(x)
        # MaxPool1d(3, 2, 1): pad with -inf so padding never wins the max
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])

        channels = self.base_channels
        in_channels = self.base_channels
        for stage, repeats in enumerate(self.blocks):
            stride = 1 if stage == 0 else 2
            stage_channels = self.base_channels * (2 ** stage)
            for b in range(repeats):
                s = stride if b == 0 else 1
                proj = b == 0 and (s != 1 or in_channels != stage_channels)
                x = _BasicBlock1D(stage_channels, s, proj, self.dtype,
                                  norm=self.norm,
                                  name=f"stage{stage + 1}_block{b}")(
                    x, train=train)
                in_channels = stage_channels
            channels = stage_channels

        # AdaptiveMaxPool1d(1) == global max over time
        x = jnp.max(x, axis=1)
        if self.metadata:
            md = profile_len.astype(x.dtype) / profile.shape[1]
            x = jnp.concatenate([x, md.reshape(x.shape[0], -1)], axis=1)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
