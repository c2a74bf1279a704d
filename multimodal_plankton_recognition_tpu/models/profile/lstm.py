"""Stacked-LSTM profile encoder.

TPU-native redesign of the reference's ``ProfileLSTM``
(reference: src/profile_encoder.py:71-108). torch's cuDNN-fused ``nn.LSTM``
becomes a stack of Flax ``OptimizedLSTMCell`` layers unrolled with
``jax.lax.scan`` (via ``nn.RNN``) — the idiomatic XLA recurrence: one traced
step compiled once, sequential over time, batched over the batch axis.
Inter-layer dropout matches torch semantics (applied to the outputs of every
layer except the last).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...data.tokenize import tokenize_lstm


class ProfileLSTM(nn.Module):
    dim_in: int = 6
    dim_hidden: int = 128
    num_layers: int = 2
    dropout: float = 0.1
    metadata: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def dim_out(self) -> int:
        return self.dim_hidden + int(self.metadata)

    def tokenize(self, profiles, pad_to: Optional[int] = None):
        return tokenize_lstm(profiles, pad_to)

    @nn.compact
    def __call__(self, profile: jnp.ndarray, last_idx: jnp.ndarray,
                 profile_len: Optional[jnp.ndarray] = None,
                 train: bool = False, **kwargs) -> jnp.ndarray:
        deterministic = not train
        x = nn.Dense(self.dim_hidden, use_bias=False, dtype=self.dtype,
                     name="expand")(profile.astype(self.dtype))
        for i in range(self.num_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.dim_hidden, dtype=self.dtype),
                         name=f"lstm_{i}")
            x = rnn(x)
            if i < self.num_layers - 1 and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        # gather hidden state at the last valid timestep per sequence
        # (reference: src/profile_encoder.py:102)
        b = jnp.arange(x.shape[0])
        x = x[b, last_idx]
        if self.metadata:
            md = profile_len.astype(x.dtype) / profile.shape[1]
            x = jnp.concatenate([x, md.reshape(x.shape[0], -1)], axis=1)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x
