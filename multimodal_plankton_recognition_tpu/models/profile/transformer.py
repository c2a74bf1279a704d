"""Transformer encoder over pulse-shape profiles.

TPU-native redesign of the reference's ``ProfileTransformer``
(reference: src/profile_encoder.py:9-68): a bias-free linear expansion of the
6 pulse channels, a learned absolute position table with a dedicated padding
row, a stack of post-LayerNorm transformer blocks (torch
``nn.TransformerEncoderLayer`` convention, GELU feed-forward), a zero CLS
token at position 0, and an optional relative-length metadata scalar
concatenated to the CLS output.

Sequence lengths are static (profiles are resampled to ``target_size`` by
the input pipeline), so everything tiles cleanly onto the MXU. With
``fused_attention: true`` the attention runs through the per-head lane-mask
Pallas kernel (ops/pallas/attention.py) — no head-split transposes and no
HBM-materialized (B, H, L, L) probabilities, which profiling showed dominate
this encoder's step time at the reference's 8-head/24-dim shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...data.tokenize import tokenize_transformer
from ..attention import FusedSelfAttention
from ..ffn import (DenseParams, apply_fused_ffn, apply_remat_ffn,
                   remat_mlp_enabled)


class _EncoderLayer(nn.Module):
    """Post-LN transformer block (torch nn.TransformerEncoderLayer,
    ``norm_first=False``): x = LN(x + MHA(x)); x = LN(x + FF(x))."""

    dim_hidden: int
    num_head: int
    dim_feedforward: int
    dropout: float
    activation: str
    dtype: jnp.dtype
    #: route attention through the fused Pallas TPU kernel (same parameter
    #: tree as flax MHA — see models/attention.py); single-chip path
    fused_attention: bool = False
    #: route the feed-forward through the fused Pallas kernel (same
    #: parameter tree as the nn.Dense pair — see models/ffn.py)
    fused_ffn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray],
                 *, deterministic: bool) -> jnp.ndarray:
        if self.fused_attention:
            attn = FusedSelfAttention(
                num_heads=self.num_head, dtype=self.dtype,
                dropout_rate=self.dropout, name="attn",
            )(x, padding_mask, deterministic=deterministic)
        else:
            attn_mask = None
            if padding_mask is not None:
                # (B, 1, 1, T): True = attend, matching flax mask convention
                attn_mask = (~padding_mask)[:, None, None, :]
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_head,
                dtype=self.dtype,
                dropout_rate=self.dropout,
                deterministic=deterministic,
                name="attn",
            )(x, x, x, mask=attn_mask)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x + attn)

        if self.fused_ffn:
            k1, b1 = DenseParams(self.dim_feedforward,
                                 name="ff1")(self.dim_hidden)
            k2, b2 = DenseParams(self.dim_hidden,
                                 name="ff2")(self.dim_feedforward)
            h = apply_fused_ffn(self, x, k1, b1, k2, b2, self.activation,
                                self.dropout, deterministic, self.dtype)
        elif remat_mlp_enabled():
            k1, b1 = DenseParams(self.dim_feedforward,
                                 name="ff1")(self.dim_hidden)
            k2, b2 = DenseParams(self.dim_hidden,
                                 name="ff2")(self.dim_feedforward)
            h = apply_remat_ffn(self, x, k1, b1, k2, b2, self.activation,
                                self.dropout, deterministic, self.dtype)
        else:
            act = {"gelu": nn.gelu, "relu": nn.relu}[self.activation]
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name="ff1")(x)
            h = act(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(self.dim_hidden, dtype=self.dtype, name="ff2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm(dtype=self.dtype, name="ln2")(x + h)
        return x


class ProfileTransformer(nn.Module):
    dim_in: int = 6
    dim_hidden: int = 128
    target_size: int = 224
    num_head: int = 4
    num_layers: int = 6
    dim_feedforward: int = 2024
    dropout: float = 0.1
    activation: str = "gelu"
    metadata: bool = True
    #: fused Pallas attention kernel (models/attention.py); checkpoint
    #: layout is identical either way
    fused_attention: bool = False
    #: fused Pallas feed-forward kernel (models/ffn.py); same layout rule
    fused_ffn: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def dim_out(self) -> int:
        return self.dim_hidden + int(self.metadata)

    @property
    def padding_idx(self) -> int:
        # torch Embedding(target_size + 2, padding_idx=-1) normalizes to the
        # last row (reference: src/profile_encoder.py:19-20)
        return self.target_size + 1

    def tokenize(self, profiles, pad_to: Optional[int] = None):
        """Static batching contract (reference: src/profile_encoder.py:38-54)."""
        return tokenize_transformer(profiles, self.target_size, pad_to)

    @nn.compact
    def __call__(self, profile: jnp.ndarray, time: jnp.ndarray,
                 padding_mask: jnp.ndarray,
                 profile_len: Optional[jnp.ndarray] = None,
                 train: bool = False, **kwargs) -> jnp.ndarray:
        deterministic = not train
        x = nn.Dense(self.dim_hidden, use_bias=False, dtype=self.dtype,
                     name="expand")(profile.astype(self.dtype))
        position = nn.Embed(self.target_size + 2, self.dim_hidden,
                            dtype=self.dtype, name="position")
        x = x + position(time)
        for i in range(self.num_layers):
            x = _EncoderLayer(self.dim_hidden, self.num_head,
                              self.dim_feedforward, self.dropout,
                              self.activation, self.dtype,
                              fused_attention=self.fused_attention,
                              fused_ffn=self.fused_ffn,
                              name=f"layer_{i}")(
                x, padding_mask, deterministic=deterministic)
        x = x[:, 0]  # CLS position
        if self.metadata:
            md = profile_len.astype(x.dtype) / profile.shape[1]
            x = jnp.concatenate([x, md.reshape(x.shape[0], -1)], axis=1)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x
