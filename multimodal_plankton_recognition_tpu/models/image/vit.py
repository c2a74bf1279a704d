"""Vision Transformer backbones (tiny/small, patch 16/32, 224 px).

From-scratch Flax implementation covering the timm model names the reference
exercises (reference: scripts/train_image.sh:14-15, experiments.ipynb cell 4
"ViT_T/16 + Transformer"): pre-LN blocks, learned position embeddings, CLS
token pooling. Static 224-px inputs mean the (B, 197, D) attention tiles
directly onto the MXU; with ``fused_attention=True`` the attention runs
through the per-head lane-mask Pallas kernel (ops/pallas/attention.py),
avoiding the head-split transposes and HBM-materialized probabilities of
the einsum path.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..attention import FusedSelfAttention
from ..ffn import (DenseParams, apply_fused_ffn, apply_remat_ffn,
                   remat_mlp_enabled)


class _Block(nn.Module):
    """Pre-LN transformer block: x += MHA(LN(x)); x += MLP(LN(x))."""

    dim: int
    num_heads: int
    mlp_ratio: float
    dropout: float
    dtype: jnp.dtype
    #: fused Pallas attention kernel (models/attention.py); same params
    fused_attention: bool = False
    #: fused Pallas feed-forward kernel (models/ffn.py); same params
    fused_ffn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        if self.fused_attention:
            h = FusedSelfAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                dropout_rate=self.dropout, name="attn",
            )(h, deterministic=deterministic)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=deterministic,
                name="attn")(h, h, h)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        if self.fused_ffn:
            k1, b1 = DenseParams(hidden, name="mlp1")(self.dim)
            k2, b2 = DenseParams(self.dim, name="mlp2")(hidden)
            h = apply_fused_ffn(self, h, k1, b1, k2, b2, "gelu",
                                self.dropout, deterministic, self.dtype)
        elif remat_mlp_enabled():
            k1, b1 = DenseParams(hidden, name="mlp1")(self.dim)
            k2, b2 = DenseParams(self.dim, name="mlp2")(hidden)
            h = apply_remat_ffn(self, h, k1, b1, k2, b2, "gelu",
                                self.dropout, deterministic, self.dtype)
        else:
            h = nn.Dense(hidden, dtype=self.dtype, name="mlp1")(h)
            h = nn.gelu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(h)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x


class ViT(nn.Module):
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    in_chans: int = 1
    img_size: int = 224
    #: fused Pallas attention kernel (models/attention.py)
    fused_attention: bool = False
    #: fused Pallas feed-forward kernel (models/ffn.py)
    fused_ffn: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """image: (B, H, W, C) channel-last; returns pooled CLS feature (B, D)."""
        deterministic = not train
        x = image.astype(self.dtype)
        # patch embedding as a strided conv
        x = nn.Conv(self.embed_dim,
                    kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)).astype(x.dtype), x],
                            axis=1)
        n_tokens = (self.img_size // self.patch_size) ** 2 + 1
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, n_tokens, self.embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        for i in range(self.depth):
            x = _Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                       self.dropout, self.dtype,
                       fused_attention=self.fused_attention,
                       fused_ffn=self.fused_ffn,
                       name=f"block_{i}")(
                x, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        return x[:, 0]  # CLS pooling


def _vit(kw, **defaults) -> ViT:
    # setdefault (not fixed kwargs) so backbone_kwargs overrides — e.g. the
    # scaled-down conformance models in __graft_entry__ — don't collide
    for k, v in defaults.items():
        kw.setdefault(k, v)
    return ViT(**kw)


def vit_tiny_patch16_224(**kw) -> ViT:
    return _vit(kw, patch_size=16, embed_dim=192, depth=12, num_heads=3)


def vit_small_patch16_224(**kw) -> ViT:
    return _vit(kw, patch_size=16, embed_dim=384, depth=12, num_heads=6)


def vit_small_patch32_224(**kw) -> ViT:
    return _vit(kw, patch_size=32, embed_dim=384, depth=12, num_heads=6)
