"""Self-attention module backed by the fused Pallas TPU kernel.

Drop-in replacement for ``flax.linen.MultiHeadDotProductAttention`` in the
self-attention configuration both transformer families here use (q = k = v,
optional key-padding mask): the SAME parameter tree (query/key/value/out
DenseGeneral, identical names and shapes), so checkpoints are
layout-compatible whether ``fused_attention`` is on or off.

On a TPU backend the attention core runs through
``ops.pallas.attention.mha_core`` (per-head lane-mask kernels: no head-split
transposes, no HBM-materialized probs, in-kernel dropout — see that module's
docstring for the measured motivation). On other backends (CPU tests,
virtual multi-chip meshes) it falls back to an einsum composition with the
same semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pallas.attention import mha_core


class FusedSelfAttention(nn.Module):
    """Multi-head self-attention with the fused TPU core.

    ``mask_rows``: optional (B, L) bool, True = key is padding (the
    ProfileTransformer convention, reference src/profile_encoder.py:56-60);
    converted to a pre-softmax additive bias.
    """

    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask_rows: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        b, l, e = x.shape
        h = self.num_heads
        d = e // h
        if h * d != e:
            raise ValueError(f"num_heads={h} must divide features={e}")
        q = nn.DenseGeneral((h, d), dtype=self.dtype, name="query")(x)
        k = nn.DenseGeneral((h, d), dtype=self.dtype, name="key")(x)
        v = nn.DenseGeneral((h, d), dtype=self.dtype, name="value")(x)
        # packed (B, L, E) lane layout — a free reshape of the minor dims
        q2, k2, v2 = (t.reshape(b, l, e) for t in (q, k, v))

        if mask_rows is None:
            bias = jnp.zeros((b, l), jnp.float32)
        else:
            bias = jnp.where(mask_rows, -1e9, 0.0).astype(jnp.float32)

        train = not deterministic and self.dropout_rate > 0.0
        if train:
            seed = jax.random.randint(self.make_rng("dropout"), (),
                                      0, jnp.iinfo(jnp.int32).max)
        else:
            seed = jnp.zeros((), jnp.int32)

        if jax.default_backend() == "tpu":
            o = mha_core(q2, k2, v2, bias, seed, h,
                         self.dropout_rate, train)
        else:
            o = self._einsum_fallback(q, k, v, bias, train)
            o = o.reshape(b, l, e)
        o = o.reshape(b, l, h, d)
        return nn.DenseGeneral(e, axis=(-2, -1), dtype=self.dtype,
                               name="out")(o)

    def _einsum_fallback(self, q, k, v, bias, train: bool) -> jnp.ndarray:
        """Same math as the kernel (f32 softmax, masked keys, prob dropout)
        for non-TPU backends; dropout uses the flax rng stream."""
        d = q.shape[-1]
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (1.0 / (d ** 0.5))
        s = s + bias[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        if train:
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.dropout_rate, p.shape)
            p = p * keep / (1.0 - self.dropout_rate)
        return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
