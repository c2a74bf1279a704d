"""Self-attention module backed by the fused Pallas TPU kernel.

Drop-in replacement for ``flax.linen.MultiHeadDotProductAttention`` in the
self-attention configuration both transformer families here use (q = k = v,
optional key-padding mask): the SAME parameter tree (query/key/value/out
with (E, H, D) / (H, D, E) kernels, identical names and shapes), so
checkpoints are layout-compatible whether ``fused_attention`` is on or off.

Unlike flax's DenseGeneral projections, the kernels are APPLIED as packed
(E, E) matmuls producing (B, L, E) directly — profiling showed the
(B, L, H, D) head-split intermediates force XLA layout copies around the
attention (10+ ms/step of pure copy/transpose on the flagship). No rank-4
tensor ever materializes on this path.

On a TPU backend the attention core runs through
``ops.pallas.attention.mha_core`` (per-head lane-mask kernels — see that
module's docstring for the measured motivation). On other backends (CPU
tests, virtual multi-chip meshes) it falls back to an einsum composition
with the same semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pallas.attention import mha_core, mha_core_qkv


class _PackedProj(nn.Module):
    """(B, L, E_in) -> packed (B, L, H*D) with flax-DenseGeneral-shaped
    params ((E_in, H, D) kernel, (H, D) bias) applied as one 2-D matmul.

    ``apply=False`` returns the packed ((E_in, E), (E,)) f32 weight views
    instead of projecting — the fused-block kernel path takes the raw
    weights (same params, same tree) and runs the matmul in-kernel."""

    heads: int
    head_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray, apply: bool = True):
        e_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (e_in, self.heads, self.head_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads, self.head_dim), jnp.float32)
        e = self.heads * self.head_dim
        if not apply:
            return kernel.reshape(e_in, e), bias.reshape(e)
        return x @ kernel.reshape(e_in, e).astype(self.dtype) \
            + bias.reshape(e).astype(self.dtype)


class _PackedOut(nn.Module):
    """Packed (B, L, H*D) -> (B, L, E_out); params shaped (H, D, E_out) /
    (E_out,) like flax MHA's ``out`` DenseGeneral."""

    heads: int
    head_dim: int
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray, apply: bool = True):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.heads, self.head_dim, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        e = self.heads * self.head_dim
        if not apply:
            return kernel.reshape(e, self.features), bias
        return x @ kernel.reshape(e, self.features).astype(self.dtype) \
            + bias.astype(self.dtype)


def _qkv_packed_enabled() -> bool:
    """Packed-QKV path (ops/pallas/attention.mha_core_qkv): the three
    projections run as one (B·L, E_in)x(E_in, 3E) GEMM and the kernel takes
    ONE (B, L, 3E) operand. Default ON: measured 50.15 vs 53.53 ms/step on
    the ViT flagship (+6.7% pairs/s, docs/PERF.md r5).
    PLANKTON_ATTN_QKV_PACKED=0/1 overrides for probes."""
    import os
    return os.environ.get("PLANKTON_ATTN_QKV_PACKED", "1") == "1"


def _stacked_softmax_enabled() -> bool:
    """Stacked-softmax attention kernel (one (H*L8, L) softmax/dropout
    pass per sample instead of H per-head VPU chains — see mha_core).
    Default ON: measured 53.7 vs 57.6 ms/step on the ViT flagship
    (docs/PERF.md r4). PLANKTON_ATTN_STACKED=0/1 overrides for probes."""
    import os
    return os.environ.get("PLANKTON_ATTN_STACKED", "1") == "1"


class FusedSelfAttention(nn.Module):
    """Multi-head self-attention with the fused TPU core.

    ``mask_rows``: optional (B, L) bool, True = key is padding (the
    ProfileTransformer convention, reference src/profile_encoder.py:56-60);
    converted to a pre-softmax additive bias.
    """

    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    #: run the QKV/out projections INSIDE the kernel (one fused block,
    #: ops/pallas/experimental/attention_block.py) — deletes the XLA<->Pallas layout
    #: bridges around q/k/v/o. MEASURED NEGATIVE on the ViT flagship
    #: (63.9 vs 57.6 ms/step, docs/PERF.md r4): XLA's batched (B*L, E)
    #: projection GEMMs beat the kernel's per-sample dots by more than the
    #: bridges cost. Default off; PLANKTON_ATTN_FUSE_PROJ=0/1 overrides
    #: for perf probes.
    fuse_projections: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask_rows: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        b, l, e = x.shape
        h = self.num_heads
        d = e // h
        if h * d != e:
            raise ValueError(f"num_heads={h} must divide features={e}")

        if mask_rows is None:
            bias = jnp.zeros((b, l), jnp.float32)
        else:
            bias = jnp.where(mask_rows, -1e9, 0.0).astype(jnp.float32)

        train = not deterministic and self.dropout_rate > 0.0
        # kernel path only where a pallas_call sees the full local batch:
        # single-chip TPU, or a per-chip shard_map trace (ops/kernels.py) —
        # under a multi-chip GSPMD mesh the einsum fallback shards cleanly.
        # bf16-only: the kernel rounds probs/values through bfloat16
        # internally, so an f32 card keeps the full-precision einsum path
        # (round-2 advisor finding).
        from ..ops.kernels import kernel_path_allowed
        kernel_ok = kernel_path_allowed() and self.dtype == jnp.bfloat16
        if kernel_ok:
            if train:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, jnp.iinfo(jnp.int32).max)
            else:
                seed = jnp.zeros((), jnp.int32)
            interpret = jax.default_backend() != "tpu"

        fuse_block = kernel_ok and self._fuse_proj_enabled()
        qkv_packed = (kernel_ok and not fuse_block
                      and _stacked_softmax_enabled() and _qkv_packed_enabled())
        if fuse_block or qkv_packed:
            # both kernel branches consume raw projection weights (same
            # param tree as the applied path — _PackedProj(apply=False))
            wq, bq = _PackedProj(h, d, self.dtype, name="query")(
                x, apply=False)
            wk, bk = _PackedProj(h, d, self.dtype, name="key")(
                x, apply=False)
            wv, bv = _PackedProj(h, d, self.dtype, name="value")(
                x, apply=False)

        if fuse_block:
            from ..ops.pallas.experimental.attention_block import attn_block
            wo, bo = _PackedOut(h, d, e, self.dtype, name="out")(
                x, apply=False)
            return attn_block(x, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                              seed, h, self.dropout_rate, train, interpret,
                              mask_rows is not None)

        if qkv_packed:
            # one (B·L, E_in)x(E_in, 3E) projection GEMM + ONE kernel
            # operand: 3x the GEMM N-width at these narrow dims and a
            # single XLA<->Pallas layout bridge each way (VERDICT r4 #2;
            # same params/tree — the packed weight is a concat view)
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = x @ w + bqkv
            o = mha_core_qkv(qkv, bias, seed, h, self.dropout_rate, train,
                             interpret, mask_rows is not None)
            return _PackedOut(h, d, e, self.dtype, name="out")(o)

        q = _PackedProj(h, d, self.dtype, name="query")(x)
        k = _PackedProj(h, d, self.dtype, name="key")(x)
        v = _PackedProj(h, d, self.dtype, name="value")(x)
        if kernel_ok:
            o = mha_core(q, k, v, bias, seed, h, self.dropout_rate, train,
                         interpret, True, mask_rows is not None,
                         _stacked_softmax_enabled())
        else:
            o = self._einsum_fallback(q, k, v, bias, train, h, d)
        return _PackedOut(h, d, e, self.dtype, name="out")(o)

    def _fuse_proj_enabled(self) -> bool:
        import os
        env = os.environ.get("PLANKTON_ATTN_FUSE_PROJ")
        if env in ("0", "1"):
            return env == "1"
        return self.fuse_projections

    def _einsum_fallback(self, q, k, v, bias, train: bool,
                         h: int, d: int) -> jnp.ndarray:
        """Same math as the kernel (f32 softmax, masked keys, prob dropout)
        for non-TPU backends; dropout uses the flax rng stream."""
        b, l, e = q.shape
        qh = q.astype(jnp.float32).reshape(b, l, h, d)
        kh = k.astype(jnp.float32).reshape(b, l, h, d)
        vh = v.reshape(b, l, h, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (1.0 / (d ** 0.5))
        s = s + bias[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        if train:
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.dropout_rate, p.shape)
            p = p * keep / (1.0 - self.dropout_rate)
        o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), vh)
        return o.reshape(b, l, e)
