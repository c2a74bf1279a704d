"""Fully-fused attention BLOCK kernel: QKV projections + multi-head
attention + output projection in ONE Pallas call.

Motivation (measured, docs/PERF.md round 3): with the lane-mask attention
kernel (ops/pallas/attention.py) the ViT flagship sits at 20.5% MFU and the
per-op floor attributes ~6.3 ms/step to pure copy/transpose — layout
bridges XLA inserts between its {0,2,1}-layout FFN/LN fusions and the
row-major q/k/v operands (and o result) of the Pallas custom call. Four
bridged tensors per attention layer (q, k, v in; o out) become two (x in;
y out) when the projections move INSIDE the kernel; the projection matmuls
also give the Mosaic scheduler MXU work to overlap with the VPU softmax
serialization the round-3 floor blamed for the remaining gap.

Semantics exactly match models/attention.py's composition
(_PackedProj q/k/v -> mha_core -> _PackedOut):

    q = x @ Wq + bq   (packed (E, E) weights; bf16 MXU, f32 accumulation)
    o = sum_h drop(softmax(s_h * scale + bias)) @ v_h     (per-head slices)
    y = o @ Wo + bo

Backward is recompute-in-backward (same policy as attention.py): q/k/v and
the per-head probabilities are rebuilt from x and the weights, weight
gradients accumulate across the sequential TPU grid in full-array f32
output blocks (the ops/pallas/experimental/ffn.py pattern), and dx is completed
in-kernel (dq@Wq^T + dk@Wk^T + dv@Wv^T) so no (B, L, E) intermediate ever
round-trips HBM.

The reference's attention is torch SDPA inside nn.TransformerEncoder
(reference: src/profile_encoder.py:22-30); parameter layout compatibility
is preserved by the caller (models/attention.py), which keeps the flax
MultiHeadDotProductAttention tree and only reshapes views of the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..attention import _pick_block_b, _uniform

__all__ = ["attn_block", "attn_block_reference"]

_VMEM_LIMIT = 100 * 1024 * 1024


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _project(x, w_ref, b_ref):
    """(L, E) @ (E, E) + (1, E) -> (L, E) in x's dtype (f32 accumulation)."""
    return (_dot(x, w_ref[...], ((1,), (0,))) + b_ref[...]).astype(x.dtype)


def _attn_heads_fwd(q, k, v, bias, seed_ref, sample_idx, *, heads,
                    dropout_p, train, has_bias):
    """Per-head narrow-slice attention forward; returns (L, E) f32 parts
    concatenated. Identical math to attention.py's _fwd_kernel
    (narrow=True)."""
    l, e = q.shape
    d = e // heads
    scale = 1.0 / (d ** 0.5)
    use_drop = train and dropout_p > 0.0
    parts = []
    for h in range(heads):
        qh, kh = q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = _dot(qh, kh, ((1,), (1,)))
        z = s * scale + bias if has_bias else s * scale
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        if use_drop:
            pltpu.prng_seed(seed_ref[0, 0] + sample_idx * heads + h)
            keep = (_uniform((l, l)) >= dropout_p).astype(jnp.float32)
            p = p * keep * (1.0 / (1.0 - dropout_p))
        parts.append(_dot(p.astype(v.dtype), vh, ((1,), (0,))))
    return jnp.concatenate(parts, axis=1)


def _fwd_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wo_ref, bo_ref, bias_ref, seed_ref, y_ref,
                *, heads, dropout_p, train, block_b, has_bias):
    base = pl.program_id(0) * block_b
    for i in range(block_b):
        x = x_ref[i]                                     # (L, E) bf16
        q = _project(x, wq_ref, bq_ref)
        k = _project(x, wk_ref, bk_ref)
        v = _project(x, wv_ref, bv_ref)
        o = _attn_heads_fwd(q, k, v, bias_ref[i], seed_ref, base + i,
                            heads=heads, dropout_p=dropout_p, train=train,
                            has_bias=has_bias)
        y = _dot(o.astype(x.dtype), wo_ref[...], ((1,), (0,))) + bo_ref[...]
        y_ref[i] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wo_ref, bo_ref, bias_ref, seed_ref, dy_ref,
                dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                dwv_ref, dbv_ref, dwo_ref, dbo_ref, db_ref,
                *, heads, dropout_p, train, block_b, has_bias):
    t = pl.program_id(0)
    base = t * block_b

    @pl.when(t == 0)
    def _():
        for ref in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                    dwo_ref, dbo_ref):
            ref[...] = jnp.zeros_like(ref)

    for i in range(block_b):
        x = x_ref[i]                                     # (L, E) bf16
        dy = dy_ref[i]                                   # (L, E) bf16
        l, e = x.shape
        d = e // heads
        scale = 1.0 / (d ** 0.5)
        bias = bias_ref[i]                               # (1, L)
        use_drop = train and dropout_p > 0.0

        q = _project(x, wq_ref, bq_ref)
        k = _project(x, wk_ref, bk_ref)
        v = _project(x, wv_ref, bv_ref)
        # do = dy @ Wo^T (cotangent into the attention output)
        do = _dot(dy, wo_ref[...], ((1,), (1,))).astype(x.dtype)

        db = jnp.zeros((1, l), jnp.float32)
        o_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
        for h in range(heads):
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            vh = v[:, h * d:(h + 1) * d]
            do_h = do[:, h * d:(h + 1) * d]
            s = _dot(qh, kh, ((1,), (1,)))
            z = s * scale + bias if has_bias else s * scale
            m = jnp.max(z, axis=1, keepdims=True)
            p = jnp.exp(z - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            dpd = _dot(do_h, vh, ((1,), (1,)))
            if use_drop:
                pltpu.prng_seed(seed_ref[0, 0] + (base + i) * heads + h)
                keep = (_uniform((l, l)) >= dropout_p).astype(jnp.float32)
                pd = p * keep * (1.0 / (1.0 - dropout_p))
                dp = dpd * keep * (1.0 / (1.0 - dropout_p))
            else:
                pd = p
                dp = dpd
            # o_h rebuilt for the Wo gradient (one extra MXU dot per head)
            o_parts.append(_dot(pd.astype(vh.dtype), vh, ((1,), (0,))))
            dz = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            if has_bias:
                db = db + jnp.sum(dz, axis=0, keepdims=True)
            ds = (dz * scale).astype(x.dtype)
            dq_parts.append(_dot(ds, kh, ((1,), (0,))))
            dk_parts.append(_dot(ds, qh, ((0,), (0,))))
            dv_parts.append(_dot(pd.astype(do_h.dtype), do_h,
                                 ((0,), (0,))))
        o = jnp.concatenate(o_parts, axis=1)             # (L, E) f32
        dq = jnp.concatenate(dq_parts, axis=1).astype(x.dtype)
        dk = jnp.concatenate(dk_parts, axis=1).astype(x.dtype)
        dv = jnp.concatenate(dv_parts, axis=1).astype(x.dtype)

        # weight/bias gradient accumulation (sequential TPU grid)
        dbo_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0,
                                keepdims=True)
        dwo_ref[...] += _dot(o.astype(x.dtype), dy, ((0,), (0,)))
        dbq_ref[...] += jnp.sum(dq.astype(jnp.float32), axis=0,
                                keepdims=True)
        dwq_ref[...] += _dot(x, dq, ((0,), (0,)))
        dbk_ref[...] += jnp.sum(dk.astype(jnp.float32), axis=0,
                                keepdims=True)
        dwk_ref[...] += _dot(x, dk, ((0,), (0,)))
        dbv_ref[...] += jnp.sum(dv.astype(jnp.float32), axis=0,
                                keepdims=True)
        dwv_ref[...] += _dot(x, dv, ((0,), (0,)))

        dx = (_dot(dq, wq_ref[...], ((1,), (1,)))
              + _dot(dk, wk_ref[...], ((1,), (1,)))
              + _dot(dv, wv_ref[...], ((1,), (1,))))
        dx_ref[i] = dx.astype(dx_ref.dtype)
        db_ref[i] = db


def _specs(l, e, bb):
    emb = pl.BlockSpec((bb, l, e), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    w = pl.BlockSpec((e, e), lambda b: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, e), lambda b: (0, 0), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((bb, 1, l), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    return emb, w, row, bias, seed


def _prep_weights(dtype, wq, bq, wk, bk, wv, bv, wo, bo):
    """Weights in x's dtype (bf16 cards -> full-rate MXU), f32 (1, E) bias
    rows."""
    row = lambda b: jnp.asarray(b, jnp.float32).reshape(1, -1)  # noqa: E731
    w = lambda a: a.astype(dtype)  # noqa: E731
    return (w(wq), row(bq), w(wk), row(bk), w(wv), row(bv), w(wo), row(bo))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def attn_block(x, wq, bq, wk, bk, wv, bv, wo, bo, bias_rows, seed,
               heads: int, dropout_p: float = 0.0, train: bool = False,
               interpret: bool = False, has_bias: bool = True):
    """Fused QKV-projection + MHA + out-projection on (B, L, E) ``x``.

    Weights are packed 2-D views: ``wq/wk/wv/wo`` are (E, E), biases (E,).
    ``bias_rows``/``seed`` as in ops.pallas.attention.mha_core. Returns
    (B, L, E) in x's dtype.
    """
    return _attn_block_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, bias_rows,
                           seed, heads, dropout_p, train, interpret,
                           has_bias)[0]


def _attn_block_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, bias_rows, seed,
                    heads, dropout_p, train, interpret, has_bias):
    b, l, e = x.shape
    bb = _pick_block_b(b)
    emb, w, row, bias_spec, seed_spec = _specs(l, e, bb)
    kernel = functools.partial(_fwd_kernel, heads=heads,
                               dropout_p=dropout_p, train=train,
                               block_b=bb, has_bias=has_bias)
    y = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[emb, w, row, w, row, w, row, w, row, bias_spec,
                  seed_spec],
        out_specs=emb,
        out_shape=jax.ShapeDtypeStruct((b, l, e), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x, *_prep_weights(x.dtype, wq, bq, wk, bk, wv, bv, wo, bo),
      jnp.asarray(bias_rows, jnp.float32).reshape(b, 1, l),
      jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return y, (x, wq, bq, wk, bk, wv, bv, wo, bo, bias_rows, seed)


def _attn_block_bwd(heads, dropout_p, train, interpret, has_bias,
                    residuals, g):
    x, wq, bq, wk, bk, wv, bv, wo, bo, bias_rows, seed = residuals
    b, l, e = x.shape
    bb = _pick_block_b(b)
    emb, w, row, bias_spec, seed_spec = _specs(l, e, bb)
    kernel = functools.partial(_bwd_kernel, heads=heads,
                               dropout_p=dropout_p, train=train,
                               block_b=bb, has_bias=has_bias)
    wgrad = jax.ShapeDtypeStruct((e, e), jnp.float32)
    bgrad = jax.ShapeDtypeStruct((1, e), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[emb, w, row, w, row, w, row, w, row, bias_spec,
                  seed_spec, emb],
        out_specs=(emb, w, row, w, row, w, row, w, row, bias_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, e), x.dtype),
            wgrad, bgrad, wgrad, bgrad, wgrad, bgrad, wgrad, bgrad,
            jax.ShapeDtypeStruct((b, 1, l), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x, *_prep_weights(x.dtype, wq, bq, wk, bk, wv, bv, wo, bo),
      jnp.asarray(bias_rows, jnp.float32).reshape(b, 1, l),
      jnp.asarray(seed, jnp.int32).reshape(1, 1), g.astype(x.dtype))
    (dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, db) = outs
    import numpy as np
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    db = db.reshape(jnp.shape(bias_rows)).astype(jnp.result_type(bias_rows))

    def wcast(gw, like):
        return gw.astype(jnp.result_type(like))

    return (dx, wcast(dwq, wq), wcast(dbq.reshape(-1), bq),
            wcast(dwk, wk), wcast(dbk.reshape(-1), bk),
            wcast(dwv, wv), wcast(dbv.reshape(-1), bv),
            wcast(dwo, wo), wcast(dbo.reshape(-1), bo), db, dseed)


attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


def attn_block_reference(x, wq, bq, wk, bk, wv, bv, wo, bo, bias_rows,
                         heads: int):
    """Plain-jnp oracle with the kernel's semantics (no dropout): packed
    projections in x's dtype, f32 softmax, per-head value dots."""
    from ..attention import mha_reference

    dt = x.dtype
    q = (x @ wq.astype(dt) + bq.astype(dt))
    k = (x @ wk.astype(dt) + bk.astype(dt))
    v = (x @ wv.astype(dt) + bv.astype(dt))
    o = mha_reference(q, k, v, bias_rows, heads)
    return o @ wo.astype(dt) + bo.astype(dt)
