"""Fused contrastive-loss Pallas TPU kernels.

One kernel invocation per contrastive bucket fuses the whole loss pipeline —
L2 normalization, the (N, N) similarity matmul on the MXU, temperature
scaling, and the symmetric softmax / sigmoid loss reduction — entirely in
VMEM, so the logits matrix never round-trips to HBM (the XLA path
materializes it between the matmul and the softmax for large buckets).
The backward pass is a second fused kernel (recompute-in-backward: the
similarity matrix is cheaper to rebuild on the MXU than to spill), wired up
via ``jax.custom_vjp``.

Losses computed are bit-equivalent (up to float reassociation) to the
reference semantics in ops/losses.py (reference: src/coordination.py:26-95).

Interpret mode (``interpret=True``) runs the same kernels on CPU for tests;
on TPU they compile through Mosaic.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _normalize(x):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, _EPS)


# ---------------------------------------------------------------------------
# CLIP (symmetric InfoNCE)
# ---------------------------------------------------------------------------

def _clip_fwd_kernel(i_ref, p_ref, scale_ref, loss_ref):
    i = _normalize(i_ref[0].astype(jnp.float32))          # (N, D)
    p = _normalize(p_ref[0].astype(jnp.float32))
    z = jax.lax.dot_general(
        i, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * jnp.exp(scale_ref[0, 0])
    n = z.shape[0]
    eye = jnp.eye(n, dtype=z.dtype)
    # keep reductions 2-D (Mosaic layouts for 1-D vectors are fragile)
    diag_r = jnp.sum(z * eye, axis=1, keepdims=True)          # (N, 1)
    diag_c = jnp.sum(z * eye, axis=0, keepdims=True)          # (1, N)
    m_r = jnp.max(z, axis=1, keepdims=True)
    lse_r = m_r + jnp.log(jnp.sum(jnp.exp(z - m_r), axis=1, keepdims=True))
    m_c = jnp.max(z, axis=0, keepdims=True)
    lse_c = m_c + jnp.log(jnp.sum(jnp.exp(z - m_c), axis=0, keepdims=True))
    loss = (jnp.sum(lse_r - diag_r) + jnp.sum(lse_c - diag_c)) * 0.5 / n
    loss_ref[pl.program_id(0), 0] = loss


def _clip_bwd_kernel(i_ref, p_ref, scale_ref, g_ref,
                     di_ref, dp_ref, ds_ref):
    i_raw = i_ref[0].astype(jnp.float32)
    p_raw = p_ref[0].astype(jnp.float32)
    i_nrm = jnp.sqrt(jnp.sum(i_raw * i_raw, axis=-1, keepdims=True))
    p_nrm = jnp.sqrt(jnp.sum(p_raw * p_raw, axis=-1, keepdims=True))
    i = i_raw / jnp.maximum(i_nrm, _EPS)
    p = p_raw / jnp.maximum(p_nrm, _EPS)
    scale_e = jnp.exp(scale_ref[0, 0])
    s = jax.lax.dot_general(i, p, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = s * scale_e
    n = z.shape[0]
    eye = jnp.eye(n, dtype=z.dtype)
    soft_r = jax.nn.softmax(z, axis=1)
    soft_c = jax.nn.softmax(z, axis=0)
    # d(loss)/dz for loss = 0.5*(mean_row CE + mean_col CE)
    g = g_ref[0, 0]
    dz = g * 0.5 / n * ((soft_r - eye) + (soft_c - eye))
    ds_ref[pl.program_id(0), 0] = jnp.sum(dz * s) * scale_e     # d logit_scale
    d_s = dz * scale_e
    d_in = jax.lax.dot_general(d_s, p, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_pn = jax.lax.dot_general(d_s, i, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # back through x -> x/||x||: dx = (dn - (dn . n) n) / ||x||
    di = (d_in - jnp.sum(d_in * i, axis=-1, keepdims=True) * i) \
        / jnp.maximum(i_nrm, _EPS)
    dp = (d_pn - jnp.sum(d_pn * p, axis=-1, keepdims=True) * p) \
        / jnp.maximum(p_nrm, _EPS)
    di_ref[0] = di.astype(di_ref.dtype)
    dp_ref[0] = dp.astype(dp_ref.dtype)


def _bucket_specs(buckets: int, n: int, d: int):
    emb = pl.BlockSpec((1, n, d), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), lambda b: (0, 0),
                          memory_space=pltpu.SMEM)
    # outputs in SMEM must be full-array blocks on TPU; kernels index them
    # by pl.program_id(0)
    out_scalar = pl.BlockSpec((buckets, 1), lambda b: (0, 0),
                              memory_space=pltpu.SMEM)
    return emb, scalar, out_scalar


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def clip_loss_fused(image_emb: jnp.ndarray, profile_emb: jnp.ndarray,
                    logit_scale: jnp.ndarray, buckets: int = 1,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused bucketed symmetric-InfoNCE (semantics of ops.losses.clip_loss)."""
    return _clip_fwd(image_emb, profile_emb, logit_scale, buckets,
                     interpret)[0]


def _clip_fwd(image_emb, profile_emb, logit_scale, buckets, interpret):
    b, d = image_emb.shape
    n = b // buckets
    i3 = image_emb.reshape(buckets, n, d)
    p3 = profile_emb.reshape(buckets, n, d)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(1, 1)
    emb_spec, scalar_spec, out_spec = _bucket_specs(buckets, n, d)
    losses = pl.pallas_call(
        _clip_fwd_kernel,
        grid=(buckets,),
        in_specs=[emb_spec, emb_spec, scalar_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((buckets, 1), jnp.float32),
        interpret=interpret,
    )(i3, p3, scale)
    loss = jnp.mean(losses)
    return loss, (image_emb, profile_emb, jnp.asarray(logit_scale))


def _clip_bwd(buckets, interpret, residuals, g):
    image_emb, profile_emb, logit_scale = residuals
    b, d = image_emb.shape
    n = b // buckets
    i3 = image_emb.reshape(buckets, n, d)
    p3 = profile_emb.reshape(buckets, n, d)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(1, 1)
    # d(total)/d(bucket loss) = g / buckets
    gb = (jnp.asarray(g, jnp.float32) / buckets).reshape(1, 1)
    emb_spec, scalar_spec, out_spec = _bucket_specs(buckets, n, d)
    di, dp, ds = pl.pallas_call(
        _clip_bwd_kernel,
        grid=(buckets,),
        in_specs=[emb_spec, emb_spec, scalar_spec, scalar_spec],
        out_specs=(emb_spec, emb_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((buckets, n, d), image_emb.dtype),
            jax.ShapeDtypeStruct((buckets, n, d), profile_emb.dtype),
            jax.ShapeDtypeStruct((buckets, 1), jnp.float32),
        ),
        interpret=interpret,
    )(i3, p3, scale, gb)
    return (di.reshape(b, d), dp.reshape(b, d),
            jnp.sum(ds).astype(jnp.asarray(logit_scale).dtype))


clip_loss_fused.defvjp(_clip_fwd, _clip_bwd)


# ---------------------------------------------------------------------------
# SigLIP (pairwise sigmoid)
# ---------------------------------------------------------------------------

def _siglip_fwd_kernel(i_ref, p_ref, scale_ref, bias_ref, loss_ref):
    i = _normalize(i_ref[0].astype(jnp.float32))
    p = _normalize(p_ref[0].astype(jnp.float32))
    z = jax.lax.dot_general(
        i, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * jnp.exp(scale_ref[0, 0]) \
        + bias_ref[0, 0]
    n = z.shape[0]
    labels = 2.0 * jnp.eye(n, dtype=z.dtype) - 1.0
    x = labels * z
    # -log_sigmoid(x) = softplus(-x)
    loss = jnp.sum(jnp.logaddexp(0.0, -x)) / n
    loss_ref[pl.program_id(0), 0] = loss


def _siglip_bwd_kernel(i_ref, p_ref, scale_ref, bias_ref, g_ref,
                       di_ref, dp_ref, ds_ref, db_ref):
    i_raw = i_ref[0].astype(jnp.float32)
    p_raw = p_ref[0].astype(jnp.float32)
    i_nrm = jnp.sqrt(jnp.sum(i_raw * i_raw, axis=-1, keepdims=True))
    p_nrm = jnp.sqrt(jnp.sum(p_raw * p_raw, axis=-1, keepdims=True))
    i = i_raw / jnp.maximum(i_nrm, _EPS)
    p = p_raw / jnp.maximum(p_nrm, _EPS)
    scale_e = jnp.exp(scale_ref[0, 0])
    s = jax.lax.dot_general(i, p, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = s * scale_e + bias_ref[0, 0]
    n = z.shape[0]
    labels = 2.0 * jnp.eye(n, dtype=z.dtype) - 1.0
    # d softplus(-x)/dz = -labels * sigmoid(-labels * z)
    g = g_ref[0, 0]
    dz = g / n * (-labels * jax.nn.sigmoid(-labels * z))
    ds_ref[pl.program_id(0), 0] = jnp.sum(dz * s) * scale_e
    db_ref[pl.program_id(0), 0] = jnp.sum(dz)
    d_s = dz * scale_e
    d_in = jax.lax.dot_general(d_s, p, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_pn = jax.lax.dot_general(d_s, i, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    di = (d_in - jnp.sum(d_in * i, axis=-1, keepdims=True) * i) \
        / jnp.maximum(i_nrm, _EPS)
    dp = (d_pn - jnp.sum(d_pn * p, axis=-1, keepdims=True) * p) \
        / jnp.maximum(p_nrm, _EPS)
    di_ref[0] = di.astype(di_ref.dtype)
    dp_ref[0] = dp.astype(dp_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def siglip_loss_fused(image_emb: jnp.ndarray, profile_emb: jnp.ndarray,
                      logit_scale: jnp.ndarray, logit_bias: jnp.ndarray,
                      buckets: int = 1,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused bucketed SigLIP (semantics of ops.losses.siglip_loss)."""
    return _siglip_fwd(image_emb, profile_emb, logit_scale, logit_bias,
                       buckets, interpret)[0]


def _siglip_fwd(image_emb, profile_emb, logit_scale, logit_bias, buckets,
                interpret):
    b, d = image_emb.shape
    n = b // buckets
    i3 = image_emb.reshape(buckets, n, d)
    p3 = profile_emb.reshape(buckets, n, d)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(1, 1)
    bias = jnp.asarray(logit_bias, jnp.float32).reshape(1, 1)
    emb_spec, scalar_spec, out_spec = _bucket_specs(buckets, n, d)
    losses = pl.pallas_call(
        _siglip_fwd_kernel,
        grid=(buckets,),
        in_specs=[emb_spec, emb_spec, scalar_spec, scalar_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((buckets, 1), jnp.float32),
        interpret=interpret,
    )(i3, p3, scale, bias)
    loss = jnp.mean(losses)
    return loss, (image_emb, profile_emb, jnp.asarray(logit_scale),
                  jnp.asarray(logit_bias))


def _siglip_bwd(buckets, interpret, residuals, g):
    image_emb, profile_emb, logit_scale, logit_bias = residuals
    b, d = image_emb.shape
    n = b // buckets
    i3 = image_emb.reshape(buckets, n, d)
    p3 = profile_emb.reshape(buckets, n, d)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(1, 1)
    bias = jnp.asarray(logit_bias, jnp.float32).reshape(1, 1)
    gb = (jnp.asarray(g, jnp.float32) / buckets).reshape(1, 1)
    emb_spec, scalar_spec, out_spec = _bucket_specs(buckets, n, d)
    di, dp, ds, db = pl.pallas_call(
        _siglip_bwd_kernel,
        grid=(buckets,),
        in_specs=[emb_spec, emb_spec, scalar_spec, scalar_spec, scalar_spec],
        out_specs=(emb_spec, emb_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((buckets, n, d), image_emb.dtype),
            jax.ShapeDtypeStruct((buckets, n, d), profile_emb.dtype),
            jax.ShapeDtypeStruct((buckets, 1), jnp.float32),
            jax.ShapeDtypeStruct((buckets, 1), jnp.float32),
        ),
        interpret=interpret,
    )(i3, p3, scale, bias, gb)
    return (di.reshape(b, d), dp.reshape(b, d),
            jnp.sum(ds).astype(jnp.asarray(logit_scale).dtype),
            jnp.sum(db).astype(jnp.asarray(logit_bias).dtype))


siglip_loss_fused.defvjp(_siglip_fwd, _siglip_bwd)
