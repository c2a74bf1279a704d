"""Fused transformer feed-forward (Dense -> act -> dropout -> Dense) Pallas
TPU kernels.

Motivation (measured, docs/PERF.md): after the fused attention landed, the
per-op trace of the ViT-T + ProfileTransformer flagship shows the next
biggest consumers are the FFN round trips — the (B, L, 2024) hidden
activation is written by the first matmul, re-read and re-written by the
bias+GELU+dropout fusion (with its own (B, L, 2024) rng-bit tensor), and
re-read by the second matmul, in forward AND backward. Here the hidden
tensor lives only in VMEM: one (L, F) tile per sample (225x2024 f32 =
1.8 MB), both weight matrices resident (E*F bf16 = 0.78 MB each), dropout
drawn from the per-core TPU PRNG with a deterministic (seed, sample)
schedule so the backward regenerates the same mask while recomputing the
hidden activation (recompute-in-backward, the same policy as
ops/pallas/attention.py).

Weight/bias gradients are global sums over samples: the TPU grid is
sequential, so they accumulate in full-array output blocks across grid
steps (zeroed at step 0 — the pattern proven in ops/pallas/experimental/mbconv.py's
projection-gradient accumulators).

Semantics match the unfused path in models/profile/transformer.py /
models/image/vit.py: y = W2 @ drop(act(W1 @ x + b1)) + b2 with flax's
``nn.gelu`` (tanh approximation) or relu; the trailing residual dropout
stays outside (it is elementwise on the narrow (L, E) output and fuses
fine in XLA). bf16 matmul inputs with f32 accumulation, activation math in
f32 rounded through bf16 at the same points as the unfused module.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ffn_core", "ffn_reference"]

_C = 0.7978845608028654  # sqrt(2/pi), flax nn.gelu tanh approximation


def _bf(x):
    return x.astype(jnp.bfloat16)


def _r(x):
    """Round through bf16 — matches the unfused path's op boundaries."""
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _act(z, kind: str):
    if kind == "relu":
        return jnp.maximum(z, 0.0)
    u = _C * (z + 0.044715 * z * z * z)
    return 0.5 * z * (1.0 + jnp.tanh(u))


def _dact(z, kind: str):
    if kind == "relu":
        return (z > 0.0).astype(jnp.float32)
    u = _C * (z + 0.044715 * z * z * z)
    t = jnp.tanh(u)
    return 0.5 * (1.0 + t) \
        + 0.5 * z * (1.0 - t * t) * _C * (1.0 + 3 * 0.044715 * z * z)


def _uniform(shape):
    bits = pltpu.prng_random_bits(shape)
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32) >> 8
    bits = jax.lax.bitcast_convert_type(bits, jnp.int32)
    return bits.astype(jnp.float32) * (1.0 / (1 << 24))


def _rup8(n: int) -> int:
    return -(-n // 8) * 8


def _pick_bt(batch: int, l8: int, f: int,
             budget: int = 40 * 1024 * 1024) -> int:
    """Largest power-of-2 divisor of batch whose ~4 live f32 hidden tiles
    fit the VMEM budget."""
    bt = 1
    per = l8 * f * 4 * 4
    while bt * 2 <= batch and batch % (bt * 2) == 0 \
            and (bt * 2) * per <= budget:
        bt *= 2
    return bt


def _flat(stage_ref, x4, l_valid):
    """(bt, L, E) -> aligned (bt*L8, E) via a zero-padded scratch; padded
    rows are exactly zero so every reduction over rows stays exact."""
    stage_ref[...] = jnp.zeros_like(stage_ref)
    stage_ref[:, :l_valid, :] = x4.astype(stage_ref.dtype)
    bt, l8, e = stage_ref.shape
    return stage_ref[...].reshape(bt * l8, e)


def _hidden(flat_x, w1_ref, b1_ref, seed_ref, t, *, activation, dropout_p,
            train):
    """(h_pre f32, hd bf16) on the flat (R, E) view; recomputable chain
    shared between forward and backward (same (seed, tile) PRNG stream)."""
    h_pre = _r(jax.lax.dot_general(
        _bf(flat_x), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...])
    h = _r(_act(h_pre, activation))
    if train and dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + t)
        keep = (_uniform(h.shape) >= dropout_p).astype(jnp.float32)
        h = h * keep * (1.0 / (1.0 - dropout_p))
    return h_pre, _bf(h)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, y_ref,
                xstage_ref,
                *, activation: str, dropout_p: float, train: bool):
    t = pl.program_id(0)
    bt, l, e = x_ref.shape
    l8 = xstage_ref.shape[1]
    flat_x = _flat(xstage_ref, x_ref[...], l)
    _, hd = _hidden(flat_x, w1_ref, b1_ref, seed_ref, t,
                    activation=activation, dropout_p=dropout_p,
                    train=train)
    y = jax.lax.dot_general(hd, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
        + b2_ref[...]
    y_ref[...] = y.reshape(bt, l8, e)[:, :l, :].astype(y_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                xstage_ref, dstage_ref,
                *, activation: str, dropout_p: float, train: bool):
    t = pl.program_id(0)
    bt, l, e = x_ref.shape
    l8 = xstage_ref.shape[1]
    flat_x = _flat(xstage_ref, x_ref[...], l)
    flat_dy = _bf(_flat(dstage_ref, dy_ref[...], l))      # pad rows 0
    h_pre, hd = _hidden(flat_x, w1_ref, b1_ref, seed_ref, t,
                        activation=activation, dropout_p=dropout_p,
                        train=train)

    @pl.when(t == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    db2_ref[...] += jnp.sum(flat_dy.astype(jnp.float32), axis=0,
                            keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        hd, flat_dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dhd = jax.lax.dot_general(flat_dy, w2_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if train and dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + t)
        keep = (_uniform(dhd.shape) >= dropout_p).astype(jnp.float32)
        dhd = dhd * keep * (1.0 / (1.0 - dropout_p))
    dpre = dhd * _dact(h_pre, activation)                 # pad rows 0 (dhd)
    db1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(
        _bf(flat_x), _bf(dpre), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = jax.lax.dot_general(_bf(dpre), w1_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.reshape(bt, l8, e)[:, :l, :].astype(dx_ref.dtype)


def _specs(bt, l, e, f):
    emb = pl.BlockSpec((bt, l, e), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    w1 = pl.BlockSpec((e, f), lambda b: (0, 0), memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((f, e), lambda b: (0, 0), memory_space=pltpu.VMEM)
    row_f = pl.BlockSpec((1, f), lambda b: (0, 0), memory_space=pltpu.VMEM)
    row_e = pl.BlockSpec((1, e), lambda b: (0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    return emb, w1, w2, row_f, row_e, seed


_VMEM_LIMIT = 100 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def ffn_core(x, w1, b1, w2, b2, seed,
             activation: str = "gelu", dropout_p: float = 0.0,
             train: bool = False, interpret: bool = False):
    """Fused Dense(E->F) -> act -> dropout -> Dense(F->E) on (B, L, E).

    ``seed``: int32 scalar for the in-kernel dropout PRNG (ignored unless
    train and dropout_p > 0). Returns (B, L, E) in x's dtype.
    """
    return _ffn_fwd(x, w1, b1, w2, b2, seed,
                    activation, dropout_p, train, interpret)[0]


def _prep(w1, b1, w2, b2):
    return (_bf(w1), jnp.asarray(b1, jnp.float32).reshape(1, -1),
            _bf(w2), jnp.asarray(b2, jnp.float32).reshape(1, -1))


def _ffn_fwd(x, w1, b1, w2, b2, seed, activation, dropout_p, train,
             interpret):
    bsz, l, e = x.shape
    f = w1.shape[1]
    l8 = _rup8(l)
    bt = _pick_bt(bsz, l8, f)
    emb, w1s, w2s, row_f, row_e, seed_s = _specs(bt, l, e, f)
    kernel = functools.partial(_fwd_kernel, activation=activation,
                               dropout_p=dropout_p, train=train)
    y = pl.pallas_call(
        kernel,
        grid=(bsz // bt,),
        in_specs=[emb, w1s, row_f, w2s, row_e, seed_s],
        out_specs=emb,
        out_shape=jax.ShapeDtypeStruct((bsz, l, e), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, l8, e), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x, *_prep(w1, b1, w2, b2),
      jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return y, (x, w1, b1, w2, b2, seed)


def _ffn_bwd(activation, dropout_p, train, interpret, residuals, g):
    x, w1, b1, w2, b2, seed = residuals
    bsz, l, e = x.shape
    f = w1.shape[1]
    l8 = _rup8(l)
    bt = _pick_bt(bsz, l8, f)
    emb, w1s, w2s, row_f, row_e, seed_s = _specs(bt, l, e, f)
    kernel = functools.partial(_bwd_kernel, activation=activation,
                               dropout_p=dropout_p, train=train)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid=(bsz // bt,),
        in_specs=[emb, w1s, row_f, w2s, row_e, seed_s, emb],
        out_specs=(emb, w1s, row_f, w2s, row_e),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, l, e), x.dtype),
            jax.ShapeDtypeStruct((e, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bt, l8, e), jnp.bfloat16),
                        pltpu.VMEM((bt, l8, e), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x, *_prep(w1, b1, w2, b2),
      jnp.asarray(seed, jnp.int32).reshape(1, 1), g.astype(x.dtype))
    import numpy as np
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return (dx,
            dw1.astype(jnp.asarray(w1).dtype),
            db1.reshape(jnp.shape(b1)).astype(jnp.asarray(b1).dtype),
            dw2.astype(jnp.asarray(w2).dtype),
            db2.reshape(jnp.shape(b2)).astype(jnp.asarray(b2).dtype),
            dseed)


ffn_core.defvjp(_ffn_fwd, _ffn_bwd)


def ffn_reference(x, w1, b1, w2, b2, activation: str = "gelu"):
    """Plain-jnp composition with the kernel's semantics (no dropout):
    the oracle for parity tests and the non-TPU fallback path."""
    xf = x.astype(jnp.bfloat16)
    h_pre = _r(jnp.dot(xf, _bf(w1), preferred_element_type=jnp.float32)
               + jnp.asarray(b1, jnp.float32))
    h = _bf(_r(_act(h_pre, activation)))
    y = jnp.dot(h, _bf(w2), preferred_element_type=jnp.float32) \
        + jnp.asarray(b2, jnp.float32)
    return y.astype(x.dtype)
