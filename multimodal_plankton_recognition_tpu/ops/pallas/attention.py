"""Fused multi-head self-attention Pallas TPU kernels.

Motivation (measured, docs/PERF.md): profiling the ViT-T + ProfileTransformer
flagship train step (scripts/xprof.py) shows ~19% of device time in pure
copy/transpose ops — the (B, L, H, D) head-split relayouts flax's
einsum-based ``nn.MultiHeadDotProductAttention`` induces — plus several ms
materializing the (B, H, L, L) attention probabilities in HBM between the
score matmul, softmax, dropout and the value matmul. Both transformer
families of this framework have tiny head dims (ViT-T: 3x64, the reference's
ProfileTransformer: 8x24 — reference src/profile_encoder.py:14-27), so the
per-head matmuls also run far below MXU efficiency (contraction dim 24 or
64 of the 128-wide systolic array).

Design — the per-head LANE-MASK trick: keep everything in the packed
``(L, E)`` layout (E = H*D lanes) and never split heads at all.

    S_h = (q * m_h) @ k^T          m_h = 1.0 on head h's lane block
    O   = sum_h drop(softmax(S_h * scale + bias)) @ (v * m_h)

Masking one operand of a full-width (K = E) contraction yields exactly the
head-h scores, because the other heads' lanes contribute zero. Every matmul
is then MXU-shaped (K = 192 instead of 24), there are NO transposes, NO
(B, H, L, L) HBM tensors (scores/probs live per-head in VMEM), and dropout
is generated in-kernel with the TPU PRNG. The whole (L, E) problem for one
sample fits comfortably in VMEM (L <= 225 here), so the grid is simply
``(B,)`` and softmax needs no online/flash accumulation — the backward
recomputes S_h from q/k (recompute-in-backward, same policy as
ops/pallas/contrastive.py) under ``jax.custom_vjp``.

Semantics match ``flax.linen.MultiHeadDotProductAttention`` (q scaled by
1/sqrt(D), pre-softmax additive key bias for padding masks, attention-prob
dropout with 1/(1-p) scaling); matmuls run in the input dtype with f32
accumulation (full MXU rate for the bf16 cards the module gates the kernel
to — an f32 upcast would quarter it) and softmax runs in f32 (flax runs it
in the module dtype — a strict precision improvement, covered by the parity
tests' tolerances). ``PLANKTON_SOFTMAX_BF16=1`` narrows the stacked
kernels' softmax chain + scratch round-trips to bf16 (probe lever, see
``_softmax_dtype``; measured outcome in docs/PERF.md r5). Dropout uses the kernel PRNG, so masks
differ from flax's host-keyed ones — dropout randomness carries no
reproducibility contract (the reference uses torch's RNG anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha_core", "mha_core_qkv", "mha_reference"]


def _head_mask(h: int, heads: int, e: int):
    """(1, E) f32: 1.0 on head h's lane block."""
    d = e // heads
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, e), 1)
    return ((lanes >= h * d) & (lanes < (h + 1) * d)).astype(jnp.float32)


def _uniform(shape):
    """f32 uniform [0, 1) from the seeded TPU PRNG."""
    bits = pltpu.prng_random_bits(shape)
    # logical shift down to 24 bits (Mosaic has no uint32->f32 cast, so
    # bitcast back to the now-positive int32 before converting)
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32) >> 8
    bits = jax.lax.bitcast_convert_type(bits, jnp.int32)
    return bits.astype(jnp.float32) * (1.0 / (1 << 24))


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref,
                *, heads: int, dropout_p: float, train: bool,
                narrow: bool, block_b: int, has_bias: bool = True):
    # Each grid step handles ``block_b`` samples (statically unrolled): one
    # sample is only ~1 µs of compute, so per-program overhead dominates a
    # (B,)-grid — batching samples amortizes it and gives the scheduler
    # independent head/sample work to overlap MXU matmuls with VPU softmax.
    base = pl.program_id(0) * block_b
    for i in range(block_b):
        # q/k/v stay in their input dtype: with bf16 inputs every dot below
        # is a full-rate MXU bf16 multiply with f32 accumulation
        # (preferred_element_type) — an f32 upcast would quarter the matmul
        # rate for no precision gain. Softmax runs in f32.
        q = q_ref[i]                                     # (L, E)
        k = k_ref[i]
        v = v_ref[i]
        l, e = q.shape
        d = e // heads
        scale = 1.0 / (d ** 0.5)
        bias = bias_ref[i]                               # (1, L) additive
        use_drop = train and dropout_p > 0.0

        acc = None if narrow else jnp.zeros((l, e), jnp.float32)
        parts = []
        for h in range(heads):
            if narrow:
                # static lane slices: matmuls carry exactly the useful FLOPs
                qh, kh = q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d]
                vh = v[:, h * d:(h + 1) * d]
                s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                mh = _head_mask(h, heads, e).astype(q.dtype)
                vh = v * mh.astype(v.dtype)
                s = jax.lax.dot_general(
                    q * mh, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (L, L) head-h
            z = s * scale + bias if has_bias else s * scale
            m = jnp.max(z, axis=1, keepdims=True)
            p = jnp.exp(z - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            if use_drop:
                pltpu.prng_seed(seed_ref[0, 0] + (base + i) * heads + h)
                keep = (_uniform((l, l)) >= dropout_p).astype(jnp.float32)
                p = p * keep * (1.0 / (1.0 - dropout_p))
            oh = jax.lax.dot_general(
                p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if narrow:
                parts.append(oh)
            else:
                acc = acc + oh
        if narrow:
            acc = jnp.concatenate(parts, axis=1)
        o_ref[i] = acc.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, do_ref,
                dq_ref, dk_ref, dv_ref, db_ref,
                *, heads: int, dropout_p: float, train: bool,
                narrow: bool, block_b: int, has_bias: bool = True):
    base = pl.program_id(0) * block_b
    for i in range(block_b):
        # input dtype throughout the dots (see _fwd_kernel): bf16 inputs
        # keep every matmul at full MXU rate; f32 only in softmax/dz land
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        do = do_ref[i]                                   # (L, E) bf16
        l, e = q.shape
        d = e // heads
        scale = 1.0 / (d ** 0.5)
        bias = bias_ref[i]                               # (1, L)
        use_drop = train and dropout_p > 0.0

        if not narrow:
            dq = jnp.zeros((l, e), jnp.float32)
            dk = jnp.zeros((l, e), jnp.float32)
            dv = jnp.zeros((l, e), jnp.float32)
        # bias enters every head's pre-softmax scores: d bias[key] =
        # sum over heads and query rows of dz (2-D axis-0 keepdims sum —
        # the Mosaic-safe reduction pattern, see ops/pallas/experimental/mbconv.py)
        db = jnp.zeros((1, l), jnp.float32)
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(heads):
            if narrow:
                qm = q[:, h * d:(h + 1) * d]
                kh = k[:, h * d:(h + 1) * d]
                vh = v[:, h * d:(h + 1) * d]
                do_m = do[:, h * d:(h + 1) * d]
            else:
                mh = _head_mask(h, heads, e).astype(q.dtype)
                qm = q * mh
                kh = k * mh.astype(k.dtype)
                vh = v
                do_m = do * mh.astype(do.dtype)
            s = jax.lax.dot_general(qm, kh if narrow else k,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z = s * scale + bias if has_bias else s * scale
            m = jnp.max(z, axis=1, keepdims=True)
            p = jnp.exp(z - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            # dPd = (dO of head h) @ v^T — masked lanes give 0 in mask mode
            dpd = jax.lax.dot_general(do_m, vh, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            if use_drop:
                pltpu.prng_seed(seed_ref[0, 0] + (base + i) * heads + h)
                keep = (_uniform((l, l)) >= dropout_p).astype(jnp.float32)
                pd = p * keep * (1.0 / (1.0 - dropout_p))
                dp = dpd * keep * (1.0 / (1.0 - dropout_p))
            else:
                pd = p
                dp = dpd
            dz = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            if has_bias:  # a zero bias needs no (L,L)->(1,L) reduce per head
                db = db + jnp.sum(dz, axis=0, keepdims=True)
            ds = (dz * scale).astype(q.dtype)
            dq_h = jax.lax.dot_general(ds, kh, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dk_h = jax.lax.dot_general(ds, qm, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dv_h = jax.lax.dot_general(
                pd.astype(do_m.dtype), do_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if narrow:
                dq_parts.append(dq_h)
                dk_parts.append(dk_h)
                dv_parts.append(dv_h)
            else:
                dq = dq + dq_h
                dk = dk + dk_h
                dv = dv + dv_h
        if narrow:
            dq = jnp.concatenate(dq_parts, axis=1)
            dk = jnp.concatenate(dk_parts, axis=1)
            dv = jnp.concatenate(dv_parts, axis=1)
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)
        db_ref[i] = db


def _rup8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _softmax_dtype():
    """``PLANKTON_SOFTMAX_BF16=1`` runs the stacked kernels' softmax chain
    — and both (H*L8, L) scratch round-trips — in bf16 instead of f32
    (VERDICT r4 #2's last named lever, the "bf16 softmax probe"). Scores
    still ACCUMULATE in f32 on the MXU (preferred_element_type) and only
    narrow on the scratch store, so the max-subtraction stays exact in the
    accumulated value; exp/sum/divide then carry bf16's ~3 decimal digits.
    Probe knob, read at trace time; measured outcome in docs/PERF.md r5."""
    import os
    return (jnp.bfloat16
            if os.environ.get("PLANKTON_SOFTMAX_BF16") == "1"
            else jnp.float32)


def _fwd_kernel_stacked(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref,
                        z_scratch,
                        *, heads: int, dropout_p: float, train: bool,
                        block_b: int, has_bias: bool = True):
    """Stacked-softmax variant of _fwd_kernel (narrow head slices): all
    heads' (L, L) scores land in one (H*L8, L) scratch so the softmax and
    dropout VPU chains run ONCE per sample on a big tensor instead of H
    times on small ones — the per-op floor blamed the per-head VPU
    serialization for most of the attention kernel's gap to its matmul
    floor (docs/PERF.md r3). Per-head rows sit at 8-aligned offsets
    h*L8; the L8-L pad rows hold garbage that no consumer ever slices.
    """
    base = pl.program_id(0) * block_b
    l8 = z_scratch.shape[0] // heads
    for i in range(block_b):
        q = q_ref[i]                                     # (L, E)
        k = k_ref[i]
        v = v_ref[i]
        l, e = q.shape
        d = e // heads
        scale = 1.0 / (d ** 0.5)
        bias = bias_ref[i]                               # (1, L)
        use_drop = train and dropout_p > 0.0

        for h in range(heads):
            qh, kh = q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z_scratch[h * l8:h * l8 + l, :] = \
                (s * scale + bias if has_bias
                 else s * scale).astype(z_scratch.dtype)
        z = z_scratch[...]                               # (H*L8, L)
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        if use_drop:
            pltpu.prng_seed(seed_ref[0, 0] + base + i)
            keep = (_uniform(p.shape) >= dropout_p).astype(p.dtype)
            p = p * keep * (1.0 / (1.0 - dropout_p))
        p = p.astype(v.dtype)
        parts = []
        for h in range(heads):
            vh = v[:, h * d:(h + 1) * d]
            parts.append(jax.lax.dot_general(
                p[h * l8:h * l8 + l, :], vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_ref[i] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def _bwd_kernel_stacked(q_ref, k_ref, v_ref, bias_ref, seed_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, db_ref,
                        z_scratch, dp_scratch,
                        *, heads: int, dropout_p: float, train: bool,
                        block_b: int, has_bias: bool = True):
    base = pl.program_id(0) * block_b
    l8 = z_scratch.shape[0] // heads
    for i in range(block_b):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        do = do_ref[i]
        l, e = q.shape
        d = e // heads
        scale = 1.0 / (d ** 0.5)
        bias = bias_ref[i]
        use_drop = train and dropout_p > 0.0

        for h in range(heads):
            qh, kh = q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d]
            vh = v[:, h * d:(h + 1) * d]
            do_h = do[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z_scratch[h * l8:h * l8 + l, :] = \
                (s * scale + bias if has_bias
                 else s * scale).astype(z_scratch.dtype)
            dp_scratch[h * l8:h * l8 + l, :] = jax.lax.dot_general(
                do_h, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dp_scratch.dtype)
        z = z_scratch[...]
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        dpd = dp_scratch[...]
        if use_drop:
            pltpu.prng_seed(seed_ref[0, 0] + base + i)
            keep = (_uniform(p.shape) >= dropout_p).astype(p.dtype)
            inv = 1.0 / (1.0 - dropout_p)
            pd = p * keep * inv
            dp = dpd * keep * inv
        else:
            pd = p
            dp = dpd
        dz = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        ds_all = (dz * scale).astype(q.dtype)
        pd = pd.astype(do.dtype)

        db = jnp.zeros((1, l), jnp.float32)
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(heads):
            qh, kh = q[:, h * d:(h + 1) * d], k[:, h * d:(h + 1) * d]
            do_h = do[:, h * d:(h + 1) * d]
            ds = ds_all[h * l8:h * l8 + l, :]
            pd_h = pd[h * l8:h * l8 + l, :]
            if has_bias:
                db = db + jnp.sum(dz[h * l8:h * l8 + l, :], axis=0,
                                  keepdims=True)
            dq_parts.append(jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dk_parts.append(jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dv_parts.append(jax.lax.dot_general(
                pd_h, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        dq_ref[i] = jnp.concatenate(dq_parts, axis=1).astype(dq_ref.dtype)
        dk_ref[i] = jnp.concatenate(dk_parts, axis=1).astype(dk_ref.dtype)
        dv_ref[i] = jnp.concatenate(dv_parts, axis=1).astype(dv_ref.dtype)
        db_ref[i] = db


def _fwd_kernel_stacked_qkv(qkv_ref, bias_ref, seed_ref, o_ref, z_scratch,
                            *, heads: int, dropout_p: float, train: bool,
                            block_b: int, has_bias: bool = True):
    """_fwd_kernel_stacked on ONE packed (bb, L, 3E) operand (q|k|v along
    lanes): the module computes q/k/v as a single (B·L, E_in)x(E_in, 3E)
    GEMM — one MXU call at 3x the N width (E=192 is narrow for the 128-wide
    array) and ONE XLA<->Pallas layout bridge instead of three (VERDICT r4
    #2 lever). In-kernel head extraction is unchanged: static lane slices
    at offset g*E + h*D."""
    base = pl.program_id(0) * block_b
    l8 = z_scratch.shape[0] // heads
    for i in range(block_b):
        qkv = qkv_ref[i]                                 # (L, 3E)
        l, e3 = qkv.shape
        e = e3 // 3
        d = e // heads
        scale = 1.0 / (d ** 0.5)
        bias = bias_ref[i]                               # (1, L)
        use_drop = train and dropout_p > 0.0

        for h in range(heads):
            qh = qkv[:, h * d:(h + 1) * d]
            kh = qkv[:, e + h * d:e + (h + 1) * d]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z_scratch[h * l8:h * l8 + l, :] = \
                (s * scale + bias if has_bias
                 else s * scale).astype(z_scratch.dtype)
        z = z_scratch[...]                               # (H*L8, L)
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        if use_drop:
            pltpu.prng_seed(seed_ref[0, 0] + base + i)
            keep = (_uniform(p.shape) >= dropout_p).astype(p.dtype)
            p = p * keep * (1.0 / (1.0 - dropout_p))
        p = p.astype(qkv.dtype)
        parts = []
        for h in range(heads):
            vh = qkv[:, 2 * e + h * d:2 * e + (h + 1) * d]
            parts.append(jax.lax.dot_general(
                p[h * l8:h * l8 + l, :], vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_ref[i] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def _bwd_kernel_stacked_qkv(qkv_ref, bias_ref, seed_ref, do_ref,
                            dqkv_ref, db_ref, z_scratch, dp_scratch,
                            *, heads: int, dropout_p: float, train: bool,
                            block_b: int, has_bias: bool = True):
    """Backward of _fwd_kernel_stacked_qkv: identical math to
    _bwd_kernel_stacked, with the three cotangents emitted as ONE packed
    (bb, L, 3E) dqkv — one bridge out, feeding the single packed-GEMM
    transpose in the module."""
    base = pl.program_id(0) * block_b
    l8 = z_scratch.shape[0] // heads
    for i in range(block_b):
        qkv = qkv_ref[i]
        do = do_ref[i]
        l, e3 = qkv.shape
        e = e3 // 3
        d = e // heads
        scale = 1.0 / (d ** 0.5)
        bias = bias_ref[i]
        use_drop = train and dropout_p > 0.0

        for h in range(heads):
            qh = qkv[:, h * d:(h + 1) * d]
            kh = qkv[:, e + h * d:e + (h + 1) * d]
            vh = qkv[:, 2 * e + h * d:2 * e + (h + 1) * d]
            do_h = do[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z_scratch[h * l8:h * l8 + l, :] = \
                (s * scale + bias if has_bias
                 else s * scale).astype(z_scratch.dtype)
            dp_scratch[h * l8:h * l8 + l, :] = jax.lax.dot_general(
                do_h, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dp_scratch.dtype)
        z = z_scratch[...]
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        dpd = dp_scratch[...]
        if use_drop:
            pltpu.prng_seed(seed_ref[0, 0] + base + i)
            keep = (_uniform(p.shape) >= dropout_p).astype(p.dtype)
            inv = 1.0 / (1.0 - dropout_p)
            pd = p * keep * inv
            dp = dpd * keep * inv
        else:
            pd = p
            dp = dpd
        dz = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        ds_all = (dz * scale).astype(qkv.dtype)
        pd = pd.astype(do.dtype)

        db = jnp.zeros((1, l), jnp.float32)
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(heads):
            qh = qkv[:, h * d:(h + 1) * d]
            kh = qkv[:, e + h * d:e + (h + 1) * d]
            do_h = do[:, h * d:(h + 1) * d]
            ds = ds_all[h * l8:h * l8 + l, :]
            pd_h = pd[h * l8:h * l8 + l, :]
            if has_bias:
                db = db + jnp.sum(dz[h * l8:h * l8 + l, :], axis=0,
                                  keepdims=True)
            dq_parts.append(jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dk_parts.append(jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dv_parts.append(jax.lax.dot_general(
                pd_h, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        dqkv_ref[i] = jnp.concatenate(
            dq_parts + dk_parts + dv_parts, axis=1).astype(dqkv_ref.dtype)
        db_ref[i] = db


def _pick_block_b(b: int, limit: int = 4) -> int:
    """Largest power-of-two divisor of ``b`` up to ``limit`` (VMEM budget:
    ~10 (block_b, L, E) blocks double-buffered ≈ 1.7·block_b MB at L=225,
    E=192 — block_b=4 stays well under the ~16 MB VMEM).
    ``PLANKTON_ATTN_BLOCK_B`` is a perf-probe override knob; malformed or
    out-of-budget values are ignored (capped at 8) so a stale export can
    not break or VMEM-OOM a training run."""
    import os
    try:
        limit = min(int(os.environ.get("PLANKTON_ATTN_BLOCK_B", limit)), 8)
    except ValueError:
        pass
    bb = 1
    while bb * 2 <= limit and b % (bb * 2) == 0:
        bb *= 2
    return bb


def _specs(l, e, bb):
    emb = pl.BlockSpec((bb, l, e), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    # bias rides as (B, 1, L) so the block's trailing dims (1, L) equal the
    # array's (Mosaic requires tile-divisible or full trailing block dims)
    bias = pl.BlockSpec((bb, 1, l), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    return emb, bias, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def mha_core(q, k, v, bias_rows, seed,
             heads: int, dropout_p: float = 0.0, train: bool = False,
             interpret: bool = False, narrow: bool = True,
             has_bias: bool = True, stacked: bool = False):
    """Fused multi-head self-attention on packed (B, L, E) q/k/v.

    ``bias_rows``: (B, L) f32 additive pre-softmax key bias (0 for attend,
    a large negative for padded keys). ``seed``: int32 scalar array for the
    in-kernel dropout PRNG (ignored unless train and dropout_p > 0).
    Returns (B, L, E) in q's dtype. ``narrow=True`` (default) extracts
    heads with static lane slices so every matmul carries exactly the
    useful FLOPs; ``narrow=False`` uses the lane-mask full-width
    contractions (kept for comparison — see docs/PERF.md measurements).
    ``has_bias=False`` declares ``bias_rows`` identically zero (the
    unmasked image-encoder attention): the kernels then skip the per-head
    (L, L) bias add in forward AND the per-head (L, L)->(1, L) bias-grad
    reduction in backward, and the cotangent is zeros by construction.
    ``stacked=True`` lands every head's scores in one (H*L8, L) scratch so
    softmax/dropout run once per sample on a big tensor instead of H
    per-head VPU chains (implies the narrow head slices; dropout masks
    differ from the unstacked kernel — per-sample instead of per-(sample,
    head) PRNG streams, still no reproducibility contract).
    """
    return _mha_fwd(q, k, v, bias_rows, seed, heads, dropout_p, train,
                    interpret, narrow, has_bias, stacked)[0]


def _mha_fwd(q, k, v, bias_rows, seed, heads, dropout_p, train, interpret,
             narrow=True, has_bias=True, stacked=False):
    b, l, e = q.shape
    bb = _pick_block_b(b)
    emb, bias_spec, seed_spec = _specs(l, e, bb)
    if stacked:
        kernel = functools.partial(_fwd_kernel_stacked, heads=heads,
                                   dropout_p=dropout_p, train=train,
                                   block_b=bb, has_bias=has_bias)
        scratch = [pltpu.VMEM((heads * _rup8(l), l), _softmax_dtype())]
    else:
        kernel = functools.partial(_fwd_kernel, heads=heads,
                                   dropout_p=dropout_p, train=train,
                                   narrow=narrow, block_b=bb,
                                   has_bias=has_bias)
        scratch = []
    o = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[emb, emb, emb, bias_spec, seed_spec],
        out_specs=emb,
        out_shape=jax.ShapeDtypeStruct((b, l, e), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v, jnp.asarray(bias_rows, jnp.float32).reshape(b, 1, l),
      jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return o, (q, k, v, bias_rows, seed)


def _mha_bwd(heads, dropout_p, train, interpret, narrow, has_bias, stacked,
             residuals, g):
    q, k, v, bias_rows, seed = residuals
    b, l, e = q.shape
    bb = _pick_block_b(b)
    emb, bias_spec, seed_spec = _specs(l, e, bb)
    if stacked:
        kernel = functools.partial(_bwd_kernel_stacked, heads=heads,
                                   dropout_p=dropout_p, train=train,
                                   block_b=bb, has_bias=has_bias)
        scratch = [pltpu.VMEM((heads * _rup8(l), l), _softmax_dtype()),
                   pltpu.VMEM((heads * _rup8(l), l), _softmax_dtype())]
    else:
        kernel = functools.partial(_bwd_kernel, heads=heads,
                                   dropout_p=dropout_p, train=train,
                                   narrow=narrow, block_b=bb,
                                   has_bias=has_bias)
        scratch = []
    dq, dk, dv, db = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[emb, emb, emb, bias_spec, seed_spec, emb],
        out_specs=(emb, emb, emb, bias_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, e), q.dtype),
            jax.ShapeDtypeStruct((b, l, e), k.dtype),
            jax.ShapeDtypeStruct((b, l, e), v.dtype),
            jax.ShapeDtypeStruct((b, 1, l), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v, jnp.asarray(bias_rows, jnp.float32).reshape(b, 1, l),
      jnp.asarray(seed, jnp.int32).reshape(1, 1),
      g.astype(q.dtype))
    import numpy as np
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    db = db.reshape(jnp.shape(bias_rows)).astype(
        jnp.result_type(bias_rows))
    return dq, dk, dv, db, dseed


mha_core.defvjp(_mha_fwd, _mha_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def mha_core_qkv(qkv, bias_rows, seed,
                 heads: int, dropout_p: float = 0.0, train: bool = False,
                 interpret: bool = False, has_bias: bool = True):
    """Stacked-softmax attention on ONE packed (B, L, 3E) operand.

    Same math and dropout streams as ``mha_core(..., stacked=True)`` with
    q|k|v concatenated along lanes — the module computes the three
    projections as a single (B·L, E_in)x(E_in, 3E) GEMM, so XLA sees one
    MXU call (3x the N width at these narrow dims) and ONE layout bridge
    into / out of the kernel instead of three each way (VERDICT r4 #2).
    Returns (B, L, E). Backward emits a packed (B, L, 3E) dqkv feeding the
    packed GEMM's transpose directly."""
    return _mha_qkv_fwd(qkv, bias_rows, seed, heads, dropout_p, train,
                        interpret, has_bias)[0]


def _mha_qkv_fwd(qkv, bias_rows, seed, heads, dropout_p, train, interpret,
                 has_bias=True):
    b, l, e3 = qkv.shape
    e = e3 // 3
    bb = _pick_block_b(b)
    _, bias_spec, seed_spec = _specs(l, e, bb)
    packed = pl.BlockSpec((bb, l, e3), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    emb = pl.BlockSpec((bb, l, e), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel_stacked_qkv, heads=heads,
                               dropout_p=dropout_p, train=train,
                               block_b=bb, has_bias=has_bias)
    o = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[packed, bias_spec, seed_spec],
        out_specs=emb,
        out_shape=jax.ShapeDtypeStruct((b, l, e), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((heads * _rup8(l), l), _softmax_dtype())],
        interpret=interpret,
    )(qkv, jnp.asarray(bias_rows, jnp.float32).reshape(b, 1, l),
      jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return o, (qkv, bias_rows, seed)


def _mha_qkv_bwd(heads, dropout_p, train, interpret, has_bias,
                 residuals, g):
    qkv, bias_rows, seed = residuals
    b, l, e3 = qkv.shape
    e = e3 // 3
    bb = _pick_block_b(b)
    _, bias_spec, seed_spec = _specs(l, e, bb)
    packed = pl.BlockSpec((bb, l, e3), lambda gi: (gi, 0, 0),
                          memory_space=pltpu.VMEM)
    emb = pl.BlockSpec((bb, l, e), lambda gi: (gi, 0, 0),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel_stacked_qkv, heads=heads,
                               dropout_p=dropout_p, train=train,
                               block_b=bb, has_bias=has_bias)
    dqkv, db = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[packed, bias_spec, seed_spec, emb],
        out_specs=(packed, bias_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, e3), qkv.dtype),
            jax.ShapeDtypeStruct((b, 1, l), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((heads * _rup8(l), l), _softmax_dtype()),
                        pltpu.VMEM((heads * _rup8(l), l), _softmax_dtype())],
        interpret=interpret,
    )(qkv, jnp.asarray(bias_rows, jnp.float32).reshape(b, 1, l),
      jnp.asarray(seed, jnp.int32).reshape(1, 1),
      g.astype(qkv.dtype))
    import numpy as np
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    db = db.reshape(jnp.shape(bias_rows)).astype(jnp.result_type(bias_rows))
    return dqkv, db, dseed


mha_core_qkv.defvjp(_mha_qkv_fwd, _mha_qkv_bwd)


def mha_reference(q, k, v, bias_rows, heads: int):
    """Plain-jnp composition with the kernel's exact semantics (no dropout):
    the oracle for parity tests and the non-TPU fallback path."""
    b, l, e = q.shape
    d = e // heads
    scale = 1.0 / (d ** 0.5)
    qh = q.astype(jnp.float32).reshape(b, l, heads, d)
    kh = k.astype(jnp.float32).reshape(b, l, heads, d)
    vh = v.reshape(b, l, heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    s = s + jnp.asarray(bias_rows, jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), vh)
    return o.reshape(b, l, e).astype(q.dtype)
