"""Fused MBConv (inverted-bottleneck) Pallas TPU kernels.

Motivation (measured, VERDICT r1 #2): the EfficientNet-B0 train step is
HBM-bandwidth-bound — XLA's own cost analysis reports ~43 GB accessed per
bs-256 step (~53 ms at the v5e's 819 GB/s, matching the measured 59 ms),
while the FLOPs would take ~4 ms. The traffic is round-trips of the
6x-expanded MBConv intermediates (e.g. 112x112x96) between every conv,
BatchNorm reduction, and activation; ablation probes (scripts/perf_ablate.py)
attribute ~19 ms to the depthwise convs, ~10 ms to BN train statistics and
~6 ms to squeeze-excite. XLA cannot fuse across convolutions, so the fix is
a kernel that keeps the expanded tensors in VMEM.

Block semantics fused here (reference: timm efficientnet MBConv, mirrored by
models/image/efficientnet.py::_MBConv):

    y1 = conv1x1(x, w_exp)                  # skipped when expand_ratio == 1
    a1 = silu(batchnorm(y1))                # train-mode batch statistics
    y2 = depthwise_conv_kxk(a1)             # stride 1 (stride 2 -> XLA path)
    a2 = silu(batchnorm(y2))
    a3 = a2 * sigmoid(W_e @ silu(W_r @ mean_hw(a2) + b_r) + b_e)   # SE
    y3 = conv1x1(a3, w_proj)
    out = batchnorm(y3) (+ x)               # stays in XLA (elementwise)

Kernel structure (the TPU grid is sequential, phase-major):

* ``KA`` (2 phases over batch tiles): phase 0 computes the expand matmul per
  tile and accumulates BN1 batch statistics WITHOUT writing y1; phase 1
  recomputes the expand (the MXU is ~95% idle here, HBM is not), applies
  BN1+SiLU in VMEM, runs the depthwise conv as k^2 shifted multiply-adds on
  the VPU, and writes only y2 + BN2 statistics. The expanded tensor never
  touches HBM.
* ``KB`` (1 phase): BN2+SiLU, squeeze-excite (per-sample, local to the
  tile), projection matmul; writes y3 + BN3 statistics.
* BN3-apply + residual add remain plain XLA (fusable elementwise).

Backward is a mirrored pair of 2-phase kernels (global reductions for the
BN/SE/weight gradients first, then the apply pass), wired as
``jax.custom_vjp`` on ``mbconv_core``. Gradients through the returned batch
statistics (used by the XLA-side BN3) are folded in exactly:
d_y3 += d_mean3/N + 2*(y3-mean3)*d_var3/N.

All in-kernel reductions and broadcast operands are kept 2-D ((1, C) rows) —
Mosaic layouts for 1-D vectors are fragile (same lesson as
ops/pallas/contrastive.py). Running-stats updates use the returned batch
mean/var exactly like flax.linen.BatchNorm (biased variance, f32 stats).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5  # flax.linen.BatchNorm default epsilon

#: scoped-VMEM ceiling for these kernels. The default 16 MB limit OOMs on
#: the backward (Mosaic keeps ~10 f32 temporaries of the expanded tile
#: live); the v5e has far more physical VMEM, and tiles are sized by
#: _pick_batch_tile so ~10-12x the tile stays under this.
_VMEM_LIMIT = 100 * 1024 * 1024


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _r(x):
    """Round through bfloat16 — an XLA op boundary in the unfused path.
    Matching flax's rounding points (BN output before SiLU, conv+bias
    before the SE activations) keeps fused vs unfused drift at bf16-noise
    level instead of compounding across 16 blocks."""
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _dsilu(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _pick_batch_tile(batch: int, per_img_bytes: int,
                     budget: int = 3 * 1024 * 1024) -> int:
    """Largest power-of-2 divisor of ``batch`` whose tile fits the VMEM
    budget (Pallas double-buffers blocks, so keep headroom under the
    ~16 MB/core VMEM)."""
    bt = 1
    while bt * 2 <= batch and batch % (bt * 2) == 0 \
            and (bt * 2) * per_img_bytes <= budget:
        bt *= 2
    return bt


# ---------------------------------------------------------------------------
# in-kernel helpers
#
# Mosaic constraints discovered on hardware (v5e, 2026-08):
#   * reshapes may only collapse/split leading dims when the innermost
#     collapsed (sublane) dim is 8-aligned — (4,7,7,C)->(196,C) is rejected;
#   * reductions over middle axes of rank-4 vectors hit unsupported
#     relayouts ("non-singleton dimension is replicated").
# The kernels therefore do ALL matmuls/reductions/elementwise-BN math on
# 2-D (R, C) views obtained by staging through a zero-padded
# (bt, h, W8, c) VMEM scratch (W8 = next multiple of 8, so the flatten is
# an aligned no-op), with per-row validity masks / per-sample selector
# matrices built from 2-D iota. Rank-4 values appear only in the depthwise
# conv's statically-shifted slices, which Mosaic handles.
# ---------------------------------------------------------------------------

def _rup8(n: int) -> int:
    return -(-n // 8) * 8


def _stage4(stage_ref, x4, w_valid: int):
    """Zero the (bt, h, W8, c) scratch, store x4 into its valid columns and
    return the aligned 2-D flat view (bt*h*W8, c)."""
    stage_ref[...] = jnp.zeros_like(stage_ref)
    stage_ref[:, :, :w_valid, :] = x4.astype(stage_ref.dtype)
    bt, h, w8, c = stage_ref.shape
    return stage_ref[...].reshape(bt * h * w8, c)


def _to4(flat, bt, h, w8, w):
    """(R, C) -> valid (bt, h, w, C) via the aligned split + slice."""
    return flat.reshape(bt, h, w8, flat.shape[-1])[:, :, :w, :]


def _rowmask(bt, h, w8, w):
    """(R, 1) f32: 1.0 on rows that map to valid (non-pad) columns."""
    r = bt * h * w8
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    return (jax.lax.rem(rows, w8) < w).astype(jnp.float32)


def _sample_selector(bt, h, w8):
    """(bt, R) f32 selector: M[b, r] = 1 iff row r belongs to sample b.
    Per-sample sums over the flat view are then the matmul M @ X."""
    r = bt * h * w8
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt, r), 1) // (h * w8)
    samples = jax.lax.broadcasted_iota(jnp.int32, (bt, r), 0)
    return (rows == samples).astype(jnp.float32)


def _csum(flat):
    """(R, C) -> (1, C) f32 column sums (2-D sublane reduce: supported)."""
    return jnp.sum(flat.astype(jnp.float32), axis=0, keepdims=True)


def _dot(a, b, dims, out_dtype=jnp.float32):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=out_dtype)


def _bf(x):
    return x.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _ka_fwd_kernel(x_ref, wexp_ref, g1_ref, b1_ref, wdw_ref,
                   y2_ref, m1_ref, v1_ref, m2_ref, v2_ref,
                   acc1_ref, acc2_ref, apad_ref, xstage_ref, mstage_ref,
                   *, k: int, n_total: int, has_expand: bool):
    """Phase 0: expand + BN1 stats. Phase 1: recompute, BN1+SiLU, depthwise
    conv, y2 + BN2 stats. Without an expand conv, phase 0 only writes the
    placeholder stats."""
    ph = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    p = k // 2

    x = x_ref[...]                                     # (Bt, H, W, Cin)
    bt, h, w, cin = x.shape
    mid = y2_ref.shape[-1]
    w8 = xstage_ref.shape[2]

    def expand_flat():
        """(R, mid) f32, bf16-rounded; zero-input pad rows give exactly-zero
        outputs (no bias), so padded column sums are exact."""
        flat = _stage4(xstage_ref, x, w)
        y1 = _dot(flat, _bf(wexp_ref[...]), ((1,), (0,)))
        # match the unfused path, where the conv's bf16 output feeds BN
        return _r(y1)

    if has_expand:
        @pl.when(ph == 0)
        def _():
            y1 = expand_flat()
            @pl.when(t == 0)
            def _():
                acc1_ref[...] = jnp.zeros_like(acc1_ref)
            acc1_ref[0:1, :] += _csum(y1)
            acc1_ref[1:2, :] += _csum(y1 * y1)
            @pl.when(t == nt - 1)
            def _():
                m = acc1_ref[0:1, :] / n_total
                v = acc1_ref[1:2, :] / n_total - m * m
                m1_ref[...] = m
                v1_ref[...] = v
    else:
        @pl.when((ph == 0) & (t == nt - 1))
        def _():
            m1_ref[...] = jnp.zeros_like(m1_ref)
            v1_ref[...] = jnp.ones_like(v1_ref)

    @pl.when(ph == 1)
    def _():
        if has_expand:
            y1 = expand_flat()
            inv = jax.lax.rsqrt(v1_ref[...] + _EPS)        # (1, mid)
            z1 = _r((y1 - m1_ref[...]) * (inv * g1_ref[...]) + b1_ref[...])
            a1 = _to4(_bf(_silu(z1)), bt, h, w8, w)
        else:
            a1 = _bf(x)
        apad_ref[...] = jnp.zeros_like(apad_ref)
        apad_ref[:, p:p + h, p:p + w, :] = a1
        apad = apad_ref[...]
        acc = jnp.zeros((bt, h, w, mid), jnp.float32)
        for i in range(k):
            for j in range(k):
                acc += apad[:, i:i + h, j:j + w, :].astype(jnp.float32) \
                    * wdw_ref[i * k + j:i * k + j + 1, :]
        y2 = _bf(acc)
        y2_ref[...] = y2
        @pl.when(t == 0)
        def _():
            acc2_ref[...] = jnp.zeros_like(acc2_ref)
        y2f = _stage4(mstage_ref, y2, w).astype(jnp.float32)
        acc2_ref[0:1, :] += _csum(y2f)
        acc2_ref[1:2, :] += _csum(y2f * y2f)
        @pl.when(t == nt - 1)
        def _():
            m = acc2_ref[0:1, :] / n_total
            v = acc2_ref[1:2, :] / n_total - m * m
            m2_ref[...] = m
            v2_ref[...] = v


def _kb_chain(y2flat, mask, bt, h, w8, w,
              g2_ref, b2_ref, m2_ref, v2_ref,
              wr_ref, br_ref, we_ref, be_ref):
    """Shared recompute: (xhat2, z2, a2m, s, su, u, sv, se, se_rows) on the
    flat view. ``a2m`` has pad rows zeroed so downstream sums are exact;
    ``se_rows`` is the per-row broadcast of the per-sample SE scale."""
    inv2 = jax.lax.rsqrt(v2_ref[...] + _EPS)
    xhat2 = (y2flat - m2_ref[...]) * inv2
    z2 = _r(xhat2 * g2_ref[...] + b2_ref[...])
    a2 = _bf(_silu(z2)).astype(jnp.float32)
    a2m = a2 * mask if mask is not None else a2
    sel = _sample_selector(bt, h, w8)
    # per-sample spatial mean; the unfused path reduces in bf16, this is an
    # f32 matmul reduction — difference is below the test tolerances
    s = _bf(_dot(sel, a2m, ((1,), (0,))) / (h * w))         # (bt, mid)
    su = _r(_dot(s, _bf(wr_ref[...]), ((1,), (0,))) + br_ref[...])
    u = _silu(su)
    sv = _r(_dot(_bf(u), _bf(we_ref[...]), ((1,), (0,))) + be_ref[...])
    se = _r(jax.nn.sigmoid(sv))                              # (bt, mid)
    se_rows = _dot(sel, se, ((0,), (0,)))                    # (R, mid)
    return inv2, xhat2, z2, a2m, s, su, u, sv, se, se_rows


def _kb_fwd_kernel(y2_ref, g2_ref, b2_ref, m2_ref, v2_ref,
                   wr_ref, br_ref, we_ref, be_ref, wproj_ref,
                   y3_ref, m3_ref, v3_ref,
                   acc3_ref, stage_ref, *, n_total: int):
    """BN2+SiLU + squeeze-excite + projection; y3 + BN3 stats out."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    bt, h, w, mid = y2_ref.shape
    cout = y3_ref.shape[-1]
    w8 = stage_ref.shape[2]
    y2flat = _stage4(stage_ref, y2_ref[...], w).astype(jnp.float32)
    mask = None if w8 == w else _rowmask(bt, h, w8, w)
    _, _, _, a2m, _, _, _, _, _, se_rows = _kb_chain(
        y2flat, mask, bt, h, w8, w, g2_ref, b2_ref, m2_ref, v2_ref,
        wr_ref, br_ref, we_ref, be_ref)
    a3 = _bf(a2m * se_rows)                                  # pads stay 0

    y3 = _bf(_dot(a3, _bf(wproj_ref[...]), ((1,), (0,))))    # (R, cout)
    y3_ref[...] = _to4(y3, bt, h, w8, w)
    @pl.when(t == 0)
    def _():
        acc3_ref[...] = jnp.zeros_like(acc3_ref)
    y3f = y3.astype(jnp.float32)                             # pad rows 0
    acc3_ref[0:1, :] += _csum(y3f)
    acc3_ref[1:2, :] += _csum(y3f * y3f)
    @pl.when(t == nt - 1)
    def _():
        m = acc3_ref[0:1, :] / n_total
        v = acc3_ref[1:2, :] / n_total - m * m
        m3_ref[...] = m
        v3_ref[...] = v


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _kb_bwd_kernel(y2_ref, dy3_ref, g2_ref, b2_ref, m2_ref, v2_ref,
                   wr_ref, br_ref, we_ref, be_ref, wproj_ref,
                   dy2_ref, dwproj_ref, dwr_ref, dbr_ref, dwe_ref, dbe_ref,
                   dg2_ref, db2_ref, red_ref, stage_m_ref, stage_c_ref,
                   *, n_total: int):
    """Phase 0: recompute the KB chain, accumulate dW_proj / SE-MLP grads /
    BN2-reduction terms. Phase 1: recompute d_z2 and apply the BN2 backward
    to emit d_y2."""
    ph = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    bt, h, w, mid = y2_ref.shape
    cout = dy3_ref.shape[-1]
    w8 = stage_m_ref.shape[2]
    flat_dy3 = _bf(_stage4(stage_c_ref, dy3_ref[...], w))    # pads 0
    y2flat = _stage4(stage_m_ref, y2_ref[...], w).astype(jnp.float32)
    mask = None if w8 == w else _rowmask(bt, h, w8, w)
    inv2, xhat2, z2, a2m, s, su, u, sv, se, se_rows = _kb_chain(
        y2flat, mask, bt, h, w8, w, g2_ref, b2_ref, m2_ref, v2_ref,
        wr_ref, br_ref, we_ref, be_ref)
    a3 = _bf(a2m * se_rows)

    # d wrt a3 through the projection: d_a3 = d_y3 @ W_proj^T   (pads 0)
    da3 = _dot(flat_dy3, _bf(wproj_ref[...]), ((1,), (1,)))

    # SE backward (per-sample sums via the selector matmul)
    sel = _sample_selector(bt, h, w8)
    dse = _dot(sel, da3 * a2m, ((1,), (0,)))                 # (bt, mid)
    dsv = dse * se * (1.0 - se)
    du = _dot(dsv, we_ref[...].astype(jnp.float32), ((1,), (1,)))
    dsu = du * _dsilu(su)
    ds = _dot(dsu, wr_ref[...].astype(jnp.float32), ((1,), (1,)))
    ds_rows = _dot(sel, ds, ((0,), (0,))) / (h * w)          # (R, mid)
    da2 = da3 * se_rows + ds_rows
    dz2 = da2 * _dsilu(z2)
    if mask is not None:
        dz2 = dz2 * mask                                     # pads 0

    @pl.when(ph == 0)
    def _():
        @pl.when(t == 0)
        def _():
            dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
            dwr_ref[...] = jnp.zeros_like(dwr_ref)
            dbr_ref[...] = jnp.zeros_like(dbr_ref)
            dwe_ref[...] = jnp.zeros_like(dwe_ref)
            dbe_ref[...] = jnp.zeros_like(dbe_ref)
            red_ref[...] = jnp.zeros_like(red_ref)
        dwproj_ref[...] += _dot(a3, flat_dy3, ((0,), (0,)))
        dwe_ref[...] += _dot(u, dsv, ((0,), (0,)))
        dbe_ref[...] += jnp.sum(dsv, axis=0, keepdims=True)
        dwr_ref[...] += _dot(s.astype(jnp.float32), dsu, ((0,), (0,)))
        dbr_ref[...] += jnp.sum(dsu, axis=0, keepdims=True)
        red_ref[0:1, :] += _csum(dz2)
        red_ref[1:2, :] += _csum(dz2 * xhat2)
        @pl.when(t == nt - 1)
        def _():
            dg2_ref[...] = red_ref[1:2, :]
            db2_ref[...] = red_ref[0:1, :]

    @pl.when(ph == 1)
    def _():
        # train-mode BN backward with the completed global reductions
        dy2 = (g2_ref[...] * inv2) * (
            dz2 - red_ref[0:1, :] / n_total
            - xhat2 * (red_ref[1:2, :] / n_total))
        dy2_ref[...] = _to4(dy2, bt, h, w8, w).astype(dy2_ref.dtype)


def _ka_bwd_kernel(x_ref, dy2_ref, wexp_ref, g1_ref, b1_ref, wdw_ref,
                   m1_ref, v1_ref,
                   dx_ref, dwexp_ref, dwdw_ref, dg1_ref, db1_ref,
                   red_ref, dpad_ref, apad_ref, xstage_ref, mstage_ref,
                   *, k: int, n_total: int, has_expand: bool):
    """Phase 0: recompute a1, accumulate dW_dw and BN1-reduction terms.
    Phase 1: depthwise-transpose d_y2 -> d_a1, BN1 backward, d_x through the
    expand matmul (+ dW_exp)."""
    ph = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    p = k // 2

    x = x_ref[...]
    bt, h, w, cin = x.shape
    mid = dy2_ref.shape[-1]
    w8 = mstage_ref.shape[2]
    dy2 = dy2_ref[...]

    if has_expand:
        flat_x = _bf(_stage4(xstage_ref, x, w))              # pads 0
        y1 = _r(_dot(flat_x, _bf(wexp_ref[...]), ((1,), (0,))))
        inv1 = jax.lax.rsqrt(v1_ref[...] + _EPS)
        xhat1 = (y1 - m1_ref[...]) * inv1                    # (R, mid)
        z1 = _r(xhat1 * g1_ref[...] + b1_ref[...])
        a1 = _to4(_bf(_silu(z1)), bt, h, w8, w)
    else:
        a1 = _bf(x)

    def dw_transpose_flat():
        """d_a1 on the flat padded view (pad rows zero)."""
        dpad_ref[...] = jnp.zeros_like(dpad_ref)
        dpad_ref[:, p:p + h, p:p + w, :] = dy2
        dpad = dpad_ref[...]
        da1 = jnp.zeros((bt, h, w, mid), jnp.float32)
        for i in range(k):
            for j in range(k):
                da1 += dpad[:, 2 * p - i:2 * p - i + h,
                            2 * p - j:2 * p - j + w, :].astype(jnp.float32) \
                    * wdw_ref[i * k + j:i * k + j + 1, :]
        return _stage4(mstage_ref, da1, w).astype(jnp.float32)

    @pl.when(ph == 0)
    def _():
        @pl.when(t == 0)
        def _():
            dwdw_ref[...] = jnp.zeros_like(dwdw_ref)
            red_ref[...] = jnp.zeros_like(red_ref)
            dwexp_ref[...] = jnp.zeros_like(dwexp_ref)
        # dW_dw[i,j,c] = sum over tile of a1pad[h+i, w+j, c] * d_y2[h, w, c]
        apad_ref[...] = jnp.zeros_like(apad_ref)
        apad_ref[:, p:p + h, p:p + w, :] = a1
        apad = apad_ref[...]
        dy2f = dy2.astype(jnp.float32)
        for i in range(k):
            for j in range(k):
                prod = apad[:, i:i + h, j:j + w, :].astype(jnp.float32) * dy2f
                dwdw_ref[i * k + j:i * k + j + 1, :] += \
                    _csum(_stage4(mstage_ref, prod, w))
        if has_expand:
            da1 = dw_transpose_flat()
            dz1 = da1 * _dsilu(z1)                           # pads 0 (da1)
            red_ref[0:1, :] += _csum(dz1)
            red_ref[1:2, :] += _csum(dz1 * xhat1)
            @pl.when(t == nt - 1)
            def _():
                dg1_ref[...] = red_ref[1:2, :]
                db1_ref[...] = red_ref[0:1, :]

    @pl.when(ph == 1)
    def _():
        da1 = dw_transpose_flat()
        if has_expand:
            dz1 = da1 * _dsilu(z1)
            dy1 = _bf((g1_ref[...] * inv1) * (
                dz1 - red_ref[0:1, :] / n_total
                - xhat1 * (red_ref[1:2, :] / n_total)))
            # d_x = d_y1 @ W_exp^T ; pad rows give garbage, sliced away
            dx = _dot(dy1, _bf(wexp_ref[...]), ((1,), (1,)))
            dx_ref[...] = _to4(dx, bt, h, w8, w).astype(dx_ref.dtype)
            # x pad rows are zero, so garbage d_y1 pad rows contribute 0
            dwexp_ref[...] += _dot(flat_x, dy1, ((0,), (0,)))
        else:
            dx_ref[...] = _to4(da1, bt, h, w8, w).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _row(a):
    return jnp.asarray(a, jnp.float32).reshape(1, -1)


def _vec_spec(n):
    return pl.BlockSpec((1, n), lambda *_: (0, 0), memory_space=pltpu.VMEM)


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd, memory_space=pltpu.VMEM)


def _tile_spec(bt, rest, two_phase: bool, write_phase1: bool = False):
    """Batch-tiled block spec. With a phase-major grid the index map sees
    (phase, tile); blocks written only in phase 1 park on block 0 during
    phase 0, so the sequential window flushes at most one stale block,
    which phase 1 then overwrites first."""
    if not two_phase:
        return pl.BlockSpec((bt, *rest), lambda t: (t,) + (0,) * len(rest),
                            memory_space=pltpu.VMEM)
    if write_phase1:
        return pl.BlockSpec((bt, *rest),
                            lambda ph, t: (ph * t,) + (0,) * len(rest),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((bt, *rest), lambda ph, t: (t,) + (0,) * len(rest),
                        memory_space=pltpu.VMEM)


def _stat_shape(n):
    return jax.ShapeDtypeStruct((1, n), jnp.float32)


def _ka_fwd(x, wexp, g1, b1, wdw, *, k, interpret):
    b, h, w, cin = x.shape
    has_expand = wexp is not None
    mid = wexp.shape[1] if has_expand else cin
    p = k // 2
    per_img = 2 * (h * w * cin + (h + 2 * p) * (w + 2 * p) * mid
                   + 2 * h * w * mid)
    bt = _pick_batch_tile(b, per_img)
    nt = b // bt
    n_total = b * h * w

    wexp_in = wexp if has_expand else jnp.zeros((cin, 1), jnp.float32)
    g1_in = _row(g1) if has_expand else jnp.zeros((1, 1), jnp.float32)
    b1_in = _row(b1) if has_expand else jnp.zeros((1, 1), jnp.float32)

    kernel = functools.partial(_ka_fwd_kernel, k=k, n_total=n_total,
                               has_expand=has_expand)
    y2, m1, v1, m2, v2 = pl.pallas_call(
        kernel,
        grid=(2, nt),
        in_specs=[
            _tile_spec(bt, (h, w, cin), True),
            _full_spec(wexp_in.shape),
            _vec_spec(g1_in.shape[1]),
            _vec_spec(b1_in.shape[1]),
            _full_spec((k * k, mid)),
        ],
        out_specs=(
            _tile_spec(bt, (h, w, mid), True, write_phase1=True),
            _vec_spec(mid), _vec_spec(mid), _vec_spec(mid), _vec_spec(mid),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, mid), jnp.bfloat16),
            _stat_shape(mid), _stat_shape(mid),
            _stat_shape(mid), _stat_shape(mid),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, mid), jnp.float32),
            pltpu.VMEM((2, mid), jnp.float32),
            pltpu.VMEM((bt, h + 2 * p, w + 2 * p, mid), jnp.bfloat16),
            pltpu.VMEM((bt, h, _rup8(w), cin), jnp.bfloat16),
            pltpu.VMEM((bt, h, _rup8(w), mid), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x, wexp_in, g1_in, b1_in,
      jnp.asarray(wdw, jnp.float32).reshape(k * k, mid))
    return y2, m1[0], v1[0], m2[0], v2[0]


def _kb_fwd(y2, g2, b2, m2, v2, wr, br, we, be, wproj, *, interpret):
    b, h, w, mid = y2.shape
    r = wr.shape[1]
    cout = wproj.shape[1]
    per_img = 2 * h * w * (3 * mid + cout)
    bt = _pick_batch_tile(b, per_img)
    nt = b // bt
    n_total = b * h * w

    kernel = functools.partial(_kb_fwd_kernel, n_total=n_total)
    y3, m3, v3 = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            _tile_spec(bt, (h, w, mid), False),
            _vec_spec(mid), _vec_spec(mid), _vec_spec(mid), _vec_spec(mid),
            _full_spec((mid, r)), _vec_spec(r),
            _full_spec((r, mid)), _vec_spec(mid),
            _full_spec((mid, cout)),
        ],
        out_specs=(
            _tile_spec(bt, (h, w, cout), False),
            _vec_spec(cout), _vec_spec(cout),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cout), jnp.bfloat16),
            _stat_shape(cout), _stat_shape(cout),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cout), jnp.float32),
            pltpu.VMEM((bt, h, _rup8(w), mid), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(y2, _row(g2), _row(b2), _row(m2), _row(v2),
      wr, _row(br), we, _row(be), wproj)
    return y3, m3[0], v3[0]


def _kb_bwd(y2, dy3, g2, b2, m2, v2, wr, br, we, be, wproj, *, interpret):
    b, h, w, mid = y2.shape
    r = wr.shape[1]
    cout = wproj.shape[1]
    per_img = 2 * h * w * (4 * mid + cout)
    bt = _pick_batch_tile(b, per_img)
    nt = b // bt
    n_total = b * h * w

    kernel = functools.partial(_kb_bwd_kernel, n_total=n_total)
    outs = pl.pallas_call(
        kernel,
        grid=(2, nt),
        in_specs=[
            _tile_spec(bt, (h, w, mid), True),
            _tile_spec(bt, (h, w, cout), True),
            _vec_spec(mid), _vec_spec(mid), _vec_spec(mid), _vec_spec(mid),
            _full_spec((mid, r)), _vec_spec(r),
            _full_spec((r, mid)), _vec_spec(mid),
            _full_spec((mid, cout)),
        ],
        out_specs=(
            _tile_spec(bt, (h, w, mid), True, write_phase1=True),
            _full_spec((mid, cout)),
            _full_spec((mid, r)), _vec_spec(r),
            _full_spec((r, mid)), _vec_spec(mid),
            _vec_spec(mid), _vec_spec(mid),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, mid), jnp.bfloat16),
            jax.ShapeDtypeStruct((mid, cout), jnp.float32),
            jax.ShapeDtypeStruct((mid, r), jnp.float32),
            _stat_shape(r),
            jax.ShapeDtypeStruct((r, mid), jnp.float32),
            _stat_shape(mid), _stat_shape(mid), _stat_shape(mid),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, mid), jnp.float32),
            pltpu.VMEM((bt, h, _rup8(w), mid), jnp.bfloat16),
            pltpu.VMEM((bt, h, _rup8(w), cout), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(y2, dy3, _row(g2), _row(b2), _row(m2), _row(v2),
      wr, _row(br), we, _row(be), wproj)
    dy2, dwproj, dwr, dbr, dwe, dbe, dg2, db2 = outs
    return dy2, dwproj, dwr, dbr[0], dwe, dbe[0], dg2[0], db2[0]


def _ka_bwd(x, dy2, wexp, g1, b1, wdw, m1, v1, *, k, interpret):
    b, h, w, cin = x.shape
    has_expand = wexp is not None
    mid = dy2.shape[-1]
    p = k // 2
    per_img = 2 * (h * w * cin + 2 * (h + 2 * p) * (w + 2 * p) * mid
                   + h * w * mid)
    bt = _pick_batch_tile(b, per_img)
    nt = b // bt
    n_total = b * h * w

    wexp_in = wexp if has_expand else jnp.zeros((cin, 1), jnp.float32)
    g1_in = _row(g1) if has_expand else jnp.zeros((1, 1), jnp.float32)
    b1_in = _row(b1) if has_expand else jnp.zeros((1, 1), jnp.float32)
    m1_in = _row(m1) if has_expand else jnp.zeros((1, 1), jnp.float32)
    v1_in = _row(v1) if has_expand else jnp.ones((1, 1), jnp.float32)

    kernel = functools.partial(_ka_bwd_kernel, k=k, n_total=n_total,
                               has_expand=has_expand)
    outs = pl.pallas_call(
        kernel,
        grid=(2, nt),
        in_specs=[
            _tile_spec(bt, (h, w, cin), True),
            _tile_spec(bt, (h, w, mid), True),
            _full_spec(wexp_in.shape),
            _vec_spec(g1_in.shape[1]), _vec_spec(b1_in.shape[1]),
            _full_spec((k * k, mid)),
            _vec_spec(m1_in.shape[1]), _vec_spec(v1_in.shape[1]),
        ],
        out_specs=(
            _tile_spec(bt, (h, w, cin), True, write_phase1=True),
            _full_spec(wexp_in.shape),
            _full_spec((k * k, mid)),
            _vec_spec(g1_in.shape[1]), _vec_spec(b1_in.shape[1]),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cin), jnp.bfloat16),
            jax.ShapeDtypeStruct(wexp_in.shape, jnp.float32),
            jax.ShapeDtypeStruct((k * k, mid), jnp.float32),
            jax.ShapeDtypeStruct(g1_in.shape, jnp.float32),
            jax.ShapeDtypeStruct(b1_in.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, mid), jnp.float32),
            pltpu.VMEM((bt, h + 2 * p, w + 2 * p, mid), jnp.bfloat16),
            pltpu.VMEM((bt, h + 2 * p, w + 2 * p, mid), jnp.bfloat16),
            pltpu.VMEM((bt, h, _rup8(w), cin), jnp.bfloat16),
            pltpu.VMEM((bt, h, _rup8(w), mid), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x, dy2, wexp_in, g1_in, b1_in,
      jnp.asarray(wdw, jnp.float32).reshape(k * k, mid), m1_in, v1_in)
    dx, dwexp, dwdw, dg1, db1 = outs
    dwdw = dwdw.reshape(k, k, mid)
    if not has_expand:
        return dx, None, None, None, dwdw
    return dx, dwexp, dg1[0], db1[0], dwdw


# ---------------------------------------------------------------------------
# the fused block core with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def mbconv_core(x, wexp, g1, b1, wdw, g2, b2, wr, br, we, be, wproj,
                k: int = 3, interpret: bool = False):
    """Fused expand->BN1->SiLU->dwconv->BN2->SiLU->SE->project, stride 1.

    Returns (y3, mean1, var1, mean2, var2, mean3, var3): the pre-BN3
    projection output plus the train-mode batch statistics of every BN
    (f32, biased variance, exactly flax.linen.BatchNorm's). The caller
    applies BN3 + the residual in XLA and feeds the means/vars to the
    running-statistics update. ``wexp`` may be None for expand_ratio == 1
    blocks (g1/b1 are then ignored; mean1/var1 are zeros/ones placeholders).

    ``wdw`` has the flax depthwise layout (k, k, 1, mid) or (k, k, mid).
    """
    return _mbconv_fwd(x, wexp, g1, b1, wdw, g2, b2, wr, br, we, be, wproj,
                       k, interpret)[0]


def _mbconv_fwd(x, wexp, g1, b1, wdw, g2, b2, wr, br, we, be, wproj,
                k, interpret):
    y2, m1, v1, m2, v2 = _ka_fwd(x, wexp, g1, b1, wdw, k=k,
                                 interpret=interpret)
    y3, m3, v3 = _kb_fwd(y2, g2, b2, m2, v2, wr, br, we, be, wproj,
                         interpret=interpret)
    out = (y3, m1, v1, m2, v2, m3, v3)
    residuals = (x, y2, y3, wexp, g1, b1, wdw, g2, b2, wr, br, we, be,
                 wproj, m1, v1, m2, v2, m3, v3)
    return out, residuals


def _mbconv_bwd(k, interpret, residuals, cotangents):
    (x, y2, y3, wexp, g1, b1, wdw, g2, b2, wr, br, we, be, wproj,
     m1, v1, m2, v2, m3, v3) = residuals
    dy3, dm1, dv1, dm2, dv2, dm3, dv3 = cotangents
    n3 = y3.shape[0] * y3.shape[1] * y3.shape[2]
    # fold the gradient through the returned batch statistics (the XLA-side
    # BN3 normalizes with mean3/var3, which are functions of y3):
    # d_y3 += d_mean3/N + 2*(y3 - mean3)*d_var3/N.  mean1/2 and var1/2 only
    # feed the (stop-gradient) running-stats update, so their cotangents
    # are zero and ignored.
    dy3 = (dy3.astype(jnp.float32) + dm3 / n3
           + (y3.astype(jnp.float32) - m3) * (2.0 / n3 * dv3))
    dy3 = dy3.astype(y3.dtype)
    dy2, dwproj, dwr, dbr, dwe, dbe, dg2, db2 = _kb_bwd(
        y2, dy3, g2, b2, m2, v2, wr, br, we, be, wproj, interpret=interpret)
    dx, dwexp, dg1, db1, dwdw = _ka_bwd(
        x, dy2, wexp, g1, b1, wdw, m1, v1, k=k, interpret=interpret)
    dx = dx.astype(x.dtype)
    dwdw = dwdw.reshape(jnp.asarray(wdw).shape).astype(
        jnp.asarray(wdw).dtype)
    if wexp is None:
        return (dx, None, None, None, dwdw, dg2, db2,
                dwr.astype(jnp.asarray(wr).dtype), dbr,
                dwe.astype(jnp.asarray(we).dtype), dbe,
                dwproj.astype(jnp.asarray(wproj).dtype))
    return (dx, dwexp.astype(jnp.asarray(wexp).dtype), dg1, db1, dwdw,
            dg2, db2, dwr.astype(jnp.asarray(wr).dtype), dbr,
            dwe.astype(jnp.asarray(we).dtype), dbe,
            dwproj.astype(jnp.asarray(wproj).dtype))


mbconv_core.defvjp(_mbconv_fwd, _mbconv_bwd)


# ---------------------------------------------------------------------------
# jnp reference composition (parity tests + documentation of record)
# ---------------------------------------------------------------------------

def mbconv_reference(x, wexp, g1, b1, wdw, g2, b2, wr, br, we, be, wproj,
                     k: int = 3):
    """Plain-XLA train-mode composition with the same semantics, returning
    the same (y3, stats...) tuple. Used by the parity tests as the oracle."""
    def bn_stats(y):
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, axis=(0, 1, 2))
        v = jnp.mean(yf * yf, axis=(0, 1, 2)) - m * m
        return m, v

    dt = jnp.bfloat16
    p = k // 2
    if wexp is not None:
        y1 = jax.lax.dot_general(
            x.astype(dt), jnp.asarray(wexp, dt), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        m1, v1 = bn_stats(y1)
        z1 = _r((y1.astype(jnp.float32) - m1) * jax.lax.rsqrt(v1 + _EPS)
                * jnp.asarray(g1, jnp.float32) + jnp.asarray(b1, jnp.float32))
        a1 = _silu(z1).astype(dt)
    else:
        m1 = jnp.zeros((x.shape[-1],), jnp.float32)
        v1 = jnp.ones((x.shape[-1],), jnp.float32)
        a1 = x.astype(dt)
    mid = a1.shape[-1]
    y2 = jax.lax.conv_general_dilated(
        a1, jnp.asarray(wdw, dt).reshape(k, k, 1, mid),
        window_strides=(1, 1), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mid).astype(dt)
    m2, v2 = bn_stats(y2)
    a2 = _silu(_r((y2.astype(jnp.float32) - m2) * jax.lax.rsqrt(v2 + _EPS)
                  * jnp.asarray(g2, jnp.float32)
                  + jnp.asarray(b2, jnp.float32))).astype(dt)
    s = jnp.mean(a2, axis=(1, 2))
    u = _silu(_r(jax.lax.dot_general(
        s, jnp.asarray(wr, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + jnp.asarray(br, jnp.float32)))
    se = _r(jax.nn.sigmoid(_r(jax.lax.dot_general(
        u.astype(dt), jnp.asarray(we, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + jnp.asarray(be, jnp.float32))))
    a3 = (a2.astype(jnp.float32) * se[:, None, None, :]).astype(dt)
    y3 = jax.lax.dot_general(
        a3, jnp.asarray(wproj, dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    m3, v3 = bn_stats(y3)
    return y3, m1, v1, m2, v2, m3, v3
