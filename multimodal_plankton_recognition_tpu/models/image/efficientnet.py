"""EfficientNet backbones (B0 / B1).

From-scratch Flax implementation of the MBConv architecture for the timm
names the reference uses for its flagship multimodal model
(reference: model_cards/example_multi.yaml:9 "efficientnet_b0",
scripts/train_image.sh:12-13). NHWC layout; depthwise convs via
``feature_group_count``; SiLU activations; squeeze-excite with ratio 0.25 of
the block input channels.
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

# (expand_ratio, channels, repeats, stride, kernel) per stage — B0 table
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class _SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class _MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand_ratio: int
    stride: int
    kernel: int
    se_ratio: float
    dtype: jnp.dtype
    #: fused=True declares the same parameter tree but runs the whole block
    #: through the fused Pallas kernels when training at stride 1
    #: (ops/pallas/experimental/mbconv.py); stride-2 blocks and eval use an equivalent
    #: jnp composition over the same parameters
    fused: bool = False

    # ---- fused path -------------------------------------------------------

    def _fused_params(self, mid: int):
        """Parameters with the exact tree structure the unfused submodules
        would create (dict-valued leaves), so checkpoints and the timm
        converter are layout-compatible across both modes."""
        conv_init = nn.initializers.lecun_normal()
        k = self.kernel
        red = max(1, int(self.in_ch * self.se_ratio))
        p = {}
        if self.expand_ratio != 1:
            p["expand_conv"] = self.param(
                "expand_conv",
                lambda key: {"kernel": conv_init(
                    key, (1, 1, self.in_ch, mid), jnp.float32)})
            p["expand_bn"] = self.param(
                "expand_bn", lambda key: {
                    "scale": jnp.ones((mid,), jnp.float32),
                    "bias": jnp.zeros((mid,), jnp.float32)})
        p["dw_conv"] = self.param(
            "dw_conv",
            lambda key: {"kernel": conv_init(key, (k, k, 1, mid),
                                             jnp.float32)})
        p["dw_bn"] = self.param(
            "dw_bn", lambda key: {
                "scale": jnp.ones((mid,), jnp.float32),
                "bias": jnp.zeros((mid,), jnp.float32)})
        p["se"] = self.param(
            "se", lambda key: {
                "reduce": {"kernel": conv_init(key, (1, 1, mid, red),
                                               jnp.float32),
                           "bias": jnp.zeros((red,), jnp.float32)},
                "expand": {"kernel": conv_init(
                    jax.random.fold_in(key, 1), (1, 1, red, mid),
                    jnp.float32),
                    "bias": jnp.zeros((mid,), jnp.float32)}})
        p["project_conv"] = self.param(
            "project_conv",
            lambda key: {"kernel": conv_init(key, (1, 1, mid, self.out_ch),
                                             jnp.float32)})
        p["project_bn"] = self.param(
            "project_bn", lambda key: {
                "scale": jnp.ones((self.out_ch,), jnp.float32),
                "bias": jnp.zeros((self.out_ch,), jnp.float32)})
        stats = {}
        for name, n in (("expand_bn", mid), ("dw_bn", mid),
                        ("project_bn", self.out_ch)):
            if name == "expand_bn" and self.expand_ratio == 1:
                continue
            stats[name] = self.variable(
                "batch_stats", name,
                lambda n=n: {"mean": jnp.zeros((n,), jnp.float32),
                             "var": jnp.ones((n,), jnp.float32)})
        return p, stats

    @staticmethod
    def _bn(y, scale, bias, mean, var, dtype):
        yf = y.astype(jnp.float32)
        z = (yf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return z.astype(dtype)

    def _fused_call(self, x, *, train: bool):
        from ...ops.pallas.experimental.mbconv import mbconv_core, mbconv_reference

        mid = self.in_ch * self.expand_ratio
        has_expand = self.expand_ratio != 1
        p, stats = self._fused_params(mid)
        k = self.kernel
        wexp = p["expand_conv"]["kernel"].reshape(self.in_ch, mid) \
            if has_expand else None
        g1 = p["expand_bn"]["scale"] if has_expand else None
        b1 = p["expand_bn"]["bias"] if has_expand else None
        wdw = p["dw_conv"]["kernel"]
        g2, b2 = p["dw_bn"]["scale"], p["dw_bn"]["bias"]
        wr = p["se"]["reduce"]["kernel"].reshape(mid, -1)
        br = p["se"]["reduce"]["bias"]
        we = p["se"]["expand"]["kernel"].reshape(-1, mid)
        be = p["se"]["expand"]["bias"]
        wproj = p["project_conv"]["kernel"].reshape(mid, self.out_ch)
        g3, b3 = p["project_bn"]["scale"], p["project_bn"]["bias"]

        # Kernel path only where a pallas_call sees the full local batch
        # (single-chip TPU / per-chip shard_map trace) — under a multi-chip
        # GSPMD mesh and on non-TPU backends _unfused_over_params is used
        # instead (same gating as FusedSelfAttention, ops/kernels.py).
        # PLANKTON_FUSED_INTERPRET=1 forces the kernel in interpret mode
        # for the CPU parity tests.
        from ...ops.kernels import kernel_path_allowed
        use_kernel = (train and self.stride == 1
                      and not self.is_initializing()
                      and kernel_path_allowed())
        if use_kernel:
            interpret = jax.default_backend() != "tpu"
            y3, m1, v1, m2, v2, m3, v3 = mbconv_core(
                x.astype(jnp.bfloat16), wexp, g1, b1, wdw, g2, b2,
                wr, br, we, be, wproj, k, interpret)
            out = self._bn(y3, g3, b3, m3, v3, self.dtype)
            if train and not self.is_initializing():
                mom = 0.99  # flax.linen.BatchNorm default momentum
                if has_expand:
                    ra = stats["expand_bn"]
                    ra.value = {
                        "mean": mom * ra.value["mean"] + (1 - mom) * m1,
                        "var": mom * ra.value["var"] + (1 - mom) * v1}
                for name, bm, bv in (("dw_bn", m2, v2),
                                     ("project_bn", m3, v3)):
                    ra = stats[name]
                    ra.value = {
                        "mean": mom * ra.value["mean"] + (1 - mom) * bm,
                        "var": mom * ra.value["var"] + (1 - mom) * bv}
        else:
            out = self._unfused_over_params(
                x, p, stats, mid, train=train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            out = out + x.astype(out.dtype)
        return out

    def _unfused_over_params(self, x, p, stats, mid, *, train: bool):
        """jnp composition over the fused-layout parameters: eval mode,
        stride-2 blocks, and init (avoids compiling the Pallas kernels
        during model.init). Semantics match the nn.Conv/nn.BatchNorm path."""
        dt = self.dtype
        k = self.kernel
        has_expand = self.expand_ratio != 1
        mom = 0.99

        def bn(y, name):
            yf = y.astype(jnp.float32)
            if train:
                m = jnp.mean(yf, axis=(0, 1, 2))
                v = jnp.mean(yf * yf, axis=(0, 1, 2)) - m * m
                if not self.is_initializing():
                    ra = stats[name]
                    ra.value = {"mean": mom * ra.value["mean"] + (1 - mom) * m,
                                "var": mom * ra.value["var"] + (1 - mom) * v}
            else:
                m = stats[name].value["mean"]
                v = stats[name].value["var"]
            return self._bn(yf, p[name]["scale"], p[name]["bias"], m, v, dt)

        y = x.astype(dt)
        if has_expand:
            y = jax.lax.dot_general(
                y, p["expand_conv"]["kernel"].reshape(self.in_ch, mid)
                .astype(dt), (((3,), (0,)), ((), ())))
            y = nn.silu(bn(y, "expand_bn"))
        pd = k // 2
        y = jax.lax.conv_general_dilated(
            y, p["dw_conv"]["kernel"].astype(dt),
            window_strides=(self.stride, self.stride),
            padding=[(pd, pd), (pd, pd)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=mid)
        y = nn.silu(bn(y, "dw_bn"))
        s = jnp.mean(y, axis=(1, 2))
        u = nn.silu(jax.lax.dot_general(
            s, p["se"]["reduce"]["kernel"].reshape(mid, -1).astype(dt),
            (((1,), (0,)), ((), ()))) + p["se"]["reduce"]["bias"].astype(dt))
        se = nn.sigmoid(jax.lax.dot_general(
            u, p["se"]["expand"]["kernel"].reshape(-1, mid).astype(dt),
            (((1,), (0,)), ((), ()))) + p["se"]["expand"]["bias"].astype(dt))
        y = y * se[:, None, None, :]
        y = jax.lax.dot_general(
            y, p["project_conv"]["kernel"].reshape(mid, self.out_ch)
            .astype(dt), (((3,), (0,)), ((), ())))
        return bn(y, "project_bn")

    # ---- standard (unfused) path ------------------------------------------

    @nn.compact
    def __call__(self, x, train: bool = False):
        # the fused parameter layout unconditionally declares squeeze-excite;
        # an se_ratio <= 0 model must keep the unfused tree (no SE params)
        # or fused/unfused checkpoints would diverge
        if self.fused and self.se_ratio > 0:
            return self._fused_call(x, train=train)
        identity = x
        mid = self.in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            # named so the "conv_saves" remat policy (EfficientNet.remat)
            # saves the raw conv outputs for backward and recomputes the
            # cheap elementwise BN-apply/SiLU chains instead of
            # round-tripping BOTH tensors through HBM (no-op otherwise)
            y = checkpoint_name(y, "mbconv_conv")
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="expand_bn")(y)
            y = nn.silu(y)
        p = self.kernel // 2
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = checkpoint_name(y, "mbconv_conv")
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="dw_bn")(y)
        y = nn.silu(y)
        if self.se_ratio > 0:
            y = _SqueezeExcite(max(1, int(self.in_ch * self.se_ratio)),
                               self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = checkpoint_name(y, "mbconv_conv")
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + identity
        return y


class EfficientNet(nn.Module):
    depth_mult: float = 1.0
    in_chans: int = 1
    se_ratio: float = 0.25
    #: route MBConv blocks through the fused Pallas TPU kernels (same
    #: parameter tree; see _MBConv.fused)
    fused: bool = False
    #: rematerialize MBConv blocks (jax.checkpoint):
    #: * ``True`` — full per-block remat: only block boundaries are saved
    #:   and the whole block (convs included) is recomputed. Measured
    #:   NEGATIVE on the v5e (+19% HBM traffic, docs/PERF.md r3): the
    #:   recomputed convolutions re-read their operand streams.
    #: * ``"conv_saves"`` — policy remat saving ONLY the raw conv outputs
    #:   (checkpoint_name "mbconv_conv"): backward recomputes the
    #:   elementwise BN-apply/SiLU/SE chains from the saved conv outputs
    #:   instead of round-tripping both the pre-BN and post-activation
    #:   tensors through HBM (the stage2a HLO materializes both, 2.1x the
    #:   structural traffic minimum — scripts/mbconv_traffic.py).
    remat: Union[bool, str] = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return 1280

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = image.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.silu(x)

        # static_argnums=(2,) marks `train` ((self, x, train) counting) so
        # the checkpoint trace sees a concrete bool
        if self.remat == "conv_saves":
            block_cls = nn.remat(
                _MBConv, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "mbconv_conv"))
        elif self.remat:
            block_cls = nn.remat(_MBConv, static_argnums=(2,))
        else:
            block_cls = _MBConv

        in_ch = 32
        for si, (expand, ch, repeats, stride, kernel) in enumerate(_B0_STAGES):
            repeats = _round_repeats(repeats, self.depth_mult)
            for b in range(repeats):
                s = stride if b == 0 else 1
                x = block_cls(in_ch, ch, expand, s, kernel, self.se_ratio,
                              self.dtype, fused=self.fused,
                              name=f"stage{si + 1}_block{b}")(x, train)
                in_ch = ch

        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="head_bn")(x)
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2))


def efficientnet_b0(**kw) -> EfficientNet:
    return EfficientNet(depth_mult=1.0, **kw)


def efficientnet_b1(**kw) -> EfficientNet:
    return EfficientNet(depth_mult=1.1, **kw)
