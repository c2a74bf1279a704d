#!/usr/bin/env python3
"""Component-level TPU perf probe for the flagship pretraining step.

Times each piece of the hot path with the honest scan+fetch protocol
(K steps inside one jitted lax.scan dispatch, carry-dependent body, forced
np.asarray fetch — per-dispatch host timing over the axon tunnel resolves
early and cannot be trusted). Used to direct MFU work (VERDICT r1 #2);
results recorded in docs/PERF.md.

Usage: python scripts/perf_probe.py [probe ...]
  (default: all probes)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from functools import partial

import numpy as np

K = 20
REPS = 3


def _time_scan(fn, *args) -> float:
    """Median wall seconds for one jitted K-step scan dispatch of fn."""
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _batch(bs, img=224, plen=224, img_dtype=None):
    from multimodal_plankton_recognition_tpu.models.flagships import (
        synthetic_batch_b0,
    )
    return synthetic_batch_b0(bs, img=img, plen=plen, img_dtype=img_dtype)


def _flagship(dim_embed=512):
    from multimodal_plankton_recognition_tpu.models.flagships import (
        flagship_b0,
    )
    return flagship_b0(dim_embed)


def probe_train_step(bs, img_dtype=None, label="", remat=False):
    """Full train step (fwd+bwd+SGD), bucket_size fixed at 16."""
    import jax
    import jax.numpy as jnp
    from multimodal_plankton_recognition_tpu.config import OptimConfig
    from multimodal_plankton_recognition_tpu.train import (
        make_optimizer, create_train_state, make_multi_steps,
    )
    from multimodal_plankton_recognition_tpu.models.flagships import (
        flagship_b0,
    )

    buckets = bs // 16
    if remat:
        label = label + " remat"
    model = flagship_b0(remat=remat)
    batch = _batch(bs, img_dtype=img_dtype)
    tx = make_optimizer(OptimConfig(lr=5e-3, momentum=0.9,
                                    weight_decay=1e-3, nesterov=True))
    state = create_train_state(model, jax.random.key(0), batch, tx,
                               init_kwargs={"buckets": buckets})
    train_step, _ = make_multi_steps(model, tx, buckets=buckets)
    inner = train_step.__wrapped__

    @jax.jit
    def run_k(state, batch, rng):
        def body(s, i):
            s2, loss = inner(s, batch, jax.random.fold_in(rng, i))
            return s2, loss
        return jax.lax.scan(body, state, jnp.arange(K))

    dt = _time_scan(run_k, state, batch, jax.random.key(1))
    ms = dt / K * 1e3
    print(f"train_step bs={bs}{label}: {ms:.2f} ms/step, "
          f"{bs * K / dt:,.0f} pairs/s", flush=True)


def probe_train_step_bnrows(bs, rows):
    """PROBE-ONLY lever: BatchNorm train statistics computed over the first
    ``rows`` rows of the batch instead of all ``bs`` (full tensor still
    normalized with them). The B0 step's train-mode BN costs ~10 ms/step
    (docs/PERF.md ablation: 58.0 -> 48.1 ms with eval-mode BN), mostly the
    statistics passes over the 6x-expanded tensors; subset stats read a
    fraction of that. Numerics note: the reference's effective step is 4
    microbatches of 64, each normalized with ITS OWN 64-row statistics
    (torch BN under grad accumulation), so rows=64 at bs=256 is no further
    from reference semantics than our full-batch stats are. Wire a card
    flag only if this measures a win AND a convergence check passes."""
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp
    from typing import Any, Optional

    class _SubsetBN(fnn.Module):
        """nn.BatchNorm drop-in (same params/batch_stats tree) with stats
        over the leading ``rows`` batch rows in train mode."""
        use_running_average: Optional[bool] = None
        axis: int = -1
        momentum: float = 0.99
        epsilon: float = 1e-5
        dtype: Optional[Any] = None
        param_dtype: Any = jnp.float32
        use_bias: bool = True
        use_scale: bool = True
        axis_name: Optional[str] = None

        @fnn.compact
        def __call__(self, x, use_running_average=None):
            use_ra = fnn.merge_param(
                "use_running_average", self.use_running_average,
                use_running_average)
            feat = x.shape[-1]
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros(feat, jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones(feat, jnp.float32))
            if use_ra:
                mean, var = ra_mean.value, ra_var.value
            else:
                sub = x[: min(rows, x.shape[0])].astype(jnp.float32)
                axes = tuple(range(sub.ndim - 1))
                mean = jnp.mean(sub, axes)
                mean2 = jnp.mean(jnp.square(sub), axes)
                var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
                if not self.is_initializing():
                    m = self.momentum
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = m * ra_var.value + (1 - m) * var
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
                var + self.epsilon)
            if self.use_scale:
                y = y * self.param("scale", fnn.initializers.ones,
                                   (feat,), self.param_dtype)
            if self.use_bias:
                y = y + self.param("bias", fnn.initializers.zeros,
                                   (feat,), self.param_dtype)
            return y.astype(self.dtype or x.dtype)

    orig = fnn.BatchNorm
    fnn.BatchNorm = _SubsetBN
    try:
        probe_train_step(bs, label=f" [bn-stats-rows={rows}]")
    finally:
        fnn.BatchNorm = orig


def probe_vit_train(bs, fused_attention=False, fused_ffn=False,
                    tag_extra="", fuse_proj=None):
    """Full train step for the second flagship family (ViT-T/16 +
    ProfileTransformer) at a given per-chip batch; fused_attention routes
    both transformers through the Pallas lane-mask attention kernel."""
    import jax
    import jax.numpy as jnp
    from multimodal_plankton_recognition_tpu.config import OptimConfig
    from multimodal_plankton_recognition_tpu.models import MultiModel
    from multimodal_plankton_recognition_tpu.train import (
        make_optimizer, create_train_state, make_multi_steps,
    )

    from multimodal_plankton_recognition_tpu.models.flagships import (
        flagship_vit, synthetic_batch_vit,
    )
    import os
    if fuse_proj is not None:  # A/B the fused-projection attention block
        os.environ["PLANKTON_ATTN_FUSE_PROJ"] = "1" if fuse_proj else "0"
        tag_extra += f" [fuse_proj={int(fuse_proj)}]"
    buckets = bs // 16
    model = flagship_vit(fused_attention=fused_attention,
                         fused_ffn=fused_ffn)
    batch = synthetic_batch_vit(bs)
    tx = make_optimizer(OptimConfig(lr=5e-3, momentum=0.9,
                                    weight_decay=1e-3, nesterov=True))
    state = create_train_state(model, jax.random.key(0), batch, tx,
                               init_kwargs={"buckets": buckets})
    train_step, _ = make_multi_steps(model, tx, buckets=buckets)
    inner = train_step.__wrapped__

    @jax.jit
    def run_k(state, batch, rng):
        def body(s, i):
            s2, loss = inner(s, batch, jax.random.fold_in(rng, i))
            return s2, loss
        return jax.lax.scan(body, state, jnp.arange(K))

    dt = _time_scan(run_k, state, batch, jax.random.key(1))
    tag = (" fused-attn" if fused_attention else "") + \
        (" fused-ffn" if fused_ffn else "") + tag_extra
    print(f"vit_train bs={bs}{tag}: {dt / K * 1e3:.2f} ms/step, "
          f"{bs * K / dt:,.0f} pairs/s", flush=True)


def probe_vit_train_dpa(bs):
    """VERDICT r2 #7 comparison point: the ViT flagship step with the
    attention core swapped for ``jax.nn.dot_product_attention`` (XLA's own
    attention lowering — the no-Pallas alternative). Projections stay the
    packed (E, E) matmuls of FusedSelfAttention, so this isolates the
    attention-core choice. Caveat: dpa exposes no probability dropout, so
    the ProfileTransformer's p=0.1 prob-dropout work is OMITTED here —
    the dpa number is therefore a lower bound (flattering to dpa)."""
    import jax
    from multimodal_plankton_recognition_tpu.models import (
        attention as attn_mod,
    )
    from multimodal_plankton_recognition_tpu.ops.kernels import (
        kernel_path_allowed,
    )

    # the patched core only runs where FusedSelfAttention takes the kernel
    # path; on the einsum fallback the [dpa-core] label would be a lie
    if not kernel_path_allowed():
        raise SystemExit("vit_train*_dpa needs the kernel path "
                         "(single-chip TPU): the fallback would not "
                         "exercise the patched attention core")

    orig = attn_mod.mha_core

    def dpa_core(q, k, v, bias, seed, heads, rate=0.0, train=False,
                 interpret=False, narrow=True, has_bias=True):
        b, l, e = q.shape
        d = e // heads
        ab = bias[:, None, None, :]  # (B,1,1,Lk) additive pre-softmax
        o = jax.nn.dot_product_attention(
            q.reshape(b, l, heads, d), k.reshape(b, l, heads, d),
            v.reshape(b, l, heads, d), bias=ab)
        return o.reshape(b, l, e)

    attn_mod.mha_core = dpa_core
    try:
        probe_vit_train(bs, fused_attention=True, tag_extra=" [dpa-core]")
    finally:
        attn_mod.mha_core = orig


def probe_vit_train_bf16ln(bs):
    """VERDICT r2 #7 lever: LayerNorm statistics in bf16 instead of flax's
    default f32 promotion (``force_float32_reductions=False``) across both
    flagship transformers. Perf probe only — training-accuracy impact of
    bf16 mean/var at D=192 would need a convergence run before defaulting."""
    import functools
    import flax.linen as nn

    orig = nn.LayerNorm
    nn.LayerNorm = functools.partial(orig, force_float32_reductions=False)
    try:
        probe_vit_train(bs, fused_attention=True,
                        tag_extra=" [bf16-ln-stats]")
    finally:
        nn.LayerNorm = orig


def probe_encode(which, bs, int8=False):
    """Inference/serving path: jitted eval-mode MultiModel.encode (the
    retrieval/encode.py hot loop) — pairs/s at eval batch ``bs``.
    Measurement body shared with bench.py via flagships.encode_scan.
    ``int8=True`` traces every nn.Dense through the W8A8 interceptor
    (ops/quant.py) — the quantized-serving candidate path."""
    import contextlib

    import jax

    from multimodal_plankton_recognition_tpu.models.flagships import (
        encode_scan, flagship_vit, synthetic_batch_vit,
    )
    if which == "b0":
        model = _flagship()
        batch = _batch(bs)
    else:
        model = flagship_vit()
        batch = synthetic_batch_vit(bs)
    variables = model.init(jax.random.key(0), train=False, buckets=2,
                           **batch)
    run_k = encode_scan(model, K)

    if int8:
        from multimodal_plankton_recognition_tpu.ops.quant import (
            quantized_dense,
        )
        ctx = quantized_dense()
    else:
        ctx = contextlib.nullcontext()
    with ctx:  # interceptors rewrite the apply at trace time
        dt = _time_scan(run_k, variables, batch)
    tag = " int8" if int8 else ""
    print(f"encode[{which}{tag}] bs={bs}: {dt / K * 1e3:.2f} ms/batch, "
          f"{bs * K / dt:,.0f} pairs/s", flush=True)


def _bwd_probe(name, apply_fn, params, x):
    """fwd+bwd of apply_fn wrt params; carry = params so nothing hoists."""
    import jax
    import jax.numpy as jnp

    def loss_fn(p, x):
        return jnp.sum(apply_fn(p, x).astype(jnp.float32) ** 2)

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def run_k(params, x):
        def body(p, i):
            loss, g = grad_fn(p, x)
            p2 = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
            return p2, loss
        return jax.lax.scan(body, params, jnp.arange(K))

    dt = _time_scan(run_k, params, x)
    bs = x.shape[0]
    print(f"{name} bs={bs}: {dt / K * 1e3:.2f} ms/step, "
          f"{bs * K / dt:,.0f} samples/s", flush=True)


def probe_image_encoder(bs, variant=None, fused=False,
                        fused_attention=False, remat=False):
    import jax
    import jax.numpy as jnp
    from multimodal_plankton_recognition_tpu.models.image.registry import (
        create_backbone,
    )
    name = variant or "efficientnet_b0"
    extra = {"fused": True} if fused else {}
    if fused_attention:
        extra["fused_attention"] = True
    if remat:
        extra["remat"] = True
    enc = create_backbone(name, in_chans=1, dtype=jnp.bfloat16, **extra)
    x = jnp.asarray(np.random.RandomState(0).randn(bs, 224, 224, 1),
                    jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=False)

    def apply_fn(params, x):
        out, _ = enc.apply({"params": params,
                            "batch_stats": variables.get("batch_stats", {})},
                           x, train=True, mutable=["batch_stats"])
        return out

    if "batch_stats" not in variables:
        def apply_fn(params, x):  # noqa: F811 (ViT: no BN)
            return enc.apply({"params": params}, x, train=False)
    tag = " remat" if remat else ""
    _bwd_probe(f"{name}{tag} fwd+bwd", apply_fn, variables["params"], x)


def probe_profile_encoder(bs):
    import jax
    import jax.numpy as jnp
    from multimodal_plankton_recognition_tpu.models.profile.cnn import (
        ProfileCNN,
    )
    enc = ProfileCNN(dim_in=6, blocks=(2, 2, 2, 2), base_channels=32,
                     dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(bs, 224, 6), jnp.float32)
    variables = enc.init(jax.random.key(0), profile=x, train=False)

    def apply_fn(params, x):
        out, _ = enc.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           profile=x, train=True, mutable=["batch_stats"])
        return out

    _bwd_probe(f"profile_cnn fwd+bwd", apply_fn, variables["params"], x)


PROBES = {
    "train256": partial(probe_train_step, 256),
    "train256_remat": partial(probe_train_step, 256, remat=True),
    "train256_bn64": partial(probe_train_step_bnrows, 256, 64),
    "train256_bn32": partial(probe_train_step_bnrows, 256, 32),
    "train256_bn256": partial(probe_train_step_bnrows, 256, 256),
    "train512": partial(probe_train_step, 512),
    "train1024": partial(probe_train_step, 1024),
    "b0_256": partial(probe_image_encoder, 256),
    "b0_fused_256": partial(probe_image_encoder, 256, fused=True),
    "b0_remat_256": partial(probe_image_encoder, 256, remat=True),
    "b0_1024": partial(probe_image_encoder, 1024),
    "vit_256": partial(probe_image_encoder, 256, "vit_tiny_patch16_224"),
    "vit_s_256": partial(probe_image_encoder, 256, "vit_small_patch16_224"),
    "vit_s_256_fused": partial(probe_image_encoder, 256,
                               "vit_small_patch16_224",
                               fused_attention=True),
    "vit_train256": partial(probe_vit_train, 256),
    "vit_train256_fused": partial(probe_vit_train, 256,
                                  fused_attention=True),
    "vit_train256_fusedproj": partial(probe_vit_train, 256,
                                      fused_attention=True,
                                      fuse_proj=True),
    "vit_train256_fused_noproj": partial(probe_vit_train, 256,
                                         fused_attention=True,
                                         fuse_proj=False),
    "vit_train256_fused2": partial(probe_vit_train, 256,
                                   fused_attention=True, fused_ffn=True),
    "vit_train256_dpa": partial(probe_vit_train_dpa, 256),
    "vit_train256_bf16ln": partial(probe_vit_train_bf16ln, 256),
    "encode_b0_256": partial(probe_encode, "b0", 256),
    "encode_vit_256": partial(probe_encode, "vit", 256),
    "encode_vit_256_int8": partial(probe_encode, "vit", 256, int8=True),
    "vit_train512": partial(probe_vit_train, 512),
    "vit_train1024": partial(probe_vit_train, 1024),
    "cnn_256": partial(probe_profile_encoder, 256),
}


def main():
    from multimodal_plankton_recognition_tpu import (
        enable_compilation_cache, use_fast_prng, use_tpu_runtime_flags,
    )
    use_tpu_runtime_flags()
    enable_compilation_cache()
    use_fast_prng()
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        PROBES[n]()


if __name__ == "__main__":
    main()
