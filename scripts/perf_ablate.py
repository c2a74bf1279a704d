#!/usr/bin/env python3
"""Ablation probes for the EfficientNet-B0 hot path on TPU.

Times surgically modified B0 variants (fwd+bwd, bs=256, bf16) to attribute
the step time: SE blocks, depthwise convs, BatchNorm stats, stem layout,
per-stage cumulative cost. Uses the same honest scan+fetch protocol as
perf_probe.py. Also prints XLA's own cost analysis (flops / bytes accessed)
for the full step so compute- vs bandwidth-bound is evident.

Usage: python scripts/perf_ablate.py [name ...]   (default: all)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

K = 20
REPS = 3
BS = 256


def _time_scan(fn, *args) -> float:
    import jax
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _build_variant(*, se=True, dw=True, bn_train=True, stages=7,
                   s2d=False, dtype=None):
    """A parameterized B0 clone (local to this diagnostic; the real model is
    models/image/efficientnet.py)."""
    import jax.numpy as jnp
    import flax.linen as nn

    dtype = dtype or jnp.bfloat16
    STAGES = (
        (1, 16, 1, 1, 3),
        (6, 24, 2, 2, 3),
        (6, 40, 2, 2, 5),
        (6, 80, 3, 2, 3),
        (6, 112, 3, 1, 5),
        (6, 192, 4, 2, 5),
        (6, 320, 1, 1, 3),
    )[:stages]

    class V(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool):
            x = x.astype(dtype)
            if s2d:
                # space-to-depth block 2: 224x224x1 -> 112x112x4, then a
                # stride-1 2x2 conv replaces the 3x3 s2 stem (equivalent
                # receptive field embedded in a 4x4 window)
                b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // 2, w // 2, 4 * c)
                x = nn.Conv(32, (2, 2), padding=[(1, 0), (1, 0)],
                            use_bias=False, dtype=dtype, name="stem_conv")(x)
            else:
                x = nn.Conv(32, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=dtype, name="stem_conv")(x)
            x = nn.BatchNorm(use_running_average=not (train and bn_train),
                             dtype=dtype, name="stem_bn")(x)
            x = nn.silu(x)
            in_ch = 32
            for si, (expand, ch, reps, stride, kernel) in enumerate(STAGES):
                for bi in range(reps):
                    s = stride if bi == 0 else 1
                    name = f"s{si}_b{bi}"
                    idn = x
                    mid = in_ch * expand
                    y = x
                    if expand != 1:
                        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=dtype,
                                    name=f"{name}_exp")(y)
                        y = nn.BatchNorm(
                            use_running_average=not (train and bn_train),
                            dtype=dtype, name=f"{name}_expbn")(y)
                        y = nn.silu(y)
                    p = kernel // 2
                    if dw:
                        y = nn.Conv(mid, (kernel, kernel), strides=(s, s),
                                    padding=[(p, p), (p, p)],
                                    feature_group_count=mid, use_bias=False,
                                    dtype=dtype, name=f"{name}_dw")(y)
                        y = nn.BatchNorm(
                            use_running_average=not (train and bn_train),
                            dtype=dtype, name=f"{name}_dwbn")(y)
                        y = nn.silu(y)
                    elif s != 1:
                        y = y[:, ::s, ::s, :]
                    if se:
                        sq = jnp.mean(y, axis=(1, 2), keepdims=True)
                        r = max(1, in_ch // 4)
                        sq = nn.Conv(r, (1, 1), dtype=dtype,
                                     name=f"{name}_ser")(sq)
                        sq = nn.silu(sq)
                        sq = nn.Conv(y.shape[-1], (1, 1), dtype=dtype,
                                     name=f"{name}_see")(sq)
                        y = y * nn.sigmoid(sq)
                    y = nn.Conv(ch, (1, 1), use_bias=False, dtype=dtype,
                                name=f"{name}_prj")(y)
                    y = nn.BatchNorm(
                        use_running_average=not (train and bn_train),
                        dtype=dtype, name=f"{name}_prjbn")(y)
                    if s == 1 and in_ch == ch:
                        y = y + idn
                    x = y
                    in_ch = ch
            x = nn.Conv(1280, (1, 1), use_bias=False, dtype=dtype,
                        name="head")(x)
            x = nn.BatchNorm(use_running_average=not (train and bn_train),
                             dtype=dtype, name="headbn")(x)
            x = nn.silu(x)
            return jnp.mean(x, axis=(1, 2))

    return V()


def run_variant(label, cost=False, **kw):
    import jax
    import jax.numpy as jnp

    enc = _build_variant(**kw)
    x = jnp.asarray(np.random.RandomState(0).randn(BS, 224, 224, 1),
                    jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=False)

    def loss_fn(p, x):
        out, _ = enc.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def run_k(params, x):
        def body(p, i):
            loss, g = grad_fn(p, x)
            p2 = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
            return p2, loss
        return jax.lax.scan(body, params, jnp.arange(K))

    if cost:
        comp = run_k.lower(variables["params"], x).compile()
        ca = comp.cost_analysis()
        if ca:
            fl = ca.get("flops", 0) / K
            by = ca.get("bytes accessed", 0) / K
            print(f"  [{label}] XLA est/step: {fl / 1e9:.1f} GFLOP, "
                  f"{by / 1e9:.2f} GB accessed", flush=True)

    dt = _time_scan(run_k, variables["params"], x)
    ms = dt / K * 1e3
    print(f"{label}: {ms:.2f} ms/step ({BS * K / dt:,.0f} img/s)",
          flush=True)


VARIANTS = {
    "full": dict(cost=True),
    "fwd_eval_bn": dict(bn_train=False),
    "no_se": dict(se=False),
    "no_dw": dict(dw=False),
    "s2d_stem": dict(s2d=True),
    "f32": dict(dtype="f32"),
    "stages3": dict(stages=3),
    "stages5": dict(stages=5),
}


def main():
    from multimodal_plankton_recognition_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        kw = dict(VARIANTS[n])
        if kw.get("dtype") == "f32":
            kw["dtype"] = jnp.float32
        run_variant(n, **kw)


if __name__ == "__main__":
    main()
