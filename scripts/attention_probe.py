#!/usr/bin/env python3
"""TPU hardware verification + microbenchmark for the fused attention kernel.

1. fwd/bwd numerical parity of ops/pallas/attention.mha_core against the
   jnp reference, compiled through Mosaic on the real chip (the CPU test
   suite only exercises interpret mode);
2. in-kernel dropout statistics (the TPU PRNG has no interpret mode);
3. fused-vs-flax MHA layer timing at both flagship shapes
   (ViT-T 3x64 @ L=197, ProfileTransformer 8x24 @ L=225).

Usage: python scripts/attention_probe.py [--bs 256]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

K = 20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from multimodal_plankton_recognition_tpu import (
        enable_compilation_cache, use_fast_prng,
    )
    from multimodal_plankton_recognition_tpu.ops.pallas.attention import (
        mha_core, mha_reference,
    )
    enable_compilation_cache()
    use_fast_prng()
    assert jax.default_backend() == "tpu", jax.default_backend()

    # --- 1. hardware parity -------------------------------------------------
    for heads, l, e in ((3, 197, 192), (8, 225, 192)):
        b = 8
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(b, l, e), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, l, e), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, l, e), jnp.bfloat16)
        pad = rs.rand(b, l) < 0.3
        pad[:, 0] = False
        bias = jnp.where(jnp.asarray(pad), -1e9, 0.0).astype(jnp.float32)
        seed = jnp.zeros((), jnp.int32)

        out = np.asarray(jax.jit(
            lambda q, k, v: mha_core(q, k, v, bias, seed, heads))(q, k, v),
            np.float32)
        ref = np.asarray(mha_reference(q, k, v, bias, heads), np.float32)
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"fwd parity h={heads} L={l}: max rel err {rel:.2e}")
        assert rel < 0.05, rel

        def loss_k(q, k, v):
            o = mha_core(q, k, v, bias, seed, heads)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_r(q, k, v):
            o = mha_reference(q, k, v, bias, heads)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
        for name, a, b_ in zip("qkv", gk, gr):
            a = np.asarray(a, np.float32)
            b_ = np.asarray(b_, np.float32)
            rel = np.abs(a - b_).max() / (np.abs(b_).max() + 1e-9)
            print(f"  d{name}: max rel err {rel:.2e}")
            assert rel < 0.06, (name, rel)

    # --- 2. dropout statistics ---------------------------------------------
    heads, b, l, e, p = 4, 4, 64, 64, 0.5
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(b, l, e), jnp.float32)
    kk = jnp.asarray(rs.randn(b, l, e), jnp.float32)
    v = jnp.asarray(rs.randn(b, l, e), jnp.float32)
    bias = jnp.zeros((b, l), jnp.float32)
    base = np.asarray(mha_core(q, kk, v, bias, jnp.zeros((), jnp.int32),
                               heads), np.float32)
    outs = [np.asarray(mha_core(q, kk, v, bias, jnp.asarray(s, jnp.int32),
                                heads, p, True), np.float32)
            for s in (7, 99, 1234, 5555)]
    assert not np.allclose(outs[0], outs[1]), "same mask for different seeds"
    avg = np.mean(outs, axis=0)
    err = np.abs(avg - base).mean() / (np.abs(base).mean() + 1e-9)
    print(f"dropout p={p}: seed-averaged rel deviation {err:.3f} "
          f"(unbiasedness, shrinks ~1/sqrt(n_seeds))")
    assert err < 0.8, err

    # --- 3. layer timing ----------------------------------------------------
    for heads, l, e in ((3, 197, 192), (8, 225, 192)):
        bs = args.bs
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(bs, l, e), jnp.bfloat16)

        def time_layer(mod, variables):
            @jax.jit
            def run(x):
                def body(c, _):
                    o = mod.apply(variables, c.astype(jnp.bfloat16))
                    return o.astype(c.dtype), jnp.mean(
                        o.astype(jnp.float32))
                return jax.lax.scan(body, x, jnp.arange(K))
            _, probes = run(x)
            np.asarray(probes)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, probes = run(x)
                np.asarray(probes)
                times.append(time.perf_counter() - t0)
            return min(times) / K * 1e3

        from multimodal_plankton_recognition_tpu.models.attention import (
            FusedSelfAttention,
        )
        fused = FusedSelfAttention(num_heads=heads, dropout_rate=0.0,
                                   dtype=jnp.bfloat16)
        vs = fused.init(jax.random.key(0), x)
        t_fused = time_layer(fused, vs)

        # kernel-only fwd timing of both head-extraction variants
        rs2 = np.random.RandomState(1)
        q = jnp.asarray(rs2.randn(bs, l, e), jnp.bfloat16)
        kk = jnp.asarray(rs2.randn(bs, l, e), jnp.bfloat16)
        vv = jnp.asarray(rs2.randn(bs, l, e), jnp.bfloat16)
        zb = jnp.zeros((bs, l), jnp.float32)
        z0 = jnp.zeros((), jnp.int32)
        for narrow in (True, False):
            @jax.jit
            def runk(q, kk, vv, _narrow=narrow):
                def body(c, _):
                    o = mha_core(c, kk, vv, zb, z0, heads,
                                 0.0, False, False, _narrow)
                    return o.astype(c.dtype), jnp.mean(
                        o.astype(jnp.float32))
                return jax.lax.scan(body, q, jnp.arange(K))
            _, pr = runk(q, kk, vv)
            np.asarray(pr)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, pr = runk(q, kk, vv)
                np.asarray(pr)
                ts.append(time.perf_counter() - t0)
            print(f"  mha_core fwd narrow={narrow}: "
                  f"{min(ts) / K * 1e3:.3f} ms")

        class _Flax(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.MultiHeadDotProductAttention(
                    num_heads=heads, dtype=jnp.bfloat16,
                    dropout_rate=0.0, deterministic=True)(x, x, x)

        flax_mod = _Flax()
        vf = flax_mod.init(jax.random.key(0), x)
        t_flax = time_layer(flax_mod, vf)
        print(f"MHA layer h={heads} L={l} bs={bs}: fused {t_fused:.3f} ms  "
              f"flax {t_flax:.3f} ms  ({t_flax / t_fused:.2f}x)")


if __name__ == "__main__":
    main()
