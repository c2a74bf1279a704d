"""Pallas fused-loss kernels vs. the reference-parity jnp losses.

Runs in interpret mode on CPU; the same kernels compile through Mosaic on
TPU (exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_plankton_recognition_tpu.ops import losses
from multimodal_plankton_recognition_tpu.ops.pallas.contrastive import (
    clip_loss_fused, siglip_loss_fused,
)


def _embs(B=32, D=64, seed=0):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(B, D), jnp.float32),
            jnp.asarray(rs.randn(B, D), jnp.float32))


@pytest.mark.parametrize("buckets", [1, 2, 4])
def test_clip_forward_matches(buckets):
    i, p = _embs()
    scale = jnp.asarray(0.7)
    fused = clip_loss_fused(i, p, scale, buckets, True)
    ref = losses.clip_loss(i, p, scale, buckets)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


@pytest.mark.parametrize("buckets", [1, 4])
def test_clip_gradients_match(buckets):
    i, p = _embs(seed=1)
    scale = jnp.asarray(0.3)

    g_fused = jax.grad(
        lambda a, b, s: clip_loss_fused(a, b, s, buckets, True),
        argnums=(0, 1, 2))(i, p, scale)
    g_ref = jax.grad(
        lambda a, b, s: losses.clip_loss(a, b, s, buckets),
        argnums=(0, 1, 2))(i, p, scale)
    for fused, ref in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-6, rtol=1e-4)


@pytest.mark.parametrize("buckets", [1, 2])
def test_siglip_forward_matches(buckets):
    i, p = _embs(seed=2)
    scale, bias = jnp.asarray(0.5), jnp.asarray(-10.0)
    fused = siglip_loss_fused(i, p, scale, bias, buckets, True)
    ref = losses.siglip_loss(i, p, scale, bias, buckets)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_siglip_gradients_match():
    i, p = _embs(B=16, D=32, seed=3)
    scale, bias = jnp.asarray(0.5), jnp.asarray(-10.0)
    g_fused = jax.grad(
        lambda a, b, s, t: siglip_loss_fused(a, b, s, t, 2, True),
        argnums=(0, 1, 2, 3))(i, p, scale, bias)
    g_ref = jax.grad(
        lambda a, b, s, t: losses.siglip_loss(a, b, s, t, 2),
        argnums=(0, 1, 2, 3))(i, p, scale, bias)
    for fused, ref in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-6, rtol=1e-4)


def test_clip_fused_under_jit_and_grad_scale():
    """Fused loss works under jit, and upstream cotangents propagate."""
    i, p = _embs(B=8, D=16, seed=4)
    scale = jnp.asarray(0.1)

    @jax.jit
    def f(a, b, s):
        return 3.0 * clip_loss_fused(a, b, s, 2, True)

    g = jax.grad(f)(i, p, scale)
    g_ref = jax.grad(
        lambda a, b, s: 3.0 * losses.clip_loss(a, b, s, 2))(i, p, scale)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-4)


def test_multimodel_fused_coordination_matches_unfused():
    """CoordinationHead(fused=True) (interpret mode on CPU) equals the jnp
    path through the full model apply."""
    from multimodal_plankton_recognition_tpu.models import MultiModel

    def build(fused):
        return MultiModel(
            dim_embed=16,
            image_encoder_args={"name": "resnet18", "metadata": True},
            profile_encoder_args={"kind": "cnn", "dim_in": 6,
                                  "blocks": (1, 1, 1, 1), "base_channels": 8},
            coordination_args={"method": "clip", "fused": fused},
        )

    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.randn(4, 32, 32, 1), jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 100, (4, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(4, 16, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(5, 50, (4, 1)), jnp.int32),
    }
    m0, m1 = build(False), build(True)
    v = m0.init(jax.random.key(0), buckets=2, **batch)
    l0, _ = m0.apply(v, method="loss", buckets=2, train=True,
                     mutable=["batch_stats"],
                     rngs={"dropout": jax.random.key(1)}, **batch)
    l1, _ = m1.apply(v, method="loss", buckets=2, train=True,
                     mutable=["batch_stats"],
                     rngs={"dropout": jax.random.key(1)}, **batch)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)

