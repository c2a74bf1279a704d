"""Fused FFN kernel + module parity tests (interpret mode on CPU; the same
kernels compile through Mosaic on TPU — hardware numbers in docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.ops.pallas.experimental.ffn import (
    ffn_core, ffn_reference,
)


def _setup(b, l, e, f, seed=0, dtype=jnp.bfloat16):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, l, e), dtype)
    w1 = jnp.asarray(rs.randn(e, f) * 0.1, jnp.float32)
    b1 = jnp.asarray(rs.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rs.randn(f, e) * 0.1, jnp.float32)
    b2 = jnp.asarray(rs.randn(e) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("activation", ["gelu", "relu"])
def test_kernel_matches_reference_fwd(activation):
    b, l, e, f = 3, 29, 64, 256
    x, w1, b1, w2, b2 = _setup(b, l, e, f)
    seed = jnp.zeros((), jnp.int32)
    out = ffn_core(x, w1, b1, w2, b2, seed, activation, 0.0, False, True)
    ref = ffn_reference(x, w1, b1, w2, b2, activation)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_kernel_matches_reference_grad():
    b, l, e, f = 2, 17, 32, 64
    x, w1, b1, w2, b2 = _setup(b, l, e, f, dtype=jnp.float32)
    seed = jnp.zeros((), jnp.int32)

    def loss_kernel(x, w1, b1, w2, b2):
        o = ffn_core(x, w1, b1, w2, b2, seed, "gelu", 0.0, False, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        o = ffn_reference(x, w1, b1, w2, b2, "gelu")
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for name, a, b_ in zip("x w1 b1 w2 b2".split(), gk, gr):
        a = np.asarray(a, np.float32).ravel()
        b_ = np.asarray(b_, np.float32).ravel()
        denom = np.abs(b_).max() + 1e-9
        assert np.abs(a - b_).max() / denom < 0.06, name


def test_encoders_build_with_fused_ffn_same_tree():
    """fused_ffn keeps the exact nn.Dense parameter tree (checkpoints
    interchangeable) for both transformer families."""
    from multimodal_plankton_recognition_tpu.models.profile.factory import (
        create_profile_encoder,
    )
    from multimodal_plankton_recognition_tpu.models.image.registry import (
        create_backbone,
    )

    args = {"kind": "transformer", "dim_in": 6, "dim_hidden": 32,
            "num_head": 4, "num_layers": 1, "target_size": 16,
            "dim_feedforward": 64}
    enc_a = create_profile_encoder(dict(args, fused_ffn=True))
    enc_b = create_profile_encoder(args)
    prof = jnp.zeros((2, 17, 6))
    time = jnp.zeros((2, 17), jnp.int32)
    mask = jnp.zeros((2, 17), bool)
    plen = jnp.ones((2, 1), jnp.int32)
    va = enc_a.init(jax.random.key(0), prof, time, mask, plen)
    vb = enc_b.init(jax.random.key(0), prof, time, mask, plen)
    assert jax.tree.structure(va) == jax.tree.structure(vb)
    # same params -> same eval output via both paths (CPU fallback math)
    oa = enc_a.apply(vb, prof, time, mask, plen)
    ob = enc_b.apply(vb, prof, time, mask, plen)
    np.testing.assert_allclose(np.asarray(oa, np.float32),
                               np.asarray(ob, np.float32),
                               rtol=2e-2, atol=2e-2)

    vit_a = create_backbone("vit_tiny_patch16_224", in_chans=1,
                            fused_ffn=True)
    vit_b = create_backbone("vit_tiny_patch16_224", in_chans=1)
    img = jnp.zeros((1, 224, 224, 1))
    pa = vit_a.init(jax.random.key(0), img)
    pb = vit_b.init(jax.random.key(0), img)
    assert jax.tree.structure(pa) == jax.tree.structure(pb)
