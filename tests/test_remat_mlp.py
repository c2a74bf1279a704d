"""apply_remat_ffn parity: the recompute-in-backward MLP path must match
the plain nn.Dense composition exactly (deterministic) — forward, grads,
and the param tree (same init applies to both paths). The perf claim
lives in docs/PERF.md; this pins the math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_plankton_recognition_tpu.models.image.vit import _Block
from multimodal_plankton_recognition_tpu.models.profile.transformer import (
    _EncoderLayer,
)


def _toggle(monkeypatch, on: bool):
    monkeypatch.setenv("PLANKTON_REMAT_MLP", "1" if on else "0")


def test_vit_block_remat_matches_plain(monkeypatch):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 17, 32), jnp.float32)
    blk = _Block(dim=32, num_heads=4, mlp_ratio=2.0, dropout=0.0,
                 dtype=jnp.float32)
    v = blk.init(jax.random.key(0), x, deterministic=True)

    def loss(params):
        return jnp.sum(blk.apply({"params": params}, x,
                                 deterministic=True) ** 2)

    _toggle(monkeypatch, False)
    o0, g0 = blk.apply(v, x, deterministic=True), jax.grad(loss)(v["params"])
    _toggle(monkeypatch, True)
    o1, g1 = blk.apply(v, x, deterministic=True), jax.grad(loss)(v["params"])
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_encoder_layer_remat_matches_plain(monkeypatch):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 9, 24), jnp.float32)
    layer = _EncoderLayer(dim_hidden=24, num_head=4, dim_feedforward=48,
                          dropout=0.0, activation="gelu",
                          dtype=jnp.float32)
    v = layer.init(jax.random.key(0), x, None, deterministic=True)
    _toggle(monkeypatch, False)
    o0 = layer.apply(v, x, None, deterministic=True)
    _toggle(monkeypatch, True)
    o1 = layer.apply(v, x, None, deterministic=True)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)


def test_remat_train_mode_dropout_finite(monkeypatch):
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 17, 32), jnp.float32)
    blk = _Block(dim=32, num_heads=4, mlp_ratio=2.0, dropout=0.3,
                 dtype=jnp.float32)
    v = blk.init(jax.random.key(0), x, deterministic=True)
    _toggle(monkeypatch, True)

    def loss(params):
        o = blk.apply({"params": params}, x, deterministic=False,
                      rngs={"dropout": jax.random.key(3)})
        return jnp.sum(o ** 2)

    val, grads = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(val))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g, np.float32)).all()
