"""Sharded-loss and mesh tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.ops import losses
from multimodal_plankton_recognition_tpu.parallel import (
    create_mesh, batch_sharding, shard_batch,
    global_clip_loss, global_siglip_loss,
)
from multimodal_plankton_recognition_tpu.parallel.contrastive import (
    make_global_loss_shard_map,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return create_mesh()


def _embs(B=16, D=8, seed=0):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(B, D), jnp.float32),
            jnp.asarray(rs.randn(B, D), jnp.float32))


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 8, "model": 1}


def test_shard_batch(mesh):
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == batch_sharding(mesh).spec


def test_global_clip_matches_unsharded(mesh):
    i, p = _embs()
    scale = jnp.asarray(0.8)
    sharded_fn = make_global_loss_shard_map(global_clip_loss, mesh,
                                            n_scalars=1)
    sharded = float(sharded_fn(i, p, scale))
    expected = float(losses.clip_loss(i, p, scale, buckets=1))
    np.testing.assert_allclose(sharded, expected, rtol=1e-5)


def test_global_siglip_matches_unsharded(mesh):
    i, p = _embs(seed=1)
    scale, bias = jnp.asarray(0.5), jnp.asarray(-10.0)
    sharded_fn = make_global_loss_shard_map(global_siglip_loss, mesh,
                                            n_scalars=2)
    sharded = float(sharded_fn(i, p, scale, bias))
    expected = float(losses.siglip_loss(i, p, scale, bias, buckets=1))
    np.testing.assert_allclose(sharded, expected, rtol=1e-5)


def test_global_clip_gradients_match_unsharded(mesh):
    """Backward through the shard_map loss: embedding AND logit_scale
    cotangents must equal the unsharded gradients — a wrong transpose
    through all_gather/pmean would pass the forward-value tests and
    silently corrupt multi-chip training (round-2 verdict item)."""
    i, p = _embs(seed=3)
    scale = jnp.asarray(0.8)
    sharded_fn = make_global_loss_shard_map(global_clip_loss, mesh,
                                            n_scalars=1)
    g_sh = jax.grad(lambda a, b, s: sharded_fn(a, b, s),
                    argnums=(0, 1, 2))(i, p, scale)
    g_ref = jax.grad(
        lambda a, b, s: losses.clip_loss(a, b, s, buckets=1),
        argnums=(0, 1, 2))(i, p, scale)
    for name, a, b in zip(("d_image", "d_profile", "d_scale"), g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_global_siglip_gradients_match_unsharded(mesh):
    """Same for SigLIP: embeddings plus BOTH scalar params (scale, bias)."""
    i, p = _embs(seed=4)
    scale, bias = jnp.asarray(0.5), jnp.asarray(-10.0)
    sharded_fn = make_global_loss_shard_map(global_siglip_loss, mesh,
                                            n_scalars=2)
    g_sh = jax.grad(lambda a, b, s, t: sharded_fn(a, b, s, t),
                    argnums=(0, 1, 2, 3))(i, p, scale, bias)
    g_ref = jax.grad(
        lambda a, b, s, t: losses.siglip_loss(a, b, s, t, buckets=1),
        argnums=(0, 1, 2, 3))(i, p, scale, bias)
    for name, a, b in zip(("d_image", "d_profile", "d_scale", "d_bias"),
                          g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_bucketed_loss_under_gspmd(mesh):
    """The plain bucketed loss jitted over a sharded batch must equal the
    single-device value (GSPMD inserts collectives, result unchanged)."""
    i, p = _embs(seed=2)
    expected = float(losses.clip_loss(i, p, jnp.asarray(0.3), buckets=4))
    sharding = batch_sharding(mesh)
    i_s = jax.device_put(i, sharding)
    p_s = jax.device_put(p, sharding)
    fn = jax.jit(lambda a, b: losses.clip_loss(a, b, jnp.asarray(0.3), 4))
    np.testing.assert_allclose(float(fn(i_s, p_s)), expected, rtol=1e-5)


def test_batchnorm_global_stats_under_gspmd(mesh):
    """BatchNorm batch statistics computed under a data-sharded batch equal
    the single-device statistics (GSPMD turns the batch mean/var into a
    cross-replica reduction = sync-BN for free)."""
    import flax.linen as nn

    class BN(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.BatchNorm(use_running_average=not train)(x)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(16, 8), jnp.float32)
    m = BN()
    v = m.init(jax.random.key(0), x)

    def stats(x_in):
        out, upd = jax.jit(
            lambda v, x: m.apply(v, x, mutable=["batch_stats"]))(v, x_in)
        return out, upd["batch_stats"]

    out_ref, bs_ref = stats(x)
    x_sharded = jax.device_put(x, batch_sharding(mesh))
    out_sh, bs_sh = stats(x_sharded)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(bs_sh["BatchNorm_0"][k]),
            np.asarray(bs_ref["BatchNorm_0"][k]), atol=1e-6)


def test_make_global_batch_single_process(mesh):
    """Single-process degenerate case: local batch == global batch, sharded
    along the data axis."""
    from multimodal_plankton_recognition_tpu.parallel import multihost
    assert multihost.host_shard() == (0, 1)
    local = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    out = multihost.make_global_batch(local, mesh)
    assert out["x"].shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])
    assert out["x"].sharding.spec == batch_sharding(mesh).spec


def test_prefetch_to_device(mesh):
    from multimodal_plankton_recognition_tpu.data.pipeline import (
        prefetch_to_device,
    )
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2,
                                  sharding=batch_sharding(mesh)))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((8, 2), i))
