"""shard_map train-step parity vs the GSPMD path on the 8-device CPU mesh.

The shard_map step exists so multi-chip meshes keep the Pallas kernel paths
(ops/kernels.py gating); these tests pin that the per-chip program + pmean'd
gradients produce the SAME training trajectory as the plain jitted step:

1. bucketed negatives: one shard_map step == one single-device step
   (loss and post-step params);
2. global negatives: one shard_map step (all_gather losses, reduce=False +
   pmean grads — the collective-transpose gradient path) == one
   single-device step with buckets=1 (whole batch one contrastive group);
3. Pallas kernels execute inside shard_map (interpret mode, forced via the
   env escape hatch) and agree with the fallback trace.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.config import OptimConfig
from multimodal_plankton_recognition_tpu.models import MultiModel
from multimodal_plankton_recognition_tpu.parallel import (
    create_mesh, shard_batch,
)
from multimodal_plankton_recognition_tpu.parallel.mesh import replicate_state
from multimodal_plankton_recognition_tpu.train import (
    create_train_state, make_multi_steps, make_multi_steps_shard_map,
    make_optimizer,
)


def _model(method="clip", dtype=jnp.float32, fused=False, dropout=0.0):
    return MultiModel(
        dim_embed=16,
        image_encoder_args={"name": "vit_tiny_patch16_224", "in_chans": 1,
                            "metadata": True, "dropout": dropout,
                            "fused_attention": fused,
                            "backbone_kwargs": {"img_size": 32, "depth": 1,
                                                "dropout": dropout}},
        profile_encoder_args={"kind": "transformer", "dim_in": 6,
                              "dim_hidden": 32, "num_layers": 1,
                              "num_head": 4, "target_size": 16,
                              "dim_feedforward": 64, "dropout": dropout,
                              "fused_attention": fused},
        coordination_args={"method": method, "fused": fused},
        dtype=dtype,
    )


def _batch(bs=16, img=32, plen=17, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rs.randn(bs, img, img, 1), jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 400, (bs, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(bs, plen, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(5, 200, (bs, 1)), jnp.int32),
        "time": jnp.asarray(np.tile(np.arange(plen, dtype=np.int32),
                                    (bs, 1))),
        "padding_mask": jnp.zeros((bs, plen), jnp.bool_),
    }


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return create_mesh()


def _setup(model, batch, buckets):
    tx = make_optimizer(OptimConfig(lr=1e-2, momentum=0.9,
                                    weight_decay=1e-4, nesterov=True))
    state = create_train_state(model, jax.random.key(0), batch, tx,
                               init_kwargs={"buckets": buckets})
    return tx, state


def _max_rel(tree_a, tree_b):
    worst = 0.0
    for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1e-6, float(np.abs(b).max()))
        worst = max(worst, float(np.abs(a - b).max()) / scale)
    return worst


@pytest.mark.parametrize("method,negatives,buckets", [
    ("clip", "bucketed", 8),
    ("siglip", "bucketed", 8),
    ("clip", "global", 1),
    ("siglip", "global", 1),
    ("clipplus", "global", 1),
])
def test_shard_step_matches_single_device(mesh, method, negatives, buckets):
    model = _model(method=method)
    batch = _batch()
    tx, state = _setup(model, batch, max(buckets, 1))

    ref_train, ref_eval = make_multi_steps(model, tx,
                                           buckets=buckets if
                                           negatives == "bucketed" else 1)
    # the reference step donates its state arg; run it on copies
    ref_state = jax.tree.map(jnp.copy, state)
    ref_state2, ref_loss = ref_train(ref_state, dict(batch),
                                     jax.random.key(1))

    sh_train, sh_eval = make_multi_steps_shard_map(
        model, tx, mesh, buckets=buckets, negatives=negatives)
    st = replicate_state(jax.tree.map(jnp.copy, state), mesh)
    sb = shard_batch(dict(batch), mesh)
    sh_state2, sh_loss = sh_train(st, sb, jax.random.key(1))

    np.testing.assert_allclose(float(sh_loss), float(ref_loss),
                               rtol=2e-5, atol=1e-6)
    assert _max_rel(sh_state2.params, ref_state2.params) < 5e-4
    ev_ref = ref_eval(ref_state2, dict(batch))
    ev_sh = sh_eval(sh_state2, shard_batch(dict(batch), mesh))
    np.testing.assert_allclose(float(ev_sh["loss"]), float(ev_ref["loss"]),
                               rtol=2e-5, atol=1e-6)


def test_shard_step_rejects_indivisible_buckets(mesh):
    model = _model()
    tx = make_optimizer(OptimConfig())
    with pytest.raises(ValueError, match="divisible"):
        make_multi_steps_shard_map(model, tx, mesh, buckets=4,
                                   negatives="bucketed")


def test_pallas_kernels_run_inside_shard_map(mesh, monkeypatch):
    """Force the interpret-mode kernels inside the per-chip trace: the
    fused attention + fused contrastive paths must execute under shard_map
    and agree with the einsum/jnp fallback step (bf16 tolerance). This is
    the multi-chip validation that lets the kernels stay enabled on real
    multi-chip TPU meshes (round-2 verdict #3)."""
    batch = _batch()
    model_fb = _model(dtype=jnp.bfloat16, fused=False)
    tx, state = _setup(model_fb, batch, 8)

    # bucketed mode routes through CoordinationHead, so the fused
    # contrastive kernel is exercised too (global mode bypasses the head)
    sh_fb, _ = make_multi_steps_shard_map(model_fb, tx, mesh, buckets=8,
                                          negatives="bucketed")
    st = replicate_state(jax.tree.map(jnp.copy, state), mesh)
    _, loss_fb = sh_fb(st, shard_batch(dict(batch), mesh),
                       jax.random.key(1))
    loss_fb = float(loss_fb)

    monkeypatch.setenv("PLANKTON_FUSED_INTERPRET", "1")
    model_k = _model(dtype=jnp.bfloat16, fused=True)
    sh_k, _ = make_multi_steps_shard_map(model_k, tx, mesh, buckets=8,
                                         negatives="bucketed")
    st = replicate_state(jax.tree.map(jnp.copy, state), mesh)
    state_k, loss_k = sh_k(st, shard_batch(dict(batch), mesh),
                           jax.random.key(1))
    assert np.isfinite(float(loss_k))
    np.testing.assert_allclose(float(loss_k), loss_fb, rtol=0.05, atol=0.05)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(state_k.params)[0], np.float32)).all()
