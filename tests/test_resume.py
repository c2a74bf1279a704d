"""Checkpoint-resume test: training continues from the saved step with the
full optimizer state (SURVEY aux-subsystem commitment; the reference has no
mid-run resume)."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from multimodal_plankton_recognition_tpu.train.drivers import train_multi

TINY_CARD = {
    "bs": 4, "dim_embedding": 8, "target_size": 32, "buckets": 2,
    "num_workers": 1, "patience": 10, "save_top_k": 1,
    "image_encoder_args": {"name": "resnet18", "metadata": True},
    "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                             "blocks": [1, 1, 1, 1], "base_channels": 8},
    "coordination_args": {"method": "clip"},
    "optim_args": {"lr": 1e-2, "momentum": 0.9, "weight_decay": 0.0,
                   "nesterov": True},
    "trainer_args": {"precision": "32", "min_epochs": 1, "max_epochs": 1},
}


def test_resume_across_mesh_sizes(synthetic_dataset, tmp_path):
    """Elastic restore: a checkpoint saved under one mesh size resumes
    under a different one (orbax restores host arrays; the driver re-places
    them on whatever mesh the card requests). Production concern with no
    reference counterpart — the reference is single-device."""
    card = dict(TINY_CARD, bs=8, mesh={"data": 8})
    card_path = tmp_path / "card8.yaml"
    card_path.write_text(yaml.safe_dump(card))
    first = train_multi(synthetic_dataset, card_path, logdir=tmp_path / "m8")
    ckpt_dir = f"{first['logdir']}/checkpoints"
    steps_after_first = int(first["state"].step)

    for n_data in (2, 1):
        card_n = dict(card, mesh={"data": n_data})
        card_n_path = tmp_path / f"card{n_data}.yaml"
        card_n_path.write_text(yaml.safe_dump(card_n))
        res = train_multi(synthetic_dataset, card_n_path,
                          logdir=tmp_path / f"m{n_data}", resume=ckpt_dir)
        assert int(res["state"].step) == 2 * steps_after_first
        assert np.isfinite(res["history"][-1]["train_loss"])


def test_templateless_restore_is_device_agnostic(tmp_path):
    """No-template restore reads host numpy (train/checkpoint._restore_host)
    so a checkpoint saved on one backend opens on a host with different
    devices — orbax's default restore pins the SAVING process's device ids
    (e.g. TFRT_CPU_0) and fails on a TPU host (observed on hardware;
    VALIDATION.md). Cross-backend itself can't run in CI, but this pins the
    numpy path and value fidelity."""
    from multimodal_plankton_recognition_tpu.train.checkpoint import (
        CheckpointManager, load_from_checkpoint,
    )
    from multimodal_plankton_recognition_tpu.train.state import TrainState
    from multimodal_plankton_recognition_tpu.models import build
    from multimodal_plankton_recognition_tpu.config import ModelCard
    import optax

    card = ModelCard.from_dict(dict(TINY_CARD))
    model = build.build_multi_model(card)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32),
        "image_shape": jnp.asarray(rng.integers(50, 99, (2, 2)), jnp.int32),
        "profile": jnp.asarray(rng.normal(size=(2, 32, 6)), jnp.float32),
        "profile_len": jnp.asarray(rng.integers(5, 99, (2, 1)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), buckets=2, **batch)
    tx = optax.sgd(1e-2)
    state = TrainState(step=3, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    mngr = CheckpointManager(tmp_path / "ck", monitor="valid_loss",
                             save_top_k=1,
                             metadata={"card": card.to_dict(),
                                       "kind": "multi", "class_names": []})
    assert mngr.save(0, state, {"valid_loss": 0.5})
    mngr.wait()
    mngr.close()

    fresh = CheckpointManager(tmp_path / "ck", monitor="valid_loss",
                              save_top_k=1)
    restored = fresh.restore()
    fresh.close()
    assert restored["step"] == 3
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(state.params)):
        assert isinstance(a, np.ndarray)  # host arrays, no device pinning
        np.testing.assert_array_equal(a, np.asarray(b))

    _, variables2, _ = load_from_checkpoint(tmp_path / "ck")
    for a, b in zip(jax.tree.leaves(variables2["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_from_checkpoint(synthetic_dataset, tmp_path):
    card_path = tmp_path / "card.yaml"
    card_path.write_text(yaml.safe_dump(TINY_CARD))

    first = train_multi(synthetic_dataset, card_path, logdir=tmp_path / "l1")
    ckpt_dir = f"{first['logdir']}/checkpoints"
    steps_after_first = int(first["state"].step)
    assert steps_after_first > 0

    second = train_multi(synthetic_dataset, card_path,
                         logdir=tmp_path / "l2", resume=ckpt_dir)
    # resumed run starts counting steps from the restored step
    assert int(second["state"].step) == 2 * steps_after_first
    # and its first-epoch loss should differ from a cold start (params moved)
    assert second["history"][0]["train_loss"] != first["history"][0]["train_loss"]
