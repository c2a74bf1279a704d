"""Every coordination method trains through the full MultiModel apply
(reference methods: src/model.py:44-56 + ArcFace/Zero/Distance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_plankton_recognition_tpu.models import MultiModel


def _batch(B=4):
    rs = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rs.randn(B, 32, 32, 1), jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 100, (B, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(B, 16, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(5, 50, (B, 1)), jnp.int32),
    }


@pytest.mark.parametrize("coord,needs_label", [
    ({"method": "clip"}, False),
    ({"method": "siglip"}, False),
    ({"method": "clipplus", "beta": 0.5}, False),
    ({"method": "siglipplus"}, False),
    ({"method": "rank", "margin": 0.25}, False),
    ({"method": "distance"}, False),
    ({"method": "zero"}, False),
    ({"method": "arcface", "out_features": 3}, True),
])
def test_method_loss_and_grads(coord, needs_label):
    model = MultiModel(
        dim_embed=16,
        image_encoder_args={"name": "resnet18", "metadata": True},
        profile_encoder_args={"kind": "cnn", "dim_in": 6,
                              "blocks": (1, 1, 1, 1), "base_channels": 8},
        coordination_args=coord,
    )
    batch = _batch()
    label = jnp.asarray([0, 1, 2, 0]) if needs_label else None
    variables = model.init(jax.random.key(0), buckets=2, label=label, **batch)

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        loss, _ = model.apply(v, method="loss", buckets=2, label=label,
                              train=True, mutable=["batch_stats"],
                              rngs={"dropout": jax.random.key(1)}, **batch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    if coord["method"] != "zero":
        gnorm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree.leaves(grads))
        assert gnorm > 0


def test_arcface_end_to_end_via_driver(synthetic_dataset, tmp_path):
    """method: arcface trains through train_multi: labels wired through the
    collate, out_features derived from the training classes."""
    import yaml
    from multimodal_plankton_recognition_tpu.train.drivers import train_multi

    card = {
        "bs": 4, "dim_embedding": 8, "target_size": 32, "buckets": 2,
        "num_workers": 1, "patience": 5,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                                 "blocks": [1, 1, 1, 1], "base_channels": 8},
        "coordination_args": {"method": "arcface"},
        "optim_args": {"lr": 1e-2, "momentum": 0.9, "weight_decay": 0.0,
                       "nesterov": True},
        "trainer_args": {"precision": "32", "min_epochs": 1, "max_epochs": 2},
    }
    path = tmp_path / "arc.yaml"
    path.write_text(yaml.safe_dump(card))
    res = train_multi(synthetic_dataset, path, logdir=tmp_path / "l")
    assert np.isfinite([h["train_loss"] for h in res["history"]]).all()
