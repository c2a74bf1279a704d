"""End-to-end training smoke tests on the synthetic dataset (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_plankton_recognition_tpu.config import ModelCard
from multimodal_plankton_recognition_tpu.data import (
    MultiSet, ImageTransformTrain, ProfileTransformTrain, PairAugmentation,
    Loader, tokenize,
)
from multimodal_plankton_recognition_tpu.data.pipeline import (
    multi_collate_fn, image_collate_fn,
)
from multimodal_plankton_recognition_tpu.data.transforms import ImageTransforms
from multimodal_plankton_recognition_tpu.models import build
from multimodal_plankton_recognition_tpu.train import (
    make_optimizer, create_train_state, make_multi_steps,
    make_classifier_steps, Fitter, EarlyStopping, CheckpointManager,
)
from multimodal_plankton_recognition_tpu.train.checkpoint import (
    load_from_checkpoint,
)
from multimodal_plankton_recognition_tpu.utils import LabelVocab

TINY_MULTI_CARD = {
    "bs": 4,
    "dim_embedding": 16,
    "target_size": 32,
    "buckets": 2,
    "num_workers": 1,
    "patience": 3,
    "image_encoder_args": {"name": "resnet18", "metadata": True},
    "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                             "blocks": [1, 1, 1, 1], "base_channels": 8},
    "coordination_args": {"method": "clip"},
    "optim_args": {"lr": 1e-2, "momentum": 0.9, "weight_decay": 1e-4,
                   "nesterov": True},
    "trainer_args": {"precision": "32", "min_epochs": 1, "max_epochs": 2},
}


def _multi_loaders(split_dir, card):
    train_ds = MultiSet(split_dir / "train.csv",
                        ImageTransformTrain(card.target_size),
                        ProfileTransformTrain(card.target_size),
                        PairAugmentation())
    tok = tokenize.get_tokenizer("cnn", card.target_size)
    collate = multi_collate_fn(tok)
    train = Loader(train_ds, card.bs, collate, shuffle=True, drop_last=True,
                   num_workers=1, seed=0)
    return train


def test_multi_training_decreases_loss(synthetic_dataset, tmp_path):
    card = ModelCard.from_dict(dict(TINY_MULTI_CARD))
    model = build.build_multi_model(card)
    loader = _multi_loaders(synthetic_dataset, card)
    tx = make_optimizer(card.optim_args)
    sample = next(iter(loader))
    sample = jax.tree.map(jnp.asarray, sample)
    state = create_train_state(model, jax.random.key(0), sample, tx,
                               init_kwargs={"buckets": card.buckets})
    train_step, eval_step = make_multi_steps(model, tx, card.buckets)

    fitter = Fitter(train_step, eval_step, max_epochs=3)
    state = fitter.fit(state, loader, valid_loader=None)
    losses = [h["train_loss"] for h in fitter.history]
    assert len(losses) == 3
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimization is actually happening


def test_multi_determinism(synthetic_dataset):
    card = ModelCard.from_dict(dict(TINY_MULTI_CARD))
    model = build.build_multi_model(card)
    tx = make_optimizer(card.optim_args)

    def run():
        loader = _multi_loaders(synthetic_dataset, card)
        sample = jax.tree.map(jnp.asarray, next(iter(loader)))
        state = create_train_state(model, jax.random.key(0), sample, tx,
                                   init_kwargs={"buckets": card.buckets})
        train_step, _ = make_multi_steps(model, tx, card.buckets)
        loader2 = _multi_loaders(synthetic_dataset, card)
        losses = []
        for batch in loader2:
            state, loss = train_step(state, jax.tree.map(jnp.asarray, batch),
                                     jax.random.key(0))
            losses.append(float(loss))
        return losses

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)  # fixed PRNG => bitwise identical


def test_classifier_training_and_checkpoint(synthetic_dataset, tmp_path):
    card = ModelCard.from_dict({
        "bs": 4, "num_workers": 1, "patience": 5,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "optim_args": {"lr": 5e-3, "momentum": 0.9, "weight_decay": 0.0,
                       "nesterov": True},
        "trainer_args": {"precision": "32", "min_epochs": 1, "max_epochs": 2},
    })
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransforms(target_size=32),
                  lambda p, rng=None: p)  # profiles unused
    vocab = LabelVocab(ds.class_names)
    loader = Loader(ds, card.bs, image_collate_fn(vocab), shuffle=True,
                    drop_last=True, num_workers=1, seed=0)
    model = build.build_image_classifier(card, vocab.to_list())
    tx = make_optimizer(card.optim_args)
    sample = jax.tree.map(jnp.asarray, next(iter(loader)))
    inputs = {k: v for k, v in sample.items() if k != "label"}
    state = create_train_state(model, jax.random.key(0), inputs, tx)
    train_step, eval_step = make_classifier_steps(model, tx)

    ckpt = CheckpointManager(tmp_path / "ckpt", monitor="valid_acc",
                             mode="max", save_top_k=1,
                             metadata={"card": card.to_dict(), "kind": "image",
                                       "class_names": vocab.to_list()})
    stopper = EarlyStopping(monitor="valid_loss", mode="min", patience=5)
    fitter = Fitter(train_step, eval_step, checkpointer=ckpt,
                    early_stopping=stopper, max_epochs=2)
    state = fitter.fit(state, loader, valid_loader=loader)
    assert "valid_acc" in fitter.history[-1]
    assert ckpt.best_step() is not None

    # one-call restore (reference load_from_checkpoint UX)
    model2, variables, meta = load_from_checkpoint(tmp_path / "ckpt")
    assert meta["kind"] == "image"
    logits = model2.apply(variables, train=False, **inputs)
    assert logits.shape == (4, 3)


def test_early_stopping_semantics():
    es = EarlyStopping(monitor="valid_loss", mode="min", patience=2)
    assert not es.update(1.0)
    assert not es.update(float("nan"))   # check_finite=False: tolerated, 1 bad
    assert not es.update(0.9)            # improvement resets
    assert not es.update(1.1)            # 1 bad epoch
    assert es.update(1.2)                # 2 bad epochs == patience (Lightning)


def test_device_augment_training(synthetic_dataset):
    """train_multi with device_augment=True: host delivers oversized inputs,
    augmentation runs inside the jitted step; loss decreases."""
    import yaml, tempfile, os
    from multimodal_plankton_recognition_tpu.train.drivers import train_multi

    card = dict(TINY_MULTI_CARD)
    card["device_augment"] = True
    card["trainer_args"] = {"precision": "32", "min_epochs": 1,
                            "max_epochs": 5}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "card.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(card, f)
        res = train_multi(synthetic_dataset, path, logdir=os.path.join(td, "l"))
    losses = [h["train_loss"] for h in res["history"]]
    assert np.isfinite(losses).all()
    # tiny data + stochastic on-device augmentation: require overall descent
    assert min(losses[1:]) < losses[0]


def test_load_from_checkpoint_restores_best_not_latest(synthetic_dataset,
                                                       tmp_path):
    """With save_top_k > 1, one-call restore must rank by the monitored
    metric (was: a fresh orbax manager without best_fn returned latest)."""
    from multimodal_plankton_recognition_tpu.train.checkpoint import (
        read_metadata,
    )
    card = ModelCard.from_dict({
        "bs": 4, "num_workers": 1,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "trainer_args": {"precision": "32"},
    })
    model = build.build_image_classifier(card, ["a", "b", "c"])
    tx = make_optimizer(card.optim_args)
    rs = np.random.RandomState(0)
    inputs = {"image": jnp.asarray(rs.randn(4, 32, 32, 1), jnp.float32),
              "image_shape": jnp.ones((4, 2), jnp.int32)}
    state = create_train_state(model, jax.random.key(0), inputs, tx)

    ckpt = CheckpointManager(tmp_path / "ck", monitor="valid_acc",
                             mode="max", save_top_k=3,
                             metadata={"card": card.to_dict(),
                                       "kind": "image",
                                       "class_names": ["a", "b", "c"]})
    # best at epoch 1, NOT the latest (epoch 2)
    for epoch, acc in [(0, 0.2), (1, 0.9), (2, 0.5)]:
        marked = state.replace(step=epoch)
        assert ckpt.save(epoch, marked, {"valid_acc": acc})
    ckpt.wait()
    assert ckpt.best_step() == 1
    assert read_metadata(tmp_path / "ck")["_monitor"] == "valid_acc"

    _, variables, meta = load_from_checkpoint(tmp_path / "ck")
    # restored params come from the step-1 state (step field saved alongside)
    restored = CheckpointManager(tmp_path / "ck", monitor="valid_acc",
                                 mode="max").restore()
    assert restored["step"] == 1
