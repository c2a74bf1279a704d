"""Full pipeline integration test: train_multi driver -> encode -> retrieval
benchmark, all on the synthetic dataset on CPU. Exercises every layer
(L2-L7 of the reference's stack)."""

import pickle

import numpy as np
import pytest
import yaml

from multimodal_plankton_recognition_tpu.retrieval import (
    encode_split, encode_dataset,
)
from multimodal_plankton_recognition_tpu.retrieval.benchmark import run_suite
from multimodal_plankton_recognition_tpu.train.drivers import train_multi

TINY_CARD = {
    "bs": 4,
    "dim_embedding": 16,
    "target_size": 32,
    "buckets": 2,
    "num_workers": 2,
    "patience": 5,
    "save_top_k": 1,
    "image_encoder_args": {"name": "resnet18", "metadata": True},
    "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                             "blocks": [1, 1, 1, 1], "base_channels": 8},
    "coordination_args": {"method": "clip"},
    "optim_args": {"lr": 1e-2, "momentum": 0.9, "weight_decay": 1e-4,
                   "nesterov": True},
    "trainer_args": {"precision": "32", "min_epochs": 1, "max_epochs": 2},
}


@pytest.fixture(scope="module")
def trained_run(synthetic_dataset, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    card_path = tmp / "card.yaml"
    card_path.write_text(yaml.safe_dump(TINY_CARD))
    result = train_multi(synthetic_dataset, card_path, logdir=tmp / "logs")
    return result, tmp


def test_train_multi_driver(trained_run):
    result, _ = trained_run
    assert len(result["history"]) == 2
    assert all(np.isfinite(h["train_loss"]) for h in result["history"])
    assert result["best_step"] is not None


def test_encode_and_benchmark_raw(trained_run, synthetic_dataset):
    result, tmp = trained_run
    ckpt_dir = f"{result['logdir']}/checkpoints"
    entry = encode_dataset(ckpt_dir, synthetic_dataset / "test.csv",
                           batch_size=4, num_workers=1)
    n = len(entry["label"])
    assert entry["image"].shape == (n, 16)
    assert entry["profile"].shape == (n, 16)
    # embeddings are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(entry["image"], axis=1), 1.0,
                               rtol=1e-4)

    embeddings = {"tiny": {1: entry}}
    results = run_suite(embeddings, mode="raw", N=(2,), K=(1, 3),
                        repeats=2, th=1, seed=0)
    sub = results["tiny"][1][2]
    assert set(sub.keys()) == {0, 1}
    assert set(sub[0]["pred"].keys()) == {1, 3}
    assert len(sub[0]["pred"][1]) == len(sub[0]["true"])
    # predictions are class names from the vocabulary
    assert set(np.unique(sub[0]["pred"][1])) <= set(np.unique(entry["label"]))


def test_encode_split_and_benchmark_cross_folds(trained_run, synthetic_dataset):
    result, tmp = trained_run
    ckpt_dir = f"{result['logdir']}/checkpoints"
    entry = encode_split(ckpt_dir, synthetic_dataset,
                         batch_size=4, num_workers=1)
    assert set(entry.keys()) == {"train", "test", "classes"}

    embeddings = {"tiny": {1: entry}}
    results = run_suite(embeddings, mode="cross_folds", N=(2,), K=(1,),
                        repeats=1, seed=0)
    preds = results["tiny"][1][2][0]["pred"][1]
    assert set(preds.keys()) == {"I - I", "I - P", "I - I+P", "P - I",
                                 "P - P", "P - I+P", "I+P - I", "I+P - P"}


def test_train_image_driver_and_predict(synthetic_dataset, tmp_path):
    import yaml
    from multimodal_plankton_recognition_tpu.train.drivers import train_image
    from multimodal_plankton_recognition_tpu.retrieval import (
        predict_classifier,
    )

    card = {
        "bs": 4, "num_workers": 2, "patience": 5, "save_top_k": 1,
        "target_size": 32,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "optim_args": {"lr": 5e-3, "momentum": 0.9, "weight_decay": 0.0,
                       "nesterov": True},
        "trainer_args": {"precision": "32", "min_epochs": 1, "max_epochs": 2},
    }
    card_path = tmp_path / "img_card.yaml"
    card_path.write_text(yaml.safe_dump(card))
    res = train_image(synthetic_dataset, card_path, logdir=tmp_path / "logs")
    assert 0.0 <= res["test_acc"] <= 1.0
    assert any("valid_acc" in h for h in res["history"])

    out = predict_classifier(f"{res['logdir']}/checkpoints",
                             synthetic_dataset / "test.csv",
                             batch_size=4, num_workers=1)
    assert out["logits"].shape[1] == 3
    assert len(out["label"]) == out["logits"].shape[0]
