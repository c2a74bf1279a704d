"""Pretrained npz loading + metrics parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_plankton_recognition_tpu.models.pretrained import (
    flatten_params, unflatten_params, save_params_npz, load_pretrained_npz,
)
from multimodal_plankton_recognition_tpu.train.metrics import (
    precision_recall_f1, confusion_matrix,
)


def test_flatten_roundtrip():
    params = {"a": {"b": np.ones((2,)), "c": {"d": np.zeros((3,))}},
              "e": np.full((1,), 5.0)}
    flat = flatten_params(params)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_params(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], params["a"]["c"]["d"])


def test_save_and_load_npz(tmp_path):
    from multimodal_plankton_recognition_tpu.models.image.registry import (
        create_backbone,
    )
    model = create_backbone("resnet18", in_chans=1)
    x = jnp.zeros((1, 32, 32, 1))
    v1 = model.init(jax.random.key(0), x)
    v2 = model.init(jax.random.key(1), x)
    path = tmp_path / "weights.npz"
    save_params_npz(v1["params"], path)
    merged, stats = load_pretrained_npz(v2["params"], path)
    assert stats["skipped"] == 0 and stats["missing"] == 0
    f1 = flatten_params(v1["params"])
    fm = flatten_params(merged)
    for k in f1:
        np.testing.assert_array_equal(np.asarray(f1[k]), np.asarray(fm[k]))


def test_load_npz_shape_mismatch_skipped(tmp_path):
    params = {"w": np.zeros((2, 2), np.float32)}
    np.savez(tmp_path / "bad.npz", w=np.zeros((3, 3)), extra=np.ones(1))
    merged, stats = load_pretrained_npz(params, tmp_path / "bad.npz")
    assert stats["loaded"] == 0 and stats["skipped"] == 2
    with pytest.raises(KeyError):
        load_pretrained_npz(params, tmp_path / "bad.npz", strict=True)


def test_precision_recall_f1_matches_sklearn():
    from sklearn.metrics import precision_recall_fscore_support
    rs = np.random.RandomState(0)
    true = rs.randint(0, 5, 200)
    pred = rs.randint(0, 5, 200)
    m = precision_recall_f1(pred, true, 5)
    p, r, f, s = precision_recall_fscore_support(
        true, pred, labels=range(5), zero_division=0)
    np.testing.assert_allclose(m["precision"], p, rtol=1e-9)
    np.testing.assert_allclose(m["recall"], r, rtol=1e-9)
    np.testing.assert_allclose(m["f1"], f, rtol=1e-9)
    np.testing.assert_array_equal(m["support"], s)
    for avg, key in [("macro", "macro_f1"), ("weighted", "weighted_f1")]:
        _, _, f_avg, _ = precision_recall_fscore_support(
            true, pred, labels=range(5), average=avg, zero_division=0)
        np.testing.assert_allclose(m[key], f_avg, rtol=1e-9)


def test_confusion_matrix_matches_sklearn():
    from sklearn.metrics import confusion_matrix as sk_cm
    rs = np.random.RandomState(1)
    true = rs.randint(0, 4, 100)
    pred = rs.randint(0, 4, 100)
    np.testing.assert_array_equal(confusion_matrix(pred, true, 4),
                                  sk_cm(true, pred, labels=range(4)))
