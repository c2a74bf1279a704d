"""Exact kNN retrieval tests (replacement for pynndescent ANN)."""

import numpy as np

from multimodal_plankton_recognition_tpu.ops.knn import (
    ANNClassifier, weighted_mode, _topk_euclidean,
)
import jax.numpy as jnp


def test_topk_exact():
    rs = np.random.RandomState(0)
    gallery = rs.randn(50, 8).astype(np.float32)
    queries = rs.randn(5, 8).astype(np.float32)
    idx, dist = _topk_euclidean(jnp.asarray(queries), jnp.asarray(gallery), k=3)
    idx, dist = np.asarray(idx), np.asarray(dist)
    # brute-force oracle
    d2 = ((queries[:, None, :] - gallery[None]) ** 2).sum(-1)
    expected_idx = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_array_equal(idx, expected_idx)
    np.testing.assert_allclose(
        dist, np.sqrt(np.take_along_axis(d2, expected_idx, 1)), rtol=1e-4)


def test_weighted_mode_matches_sklearn():
    from sklearn.utils.extmath import weighted_mode as sk_weighted_mode
    rs = np.random.RandomState(1)
    classes = rs.randint(0, 5, (20, 7))
    weights = rs.rand(20, 7)
    ours = weighted_mode(classes, weights)
    theirs, _ = sk_weighted_mode(classes, weights, axis=1)
    np.testing.assert_array_equal(ours, theirs.ravel().astype(int))


def test_classifier_predict_separable():
    rs = np.random.RandomState(2)
    centers = np.eye(3, 8, dtype=np.float32) * 10
    X = np.concatenate([centers[i] + rs.randn(20, 8).astype(np.float32) * 0.1
                        for i in range(3)])
    y = np.repeat(np.arange(3), 20)
    clf = ANNClassifier(X, y, n_neighbors=32, metric="euclidean",
                        random_state=0)  # pynndescent kwargs accepted
    queries = centers + rs.randn(3, 8).astype(np.float32) * 0.1
    pred = clf.predict(queries, k=5, epsilon=0.3)
    np.testing.assert_array_equal(pred, [0, 1, 2])


def test_classifier_multimodal_fusion():
    """Two query modalities h-stack their neighbor lists (reference
    src/ann.py:15-21 semantics)."""
    X = np.array([[0.0, 0], [10, 10]], np.float32)
    y = np.array([0, 1])
    clf = ANNClassifier(X, y)
    qa = np.array([[0.1, 0]], np.float32)    # near class 0
    qb = np.array([[9.9, 10]], np.float32)   # near class 1
    # single modality
    assert clf.predict(qa, k=1)[0] == 0
    # fused: the closer hit dominates by inverse-distance weighting
    pred = clf.predict(qa, qb, k=1)
    assert pred.shape == (1,)


def test_exact_hit_inf_weight():
    X = np.array([[0.0, 0], [1, 1], [2, 2]], np.float32)
    y = np.array([0, 1, 1])
    clf = ANNClassifier(X, y)
    # query exactly on the class-0 point; k=3 includes two class-1 votes,
    # but the d=0 hit takes all the mass
    pred = clf.predict(np.array([[0.0, 0]], np.float32), k=3)
    assert pred[0] == 0


def test_run_suite_tolerates_unknown_classes():
    """Labels absent from the checkpoint's class vocabulary (e.g. rare
    classes the split excluded from training) are thresholded away instead
    of crashing coder.transform."""
    from multimodal_plankton_recognition_tpu.retrieval.benchmark import (
        run_suite,
    )
    rs = np.random.RandomState(0)
    n = 40
    labels = np.array(["a"] * 18 + ["b"] * 18 + ["rare"] * 4)
    entry = {
        "image": rs.randn(n, 8).astype(np.float32),
        "profile": rs.randn(n, 8).astype(np.float32),
        "label": labels,
        "classes": np.array(["a", "b"]),  # 'rare' unseen at train time
    }
    results = run_suite({"m": {1: entry}}, mode="raw", N=(2,), K=(1,),
                        repeats=1, th=10, seed=0)
    preds = results["m"][1][2][0]
    # rare class thresholded out of gallery AND queries
    assert "rare" not in set(preds["true"])
