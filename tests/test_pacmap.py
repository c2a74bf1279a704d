"""PaCMAP projection tests (reference: experiments.ipynb cells 26-30)."""

import numpy as np

from multimodal_plankton_recognition_tpu.ops.pacmap import (
    pacmap, _phase_weights, _select_pairs,
)


def _blobs(n_per=60, d=32, k=3, sep=8.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * sep
    X = np.concatenate([centers[i] + rng.standard_normal((n_per, d))
                        for i in range(k)])
    y = np.repeat(np.arange(k), n_per)
    return X.astype(np.float32), y


def test_phase_weights_schedule():
    w = _phase_weights(450)
    assert w.shape == (450, 3)
    np.testing.assert_allclose(w[0], (2.0, 1000.0, 1.0))
    np.testing.assert_allclose(w[150], (3.0, 3.0, 1.0))
    np.testing.assert_allclose(w[400], (1.0, 0.0, 1.0))


def test_pair_selection_shapes():
    X, _ = _blobs(n_per=30)
    near, mid, far = _select_pairs(X, 10, 0.5, 2.0, seed=0)
    n = len(X)
    assert near.shape == (n * 10, 2)
    assert mid.shape == (n * 5, 2)
    assert far.shape == (n * 20, 2)
    assert np.all(near[:, 0] != near[:, 1])
    assert np.all(far[:, 0] != far[:, 1])


def test_pacmap_separates_clusters():
    """Well-separated high-dim blobs must stay separated in 2-D: mean
    intra-cluster distance well below mean inter-cluster distance."""
    X, y = _blobs()
    proj = pacmap(X, n_components=2, n_iters=250, seed=0)
    assert proj.shape == (len(X), 2)
    assert np.all(np.isfinite(proj))
    intra, inter = [], []
    for i in range(3):
        pi = proj[y == i]
        intra.append(np.linalg.norm(pi - pi.mean(0), axis=1).mean())
        for j in range(i + 1, 3):
            inter.append(np.linalg.norm(pi.mean(0) - proj[y == j].mean(0)))
    assert np.mean(inter) > 3.0 * np.mean(intra), (np.mean(inter),
                                                   np.mean(intra))


def test_pacmap_deterministic():
    X, _ = _blobs(n_per=20)
    p1 = pacmap(X, n_iters=50, seed=3)
    p2 = pacmap(X, n_iters=50, seed=3)
    np.testing.assert_array_equal(p1, p2)
