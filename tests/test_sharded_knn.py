"""Gallery-sharded exact kNN (parallel/knn.py) vs the single-device kernel,
on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.ops.knn import (
    ANNClassifier, _topk_euclidean,
)
from multimodal_plankton_recognition_tpu.parallel import create_mesh
from multimodal_plankton_recognition_tpu.parallel.knn import (
    shard_gallery, sharded_topk_euclidean,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return create_mesh()


def _data(n_gallery=1000, n_query=37, dim=64, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(n_gallery, dim)).astype(np.float32)
    q = rng.normal(size=(n_query, dim)).astype(np.float32)
    return g, q


@pytest.mark.parametrize("k", [1, 9, 200])
def test_matches_single_device(mesh, k):
    # k=9 < shard size (125) exercises the candidate merge; k=200 > shard
    # size exercises the kl-clamped path where every shard contributes all
    # of its rows
    g, q = _data()
    idx_s, d_s = sharded_topk_euclidean(q, g, k=k, mesh=mesh)
    idx_r, d_r = _topk_euclidean(q, g, k=k)
    np.testing.assert_array_equal(idx_s, np.asarray(idx_r))
    np.testing.assert_allclose(d_s, np.asarray(d_r), atol=1e-5)


def test_uneven_gallery_pad(mesh):
    # 1003 rows % 8 != 0: shard_gallery pads with far-away rows which must
    # never be selected
    g, q = _data(n_gallery=1003)
    idx_s, d_s = sharded_topk_euclidean(q, g, k=31, mesh=mesh)
    assert idx_s.max() < 1003
    idx_r, d_r = _topk_euclidean(q, g, k=31)
    np.testing.assert_array_equal(idx_s, np.asarray(idx_r))


def test_gallery_is_row_sharded(mesh):
    g, _ = _data()
    gal = shard_gallery(g, mesh)
    assert gal.n_real == g.shape[0]
    # each device holds 1/8 of the rows, all columns
    shard_shape = gal.rows.sharding.shard_shape(gal.rows.shape)
    assert shard_shape == (gal.rows.shape[0] // 8, g.shape[1])


def test_k_validated_against_real_rows(mesh):
    # 1001 rows pad to 1008; k in (1001, 1008] must raise, not silently
    # return _PAD_VALUE sentinel rows as neighbors
    g, q = _data(n_gallery=1001)
    gal = shard_gallery(g, mesh)
    with pytest.raises(ValueError, match="exceeds gallery size 1001"):
        sharded_topk_euclidean(q, gal, k=1004, mesh=mesh)
    # a bare pre-sharded jax.Array with an explicit n_real gets the same check
    with pytest.raises(ValueError, match="exceeds gallery size 1001"):
        sharded_topk_euclidean(q, gal.rows, k=1004, mesh=mesh, n_real=1001)
    # k == n_real is legal and must exclude the pad rows
    idx, _ = sharded_topk_euclidean(q[:3], gal, k=1001, mesh=mesh)
    assert idx.max() < 1001


def test_batch_sharded_queries_gspmd(mesh):
    # the inverse decomposition (huge query sets, gallery replicated):
    # the single-chip kernel already handles data-sharded query batches
    # under GSPMD — no collectives needed, each chip scores its query rows
    from jax.sharding import NamedSharding, PartitionSpec as P
    g, q = _data(n_query=64)
    qs = jax.device_put(q, NamedSharding(mesh, P("data")))
    idx_s, d_s = _topk_euclidean(qs, g, k=9)
    idx_r, d_r = _topk_euclidean(q, g, k=9)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), atol=1e-5)


def test_run_suite_sharded_matches_default(mesh):
    # the benchmark CLIs' --sharded flag: identical result pickles
    from multimodal_plankton_recognition_tpu.retrieval.benchmark import (
        run_suite, set_sharded_retrieval,
    )
    rng = np.random.default_rng(3)
    n = 60
    labels = np.array([f"c{i % 3}" for i in range(n)])
    entry = {
        "image": rng.normal(size=(n, 16)).astype(np.float32),
        "profile": rng.normal(size=(n, 16)).astype(np.float32),
        "label": labels, "classes": np.unique(labels),
    }
    emb = {"tiny": {1: entry}}
    kwargs = dict(mode="cross", N=(2,), K=(1, 3), repeats=2, th=4, seed=0)
    try:
        ref = run_suite(emb, **kwargs)
        sh = run_suite(emb, sharded=True, **kwargs)
    finally:
        set_sharded_retrieval(False)
    for run in (0, 1):
        r, s = ref["tiny"][1][2][run], sh["tiny"][1][2][run]
        np.testing.assert_array_equal(r["true"], s["true"])
        for k in (1, 3):
            for setup, pred in r["pred"][k].items():
                np.testing.assert_array_equal(pred, s["pred"][k][setup])


def test_ann_classifier_sharded_predictions(mesh):
    g, q = _data(n_gallery=400, n_query=50)
    y = np.arange(400) % 7
    ref = ANNClassifier(g, y)
    sh = ANNClassifier(g, y, sharded=True, mesh=mesh)
    for k in (1, 3, 9):
        np.testing.assert_array_equal(sh.predict(q, k=k), ref.predict(q, k=k))
    # the multimodal h-stack fusion path (reference: src/ann.py:15-21)
    q2 = _data(n_query=50, seed=1)[1]
    np.testing.assert_array_equal(
        sh.predict(q, q2, k=3), ref.predict(q, q2, k=3))
