"""Serving-export tests: jax.export artifact == direct model.apply.

The artifact contract (retrieval/export.py): same batch dict as the
training collates, L2-normalized embeddings (multi) or logits
(classifiers), symbolic batch dimension by default.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_plankton_recognition_tpu.config import ModelCard
from multimodal_plankton_recognition_tpu.models import build
from multimodal_plankton_recognition_tpu.ops.losses import l2_normalize
from multimodal_plankton_recognition_tpu.retrieval import export as ex


def _multi_card(profile_kind="cnn"):
    pe = {"kind": profile_kind, "dim_in": 6}
    if profile_kind == "cnn":
        pe.update(blocks=[1, 1, 1, 1], base_channels=8)
    elif profile_kind == "transformer":
        pe.update(dim_hidden=16, num_head=2, num_layers=1, target_size=32)
    else:
        pe.update(dim_hidden=16, num_layers=1)
    return ModelCard.from_dict({
        "bs": 4, "dim_embedding": 16, "target_size": 32,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "profile_encoder_args": pe,
        "coordination_args": {"method": "clip"},
        "trainer_args": {"precision": "32"},
    })


def _batch(card, kind, b, seed=0):
    rng = np.random.default_rng(seed)
    spec = ex.batch_spec(card, kind)
    batch = {}
    for key, (shape, dtype) in spec.items():
        shape = tuple(b if d is None else d for d in shape)
        if dtype == "float32":
            batch[key] = rng.normal(size=shape).astype(np.float32)
        elif dtype == "bool":
            batch[key] = np.zeros(shape, dtype=bool)
        elif key == "last_idx":
            batch[key] = np.full(shape, shape and 5, dtype=np.int32)
        elif key == "time":
            batch[key] = np.tile(np.arange(shape[1], dtype=np.int32),
                                 (b, 1))
        else:
            batch[key] = rng.integers(1, 30, size=shape).astype(np.int32)
    return batch


def _init_vars(model, card, kind):
    batch = _batch(card, kind, 2)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    if kind == "multi":
        return model.init(jax.random.PRNGKey(0), method="encode",
                          train=False, **arrays)
    return model.init(jax.random.PRNGKey(0), train=False, **arrays)


@pytest.mark.parametrize("profile_kind", ["cnn", "transformer", "lstm"])
def test_multi_export_matches_apply_any_batch(profile_kind, tmp_path):
    card = _multi_card(profile_kind)
    model = build.build_multi_model(card)
    variables = _init_vars(model, card, "multi")

    exported = ex.export_inference(model, variables, card, "multi",
                                   platforms=("cpu",))
    art = ex.save_artifact(exported, {
        "kind": "multi", "input_spec": {
            k: {"shape": list(s), "dtype": d}
            for k, (s, d) in ex.batch_spec(card, "multi").items()},
    }, tmp_path / "artifact")
    serving = ex.load_artifact(art)

    for b in (2, 5):  # symbolic batch: one artifact, several batch sizes
        batch = _batch(card, "multi", b, seed=b)
        got = serving.call(batch)
        arrays = {k: jnp.asarray(v) for k, v in batch.items()}
        want = model.apply(variables, method="encode", train=False, **arrays)
        np.testing.assert_allclose(
            got["image_emb"], np.asarray(l2_normalize(want["image_emb"])),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            got["profile_emb"], np.asarray(l2_normalize(want["profile_emb"])),
            rtol=1e-5, atol=1e-5)
        assert got["image_emb"].shape == (b, card.dim_embedding)
        norms = np.linalg.norm(got["image_emb"], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_serving_model_rejects_wrong_keys(tmp_path):
    card = _multi_card()
    model = build.build_multi_model(card)
    variables = _init_vars(model, card, "multi")
    exported = ex.export_inference(model, variables, card, "multi",
                                   platforms=("cpu",))
    art = ex.save_artifact(exported, {
        "kind": "multi", "input_spec": {
            k: {} for k in ex.batch_spec(card, "multi")}},
        tmp_path / "a")
    serving = ex.load_artifact(art)
    batch = _batch(card, "multi", 2)
    batch.pop("image")
    with pytest.raises(ValueError, match="Batch keys"):
        serving.call(batch)


def test_classifier_export_logits(tmp_path):
    card = ModelCard.from_dict({
        "bs": 4, "target_size": 32,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "trainer_args": {"precision": "32"},
    })
    model = build.build_image_classifier(card, ["a", "b", "c"])
    variables = _init_vars(model, card, "image")
    exported = ex.export_inference(model, variables, card, "image",
                                   platforms=("cpu",))
    art = ex.save_artifact(exported, {
        "kind": "image", "classes": ["a", "b", "c"], "input_spec": {
            k: {} for k in ex.batch_spec(card, "image")}},
        tmp_path / "clf")
    serving = ex.load_artifact(art)
    assert list(serving.classes) == ["a", "b", "c"]
    batch = _batch(card, "image", 3)
    got = serving.call(batch)["logits"]
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    want = model.apply(variables, train=False, **arrays)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)
    assert got.shape == (3, 3)


def test_weighted_mode_device_matches_numpy():
    from multimodal_plankton_recognition_tpu.ops.knn import (
        weighted_mode, weighted_mode_device, inverse_distance_weights,
        ANNClassifier,
    )
    rng = np.random.default_rng(0)
    classes = rng.integers(0, 5, size=(7, 6))
    weights = rng.uniform(0.1, 2.0, size=(7, 6))
    want = weighted_mode(classes, weights, n_classes=5)
    got, votes = weighted_mode_device(jnp.asarray(classes, dtype=jnp.int32),
                                      jnp.asarray(weights), 5)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert votes.shape == (7, 5)
    # inverse-distance weights: exact-hit rows give all mass to the hits
    dist = np.array([[0.0, 1.0, 2.0], [1.0, 2.0, 4.0]], np.float32)
    w_dev = np.asarray(inverse_distance_weights(jnp.asarray(dist)))
    w_ref = ANNClassifier._get_weights(dist.copy())
    np.testing.assert_allclose(w_dev, w_ref.astype(np.float32), rtol=1e-6)


def test_inverse_distance_weights_exact_eps():
    """The serving artifact's tolerant exact-hit rule (VERDICT r3 #6): a
    self-hit at the ~1e-6 cross-lowering delta must still take all the
    mass, while the default eps=0 keeps the reference's ==0 semantics."""
    from multimodal_plankton_recognition_tpu.ops.knn import (
        inverse_distance_weights,
    )
    dist = jnp.asarray([[1e-6, 0.8, 1.1],    # near-self hit
                        [0.5, 0.9, 1.3]])    # no self hit
    w = np.asarray(inverse_distance_weights(dist, exact_eps=1e-4))
    np.testing.assert_allclose(w[0], [1.0, 0.0, 0.0])       # hit wins all
    np.testing.assert_allclose(w[1], 1.0 / np.asarray(dist)[1], rtol=1e-6)
    # default: 1e-6 > 0 so the plain inverse weight applies (finite)
    w0 = np.asarray(inverse_distance_weights(dist))
    assert np.isfinite(w0).all() and w0[0, 0] == pytest.approx(1e6, rel=1e-3)


def test_retrieval_classifier_export_matches_ann(tmp_path):
    """The exported pair->class artifact == encode + ANNClassifier.predict
    composed by hand (the reference's fused-gallery deployment recipe)."""
    from multimodal_plankton_recognition_tpu.ops.knn import ANNClassifier
    from multimodal_plankton_recognition_tpu.utils import LabelVocab

    card = _multi_card("cnn")
    model = build.build_multi_model(card)
    variables = _init_vars(model, card, "multi")
    rng = np.random.default_rng(3)
    n_gallery, dim = 30, card.dim_embedding
    g_img = rng.normal(size=(n_gallery, dim)).astype(np.float32)
    g_img /= np.linalg.norm(g_img, axis=1, keepdims=True)
    g_prof = rng.normal(size=(n_gallery, dim)).astype(np.float32)
    g_prof /= np.linalg.norm(g_prof, axis=1, keepdims=True)
    labels = rng.choice(["a", "b", "c"], size=n_gallery)
    vocab = LabelVocab(labels)
    ids = vocab.transform(list(labels))

    k = 3
    exported = ex.export_retrieval_inference(
        model, variables, card, g_img, g_prof, ids, n_classes=len(vocab),
        k=k, platforms=("cpu",))
    art = ex.save_artifact(exported, ex._artifact_meta(
        "retrieval", card, ("cpu",), None, classes=vocab.classes_.tolist(),
        outputs=["class_id", "votes", "image_emb", "profile_emb"], k=k),
        tmp_path / "rart")
    serving = ex.load_artifact(art)

    batch = _batch(card, "multi", 5, seed=7)
    out = serving.call(batch)
    assert out["class_id"].shape == (5,)
    assert out["votes"].shape == (5, 3)

    # hand-composed reference path: encode -> fused gallery ANNClassifier
    arrays = {k2: jnp.asarray(v) for k2, v in batch.items()}
    emb = model.apply(variables, method="encode", train=False, **arrays)
    ie = np.asarray(l2_normalize(emb["image_emb"]))
    pe = np.asarray(l2_normalize(emb["profile_emb"]))
    ann = ANNClassifier(np.concatenate([g_img, g_prof]), np.tile(ids, 2))
    want = ann.predict(ie, pe, k=k)
    np.testing.assert_array_equal(out["class_id"], want)
    # and the predicted names resolve through the artifact's classes
    names = serving.classes[out["class_id"]]
    assert set(names) <= {"a", "b", "c"}


def test_export_strips_fused_flags_tree_compatibly(tmp_path):
    """A checkpoint whose card enables the Pallas kernels exports on the
    stripped card with the SAME variables (fused modules are
    param-tree-compatible with their flax counterparts), and the artifact
    matches the original model's encode output."""
    from multimodal_plankton_recognition_tpu.train import make_optimizer
    from multimodal_plankton_recognition_tpu.train.state import TrainState
    from multimodal_plankton_recognition_tpu.train.checkpoint import (
        CheckpointManager,
    )

    card_dict = {
        "bs": 4, "dim_embedding": 16, "target_size": 32,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "profile_encoder_args": {
            "kind": "transformer", "dim_in": 6, "dim_hidden": 16,
            "num_head": 2, "num_layers": 1, "target_size": 32,
            "fused_attention": True},
        "coordination_args": {"method": "clip"},
        "trainer_args": {"precision": "32"},
    }
    card = ModelCard.from_dict(card_dict)
    model = build.build_multi_model(card)
    variables = _init_vars(model, card, "multi")
    tx = make_optimizer(card.optim_args)
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    ckpt_dir = tmp_path / "ckpt"
    mngr = CheckpointManager(ckpt_dir, monitor="valid_loss", save_top_k=1,
                             metadata={"card": card.to_dict(),
                                       "kind": "multi",
                                       "class_names": ["x"]})
    assert mngr.save(0, state, {"valid_loss": 1.0})
    mngr.wait()
    mngr.close()

    art = ex.export_checkpoint(ckpt_dir, tmp_path / "art", platforms=("cpu",))
    serving = ex.load_artifact(art)
    assert "fused_attention" not in (serving.meta["card"]
                                     .get("profile_encoder_args") or {})
    # the caller's card dict must not have been mutated by the strip
    assert card.to_dict()["profile_encoder_args"]["fused_attention"] is True

    batch = _batch(card, "multi", 3, seed=11)
    got = serving.call(batch)
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    want = model.apply(variables, method="encode", train=False, **arrays)
    np.testing.assert_allclose(
        got["profile_emb"], np.asarray(l2_normalize(want["profile_emb"])),
        rtol=1e-5, atol=1e-5)


def test_export_checkpoint_end_to_end(synthetic_dataset, tmp_path):
    """Full path: train a step, save a checkpoint, export, serve."""
    from multimodal_plankton_recognition_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from multimodal_plankton_recognition_tpu.train import make_optimizer
    from multimodal_plankton_recognition_tpu.train.state import TrainState

    card = _multi_card("cnn")
    model = build.build_multi_model(card)
    variables = _init_vars(model, card, "multi")
    tx = make_optimizer(card.optim_args)
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    ckpt_dir = tmp_path / "checkpoints"
    mngr = CheckpointManager(ckpt_dir, monitor="valid_loss", save_top_k=1,
                             metadata={"card": card.to_dict(),
                                       "kind": "multi",
                                       "class_names": ["x", "y"]})
    assert mngr.save(0, state, {"valid_loss": 1.0})
    mngr.wait()
    mngr.close()

    art = ex.export_checkpoint(ckpt_dir, tmp_path / "artifact",
                               platforms=("cpu",))
    serving = ex.load_artifact(art)
    assert serving.meta["kind"] == "multi"
    assert serving.meta["outputs"] == ["image_emb", "profile_emb"]
    batch = _batch(card, "multi", 4)
    out = serving.call(batch)
    assert out["image_emb"].shape == (4, card.dim_embedding)
    # the artifact reproduces the checkpointed weights' embeddings
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    want = model.apply(variables, method="encode", train=False, **arrays)
    np.testing.assert_allclose(
        out["image_emb"], np.asarray(l2_normalize(want["image_emb"])),
        rtol=1e-5, atol=1e-5)

    # serve CLI over the artifact: embeddings pickle in the encode layout
    import runpy
    import pickle
    import sys
    from pathlib import Path

    serve_py = str(Path(__file__).resolve().parents[1] / "scripts"
                   / "serve.py")
    out_pkl = tmp_path / "served.pkl"
    argv, sys.argv = sys.argv, [
        serve_py, "-a", str(tmp_path / "artifact"),
        "-d", str(synthetic_dataset / "test.csv"), "-o", str(out_pkl),
        "--name", "tiny", "--fold", "1", "--batch-size", "5"]
    try:
        runpy.run_path(serve_py, run_name="__main__")
    finally:
        sys.argv = argv
    with open(out_pkl, "rb") as f:
        served = pickle.load(f)["tiny"][1]
    n = served["image"].shape[0]
    assert n == len(served["label"]) and n > 0
    np.testing.assert_allclose(np.linalg.norm(served["image"], axis=1),
                               1.0, atol=1e-5)

    # label-less deployment CSV (no `class` column) serves fine
    import pandas as pd

    src = pd.read_csv(synthetic_dataset / "test.csv")
    labeless = tmp_path / "labeless.csv"
    # paths in the csv resolve relative to its directory: absolutize them
    for col in ("image", "profile"):
        src[col] = [str((synthetic_dataset / p).resolve())
                    for p in src[col]]
    src.drop(columns=["class"]).to_csv(labeless, index=False)
    out2 = tmp_path / "labeless.pkl"
    argv, sys.argv = sys.argv, [
        serve_py, "-a", str(tmp_path / "artifact"), "-d", str(labeless),
        "-o", str(out2), "--batch-size", "5"]
    try:
        runpy.run_path(serve_py, run_name="__main__")
    finally:
        sys.argv = argv
    with open(out2, "rb") as f:
        served2 = pickle.load(f)["serve"][1]
    assert list(np.unique(served2["label"])) == ["unknown"]
    np.testing.assert_allclose(served2["image"], served["image"],
                               atol=1e-5)

    # pinned-batch artifact: trailing partial batch is padded + trimmed
    art4 = ex.export_checkpoint(ckpt_dir, tmp_path / "artifact4",
                                platforms=("cpu",), batch_size=4)
    out3 = tmp_path / "pinned.pkl"
    argv, sys.argv = sys.argv, [
        serve_py, "-a", str(art4), "-d",
        str(synthetic_dataset / "test.csv"), "-o", str(out3),
        "--batch-size", "6"]  # mismatched: must be overridden to 4
    try:
        runpy.run_path(serve_py, run_name="__main__")
    finally:
        sys.argv = argv
    with open(out3, "rb") as f:
        served3 = pickle.load(f)["serve"][1]
    assert served3["image"].shape == served["image"].shape
    np.testing.assert_allclose(served3["image"], served["image"],
                               atol=1e-5)
