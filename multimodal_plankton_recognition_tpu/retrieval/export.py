"""Serving export: checkpoint -> portable serialized StableHLO artifact.

The reference deploys by re-loading the Lightning checkpoint into Python
and running ``Trainer(barebones=True).predict`` (reference:
experiments.ipynb cell 4) — serving requires the full training stack. The
TPU-native answer is ahead-of-time export: ``jax.export`` lowers the jitted
inference function (weights baked in as constants) to a serialized
StableHLO module that any same-or-newer JAX runtime can execute on the
platforms it was lowered for, with no model code, card, or checkpoint
machinery at serving time.

Artifact layout (a directory):

  model.stablehlo   serialized ``jax.export.Exported`` bytes
  metadata.json     {kind, classes, input_spec, outputs, platforms, ...}

The exported function takes the SAME batch dict the training collates
produce (data/pipeline.py): ``{image, image_shape, profile, ...tokens}``
for ``kind="multi"`` (returns L2-normalized ``{image_emb, profile_emb}``,
matching retrieval/encode.py), or the classifier batch for
``kind="image"|"profile"`` (returns logits). The batch dimension is
exported symbolically by default, so one artifact serves any batch size.

Pallas kernels are stripped before export: a serialized TPU custom-call is
tied to the exact Mosaic version that built it, while the XLA lowering is
portable across runtimes — and the kernels' wins are in the *training*
step (docs/PERF.md), not the serving path.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..config import ModelCard
from ..ops.losses import l2_normalize

ARTIFACT_FILE = "model.stablehlo"
METADATA_FILE = "metadata.json"

_FUSED_KEYS = ("fused_attention", "fused_mbconv", "fused_ffn")


def _strip_fused(card: ModelCard) -> ModelCard:
    """Return a card with Pallas-kernel flags off (see module docstring)."""
    import copy

    d = copy.deepcopy(card.to_dict())
    for block in ("image_encoder_args", "profile_encoder_args"):
        args = d.get(block)
        if args:
            for k in _FUSED_KEYS:
                args.pop(k, None)
    return ModelCard.from_dict(d)


def batch_spec(card: ModelCard, kind: str) -> Dict[str, Tuple[Tuple, str]]:
    """Input spec {key: (shape-with-None-batch, dtype)} mirroring the
    training collates (data/pipeline.py MultiCollate/ImageCollate/
    ProfileCollate, minus labels)."""
    ts = card.target_size
    enc_kind = (card.profile_encoder_args or {}).get("kind", "cnn")
    if kind == "multi":
        pad_to = ts + 1 if enc_kind == "transformer" else ts
        spec = {
            "image": ((None, ts, ts, 1), "float32"),
            "image_shape": ((None, 2), "int32"),
            "profile_len": ((None, 1), "int32"),
        }
        spec.update(_profile_token_spec(enc_kind, pad_to))
        return spec
    if kind == "image":
        return {
            "image": ((None, ts, ts, 1), "float32"),
            "image_shape": ((None, 2), "int32"),
        }
    if kind == "profile":
        max_len = card.max_len or 256
        pad_to = max_len + 1 if enc_kind == "transformer" else max_len
        spec = {"profile_len": ((None, 1), "int32")}
        spec.update(_profile_token_spec(enc_kind, pad_to))
        return spec
    raise ValueError(f"Unknown checkpoint kind {kind!r}")


def _profile_token_spec(enc_kind: str, pad_to: int) -> Dict:
    spec = {"profile": ((None, pad_to, 6), "float32")}
    if enc_kind == "transformer":
        spec["time"] = ((None, pad_to), "int32")
        spec["padding_mask"] = ((None, pad_to), "bool")
    elif enc_kind == "lstm":
        spec["last_idx"] = ((None,), "int32")
    return spec


def _inference_fn(model, variables, kind: str):
    if kind == "multi":
        def fn(batch):
            emb = model.apply(variables, method="encode", train=False,
                              **batch)
            return {"image_emb": l2_normalize(emb["image_emb"]),
                    "profile_emb": l2_normalize(emb["profile_emb"])}
    else:
        def fn(batch):
            return {"logits": model.apply(variables, train=False, **batch)}
    return fn


def export_inference(model, variables, card: ModelCard, kind: str,
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     batch_size: Optional[int] = None) -> jax_export.Exported:
    """Lower the inference function for ``platforms`` with weights baked in.

    ``batch_size=None`` exports a symbolic batch dimension (one artifact,
    any batch size); an int pins it.
    """
    spec = batch_spec(card, kind)
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    args = {
        key: jax.ShapeDtypeStruct(tuple(b if d is None else d for d in shape),
                                  np.dtype(dtype))
        for key, (shape, dtype) in spec.items()
    }
    fn = _inference_fn(model, variables, kind)
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(args)


#: exact-hit tolerance for the serving artifact: far above the ~1e-6
#: cross-lowering embedding delta (jit-that-built-the-gallery vs the
#: exported StableHLO) and the direct-form distance noise, far below
#: genuine inter-sample distances on L2-normalized embeddings (>= ~2e-3
#: even on a 4-epoch tiny model) — so a gallery member queried through
#: the artifact still fires the reference's exact-hit rule, and ONLY it
#: (VERDICT r3 #6; the 11/15-on-TPU self-gallery misvotes in
#: VALIDATION.md r3). Paired with the direct-form top-k distance
#: refinement in _retrieval_classify_fn, without which f32 cancellation
#: noise in the ranking form would swamp any eps.
SERVING_EXACT_EPS = 1e-4


def _retrieval_classify_fn(model, variables, gallery: jnp.ndarray,
                           gallery_ids: jnp.ndarray, n_classes: int, k: int):
    """One lowered function: embed a (image, profile) pair batch, query the
    baked-in fused gallery with BOTH modalities (the reference's multimodal
    fusion mechanism: one kNN query per modality, neighbors h-stacked,
    reference: src/ann.py:15-21), and return the inverse-distance
    weighted-mode class. Semantics identical to
    ``ANNClassifier(gallery, y).predict(img_emb, prof_emb, k=k)`` up to
    the ``SERVING_EXACT_EPS`` exact-hit tolerance (see its note)."""
    from ..ops.knn import (
        _topk_euclidean, inverse_distance_weights, weighted_mode_device,
    )

    def fn(batch):
        emb = model.apply(variables, method="encode", train=False, **batch)
        queries = (l2_normalize(emb["image_emb"]),
                   l2_normalize(emb["profile_emb"]))
        # coarse-rank -> exact re-rank: the matmul form (qn - 2 q.g + gn)
        # the kNN kernel ranks with carries ~3e-4 of f32 cancellation
        # noise in distance units — enough to tie genuinely-distinct
        # neighbors with the exact self-hit and randomly trip (or miss)
        # the exact-hit rule below. So oversample candidates by the fast
        # matmul ranking, recompute their distances with the noise-free
        # direct form ||q - g|| (what the reference's pynndescent
        # computes, src/ann.py), and take the exact top-k under those.
        # Cost: a (B, kc, E) gather + elementwise — kc is tiny.
        kc = min(gallery.shape[0], max(2 * k, k + 16))
        idx_list, dist_list = [], []
        for q in queries:
            cand, _ = _topk_euclidean(q, gallery, k=kc)
            g_sel = gallery[cand]
            diff = q.astype(jnp.float32)[:, None, :] - g_sel
            d2 = jnp.sum(diff * diff, axis=-1)
            best, pos = jax.lax.top_k(-d2, k)
            idx = jnp.take_along_axis(cand, pos, axis=1)
            dist = jnp.sqrt(jnp.maximum(-best, 0.0))
            idx_list.append(idx)
            dist_list.append(dist)
        idx = jnp.concatenate(idx_list, axis=1)
        dist = jnp.concatenate(dist_list, axis=1)
        weights = inverse_distance_weights(dist, exact_eps=SERVING_EXACT_EPS)
        class_id, votes = weighted_mode_device(gallery_ids[idx], weights,
                                               n_classes)
        return {"class_id": class_id, "votes": votes,
                "image_emb": queries[0], "profile_emb": queries[1]}
    return fn


def export_retrieval_inference(model, variables, card: ModelCard,
                               gallery_image: np.ndarray,
                               gallery_profile: np.ndarray,
                               gallery_ids: np.ndarray, n_classes: int,
                               k: int = 9,
                               platforms: Sequence[str] = ("cpu", "tpu"),
                               batch_size: Optional[int] = None
                               ) -> jax_export.Exported:
    """Lower the end-to-end retrieval classifier with the fused gallery
    baked in: gallery = image and profile embeddings stacked along rows
    with tiled labels (the reference's fused-gallery protocol,
    reference: scripts/benchmark_raw.py:33-34)."""
    gallery = jnp.asarray(np.concatenate([gallery_image, gallery_profile])
                          .astype(np.float32))
    ids = jnp.asarray(np.tile(np.asarray(gallery_ids, np.int32), 2))
    spec = batch_spec(card, "multi")
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    args = {
        key: jax.ShapeDtypeStruct(tuple(b if d is None else d for d in shape),
                                  np.dtype(dtype))
        for key, (shape, dtype) in spec.items()
    }
    fn = _retrieval_classify_fn(model, variables, gallery, ids, n_classes, k)
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(args)


def save_artifact(exported: jax_export.Exported, meta: Dict[str, Any],
                  out_dir: Path | str) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / ARTIFACT_FILE).write_bytes(exported.serialize())
    with open(out_dir / METADATA_FILE, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return out_dir


class ServingModel:
    """A deserialized artifact: ``call(batch)`` -> dict of np arrays."""

    def __init__(self, exported: jax_export.Exported,
                 meta: Dict[str, Any]) -> None:
        self.exported = exported
        self.meta = meta

    @property
    def classes(self) -> np.ndarray:
        return np.asarray(self.meta.get("classes", []))

    def call(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        expected = set(self.meta["input_spec"])
        got = set(batch)
        if got != expected:
            raise ValueError(
                f"Batch keys {sorted(got)} != artifact inputs "
                f"{sorted(expected)}")
        out = self.exported.call(
            {k: jnp.asarray(v) for k, v in batch.items()})
        return {k: np.asarray(v) for k, v in out.items()}


def load_artifact(artifact_dir: Path | str) -> ServingModel:
    artifact_dir = Path(artifact_dir)
    data = (artifact_dir / ARTIFACT_FILE).read_bytes()
    with open(artifact_dir / METADATA_FILE) as f:
        meta = json.load(f)
    return ServingModel(jax_export.deserialize(bytearray(data)), meta)


def export_checkpoint(checkpoint_dir: Path | str, out_dir: Path | str,
                      platforms: Sequence[str] = ("cpu", "tpu"),
                      batch_size: Optional[int] = None,
                      keep_fused: bool = False) -> Path:
    """checkpoint directory -> serving artifact directory. The rebuild on
    the stripped card restores the same variables: fused modules are
    param-tree-compatible with their flax counterparts by construction
    (tests/test_attention.py, test_mbconv.py)."""
    model, variables, card, meta = _load_rebuilt(checkpoint_dir, keep_fused)
    kind = meta.get("kind", "multi")
    exported = export_inference(model, variables, card, kind,
                                platforms, batch_size)
    artifact_meta = _artifact_meta(
        kind, card, platforms, batch_size,
        classes=list(meta.get("class_names", [])),
        outputs=(["image_emb", "profile_emb"] if kind == "multi"
                 else ["logits"]))
    return save_artifact(exported, artifact_meta, out_dir)


def _artifact_meta(kind: str, card: ModelCard, platforms, batch_size,
                   classes, outputs, **extra) -> Dict[str, Any]:
    spec = batch_spec(card, "multi" if kind == "retrieval" else kind)
    return {
        "kind": kind,
        "classes": classes,
        "input_spec": {k: {"shape": ["b" if d is None else d for d in shape],
                           "dtype": dtype}
                       for k, (shape, dtype) in spec.items()},
        "outputs": outputs,
        "platforms": list(platforms),
        "batch_size": batch_size or "symbolic",
        "jax_version": jax.__version__,
        "card": card.to_dict(),
        **extra,
    }


def _load_rebuilt(checkpoint_dir, keep_fused: bool):
    """(model, variables, card, meta) with Pallas flags stripped unless
    ``keep_fused`` (shared by both export entry points)."""
    from ..train.checkpoint import load_from_checkpoint
    from ..models import build as build_mod

    model, variables, meta = load_from_checkpoint(checkpoint_dir)
    kind = meta.get("kind", "multi")
    card = ModelCard.from_dict(meta["card"])
    if not keep_fused:
        card = _strip_fused(card)
        if kind == "multi":
            model = build_mod.build_multi_model(card)
        elif kind == "image":
            model = build_mod.build_image_classifier(card,
                                                     meta["class_names"])
        else:
            model = build_mod.build_profile_classifier(card,
                                                       meta["class_names"])
    return model, variables, card, meta


def export_retrieval_checkpoint(checkpoint_dir: Path | str,
                                embeddings_pkl: Path | str,
                                out_dir: Path | str,
                                name: Optional[str] = None,
                                fold=None, k: int = 9,
                                platforms: Sequence[str] = ("cpu", "tpu"),
                                batch_size: Optional[int] = None,
                                keep_fused: bool = False) -> Path:
    """checkpoint + embeddings pickle (the gallery) -> one classifying
    artifact: embed the pair, kNN against the baked fused gallery,
    weighted-mode class (the reference's deployment recipe,
    scripts/benchmark_raw.py + src/ann.py, as a single lowered function).

    ``embeddings_pkl`` is a scripts/encode.py product; ``name``/``fold``
    select the entry (defaulting to the only one). Nested train/test
    entries use the *train* split as the gallery (the folds protocol,
    reference: scripts/benchmark_folds.py:24-50).
    """
    import pickle

    from ..utils import LabelVocab

    with open(embeddings_pkl, "rb") as f:
        emb = pickle.load(f)
    name = name if name is not None else _only_key(emb, "model name")
    folds = emb[name]
    fold = fold if fold is not None else _only_key(folds, "fold")
    entry = folds[fold]
    if "train" in entry:  # nested layout: gallery from the train split
        entry = entry["train"]
    labels = np.asarray(entry["label"])
    vocab = LabelVocab(labels)
    ids = vocab.transform(list(labels))

    model, variables, card, _ = _load_rebuilt(checkpoint_dir, keep_fused)
    exported = export_retrieval_inference(
        model, variables, card, entry["image"], entry["profile"], ids,
        n_classes=len(vocab), k=k, platforms=platforms,
        batch_size=batch_size)
    artifact_meta = _artifact_meta(
        "retrieval", card, platforms, batch_size,
        classes=vocab.classes_.tolist(),
        outputs=["class_id", "votes", "image_emb", "profile_emb"],
        k=k, exact_eps=SERVING_EXACT_EPS,
        gallery_size=int(labels.shape[0]),
        gallery_source=str(embeddings_pkl))
    return save_artifact(exported, artifact_meta, out_dir)


def _only_key(d: Dict, what: str):
    keys = list(d)
    if len(keys) != 1:
        raise ValueError(f"Multiple {what}s in the embeddings pickle "
                         f"({keys}); pass one explicitly")
    return keys[0]
