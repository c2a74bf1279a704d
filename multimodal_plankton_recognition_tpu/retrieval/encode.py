"""Embedding export: checkpoint -> L2-normalized embeddings pickle.

Replaces the reference's notebook export pipeline
(reference: experiments.ipynb cells 4-8: ``MultiModel.load_from_checkpoint``
-> ``Trainer(barebones=True).predict`` -> ``F.normalize`` -> pickle) with a
jitted batch-encode CLI. The pickle layouts are identical:

  flat:   embeddings[model][fold] = {image, profile, label, classes}
  nested: embeddings[model][fold] = {train: {...}, test: {...}, classes}

so the benchmark scripts consume either product unchanged
(reference: scripts/benchmark_raw.py:74, benchmark_folds.py:83-93).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from .. import enable_compilation_cache
from ..config import ModelCard
from ..data import (
    MultiSet, ImageTransformTest, ProfileTransformTest, Loader, tokenize,
)
from ..data.pipeline import multi_collate_fn
from ..train.checkpoint import load_from_checkpoint
from ..ops.losses import l2_normalize


def eval_pipeline(card: ModelCard, kind: str):
    """``(image_tf, profile_tf, tokenizer)`` for the deterministic eval
    pipeline of a model/artifact ``kind`` — the ONE place the eval-side
    transform + pad rules live, shared by the encode CLI, the classifier
    predict path, and the serving CLI (scripts/serve.py) so exported
    artifacts and their consumers cannot drift apart.

    ``multi``/``retrieval`` use the test-time transforms at the card's
    ``target_size`` (reference: experiments.ipynb cell 4); the supervised
    ``image``/``profile`` kinds use the raw canonicalizing transforms their
    training drivers use (reference: scripts/train_image.py:37-38,
    train_profile.py:31,38).
    """
    from ..data.transforms import ImageTransforms, ProfileTransform

    enc_kind = (card.profile_encoder_args or {}).get("kind", "cnn")
    ts = card.target_size
    if kind in ("multi", "retrieval"):
        pad_to = ts + 1 if enc_kind == "transformer" else ts
        return (ImageTransformTest(ts), ProfileTransformTest(ts),
                tokenize.get_tokenizer(enc_kind, ts, pad_to=pad_to))
    if kind == "profile":
        max_len = card.max_len or 256
        pad_to = max_len + 1 if enc_kind == "transformer" else max_len
        return (ImageTransforms(target_size=ts),
                ProfileTransform(max_len=card.max_len),
                tokenize.get_tokenizer(enc_kind, max_len, pad_to=pad_to))
    if kind == "image":  # profiles unused downstream: auto-pad, no cap
        return (ImageTransforms(target_size=ts), ProfileTransform(max_len=0),
                tokenize.get_tokenizer(enc_kind, card.max_len or 256))
    raise ValueError(f"Unknown model kind {kind!r}")


def _encode_csv(model, variables, card: ModelCard, csv_path: Path,
                batch_size: int = 64, num_workers: int = 4) -> Dict:
    image_tf, profile_tf, tok = eval_pipeline(card, "multi")
    dataset = MultiSet(csv_path, image_tf, profile_tf)
    loader = Loader(dataset, batch_size, multi_collate_fn(tok),
                    shuffle=False, drop_last=False, num_workers=num_workers)

    @jax.jit
    def encode_step(batch):
        emb = model.apply(variables, method="encode", train=False, **batch)
        return (l2_normalize(emb["image_emb"]),
                l2_normalize(emb["profile_emb"]))

    images, profiles = [], []
    for batch in loader:
        arrays = {k: jnp.asarray(v) for k, v in batch.items()}
        ie, pe = encode_step(arrays)
        images.append(np.asarray(ie))
        profiles.append(np.asarray(pe))
    labels = dataset.table["class"].to_numpy()
    return {
        "image": np.concatenate(images).astype(np.float32),
        "profile": np.concatenate(profiles).astype(np.float32),
        "label": labels,
    }


def encode_dataset(checkpoint_dir: Path | str, csv_path: Path | str,
                   batch_size: int = 64, num_workers: int = 4) -> Dict:
    """Flat layout: one csv -> {image, profile, label, classes}."""
    enable_compilation_cache()
    model, variables, meta = load_from_checkpoint(checkpoint_dir)
    card = ModelCard.from_dict(meta["card"])
    out = _encode_csv(model, variables, card, Path(csv_path),
                      batch_size, num_workers)
    out["classes"] = np.asarray(meta.get("class_names", []))
    return out


def predict_classifier(checkpoint_dir: Path | str, csv_path: Path | str,
                       batch_size: int = 64, num_workers: int = 4) -> Dict:
    """Export a supervised classifier's logits + labels for a csv
    (reference ``ImageModel/ProfileModel.predict_step`` semantics,
    src/model.py:289-291, 445-447)."""
    from ..data.pipeline import image_collate_fn, profile_collate_fn
    from ..utils import LabelVocab

    enable_compilation_cache()
    model, variables, meta = load_from_checkpoint(checkpoint_dir)
    card = ModelCard.from_dict(meta["card"])
    kind = meta.get("kind")
    if kind not in ("image", "profile"):
        raise ValueError(f"predict_classifier needs an image/profile "
                         f"checkpoint, got kind={kind!r}")
    vocab = LabelVocab(meta["class_names"])
    image_tf, profile_tf, tok = eval_pipeline(card, kind)
    dataset = MultiSet(csv_path, image_tf, profile_tf)
    if kind == "image":
        collate = image_collate_fn(vocab)
    else:
        collate = profile_collate_fn(tok, vocab)
    loader = Loader(dataset, batch_size, collate, shuffle=False,
                    drop_last=False, num_workers=num_workers)

    @jax.jit
    def step(batch):
        inputs = {k: v for k, v in batch.items() if k != "label"}
        return model.apply(variables, train=False, **inputs)

    logits, labels = [], []
    for batch in loader:
        arrays = {k: jnp.asarray(v) for k, v in batch.items()}
        logits.append(np.asarray(step(arrays)))
        labels.append(np.asarray(batch["label"]))
    return {
        "logits": np.concatenate(logits),
        "label": vocab.inverse_transform(np.concatenate(labels)),
        "classes": np.asarray(vocab.to_list()),
    }


def encode_split(checkpoint_dir: Path | str, dataset_dir: Path | str,
                 batch_size: int = 64, num_workers: int = 4) -> Dict:
    """Nested layout: dataset_dir/{train,test}.csv ->
    {train: {...}, test: {...}, classes}."""
    enable_compilation_cache()
    model, variables, meta = load_from_checkpoint(checkpoint_dir)
    card = ModelCard.from_dict(meta["card"])
    dataset_dir = Path(dataset_dir)
    out = {
        split: _encode_csv(model, variables, card,
                           dataset_dir / f"{split}.csv",
                           batch_size, num_workers)
        for split in ("train", "test")
    }
    out["classes"] = np.asarray(meta.get("class_names", []))
    return out
