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


def _encode_csv(model, variables, card: ModelCard, csv_path: Path,
                batch_size: int = 64, num_workers: int = 4) -> Dict:
    ts = card.target_size
    dataset = MultiSet(csv_path, ImageTransformTest(ts),
                       ProfileTransformTest(ts))
    kind = (card.profile_encoder_args or {}).get("kind", "cnn")
    pad_to = ts + 1 if kind == "transformer" else ts
    tok = tokenize.get_tokenizer(kind, ts, pad_to=pad_to)
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
    from ..data.transforms import ImageTransforms, ProfileTransform
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
    image_tf = ImageTransforms(target_size=card.target_size)
    profile_tf = ProfileTransform(max_len=card.max_len if kind == "profile"
                                  else 0)
    dataset = MultiSet(csv_path, image_tf, profile_tf)
    if kind == "image":
        collate = image_collate_fn(vocab)
    else:
        enc_kind = (card.profile_encoder_args or {}).get("kind", "cnn")
        max_len = card.max_len or 256
        pad_to = max_len + 1 if enc_kind == "transformer" else max_len
        collate = profile_collate_fn(
            tokenize.get_tokenizer(enc_kind, max_len, pad_to=pad_to), vocab)
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
