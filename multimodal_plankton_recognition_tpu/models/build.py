"""Model builders from validated model cards.

One place that maps a ``ModelCard`` to task models, used by the train
scripts and by checkpoint restore (the reference embeds hyperparameters in
Lightning checkpoints via ``save_hyperparameters()`` so
``load_from_checkpoint(path)`` reconstructs the model, reference:
src/model.py:27, experiments.ipynb cell 4 — we store the card in checkpoint
metadata to preserve that one-call UX).
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax.numpy as jnp

from ..config import ModelCard
from .multi import MultiModel
from .classifier import ImageClassifier, ProfileClassifier

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def compute_dtype(card: ModelCard) -> jnp.dtype:
    return _DTYPES[card.trainer_args.compute_dtype]


def build_multi_model(card: ModelCard,
                      dtype: Optional[jnp.dtype] = None) -> MultiModel:
    return MultiModel(
        dim_embed=card.dim_embedding or 512,
        image_encoder_args=_strip(card.image_encoder_args),
        profile_encoder_args=card.profile_encoder_args,
        coordination_args=card.coordination_args,
        dtype=dtype or compute_dtype(card),
    )


def build_image_classifier(card: ModelCard, class_names: Iterable[str],
                           dtype: Optional[jnp.dtype] = None
                           ) -> ImageClassifier:
    return ImageClassifier(
        n_classes=len(list(class_names)),
        image_encoder_args=_strip(card.image_encoder_args),
        dtype=dtype or compute_dtype(card),
    )


def build_profile_classifier(card: ModelCard, class_names: Iterable[str],
                             dtype: Optional[jnp.dtype] = None
                             ) -> ProfileClassifier:
    return ProfileClassifier(
        n_classes=len(list(class_names)),
        profile_encoder_args=card.profile_encoder_args,
        dtype=dtype or compute_dtype(card),
    )


def _strip(args):
    """Drop driver-level keys the nn.Module doesn't take."""
    if args is None:
        return None
    return {k: v for k, v in args.items() if k not in ()}
