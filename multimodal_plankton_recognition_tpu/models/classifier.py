"""Supervised unimodal classifiers.

Flax redesign of the reference's ``ImageModel`` / ``ProfileModel``
LightningModules (reference: src/model.py:151-295, 298-451): encoder +
linear softmax head. Train/eval logic (CE loss, accuracy, confusion matrix)
lives in train/loop.py and train/metrics.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from .image.encoder import ImageEncoder
from .profile.factory import create_profile_encoder


class ImageClassifier(nn.Module):
    n_classes: int = 2
    image_encoder_args: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.image_encoder = ImageEncoder(
            dtype=self.dtype, **(self.image_encoder_args or {}))
        self.fc = nn.Dense(self.n_classes, dtype=self.dtype)

    def __call__(self, image: jnp.ndarray,
                 image_shape: Optional[jnp.ndarray] = None,
                 train: bool = False, **kwargs) -> jnp.ndarray:
        x = self.image_encoder(image, image_shape=image_shape, train=train)
        return self.fc(x)


class ProfileClassifier(nn.Module):
    n_classes: int = 2
    profile_encoder_args: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.profile_encoder = create_profile_encoder(
            self.profile_encoder_args or {}, dtype=self.dtype)
        self.fc = nn.Dense(self.n_classes, dtype=self.dtype)

    def __call__(self, profile: jnp.ndarray,
                 profile_len: Optional[jnp.ndarray] = None,
                 train: bool = False, **tokens) -> jnp.ndarray:
        x = self.profile_encoder(profile, profile_len=profile_len,
                                 train=train, **tokens)
        return self.fc(x)
