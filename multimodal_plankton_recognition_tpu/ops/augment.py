"""On-device batched augmentations.

The reference applies every augmentation per-sample on CPU workers
(reference: src/data.py:73-90, 124-140). Here the cheap-but-hot per-batch
transforms — random crop, joint horizontal-flip + profile time-reversal,
random vertical flip, Gaussian noise — can run inside the jitted train step
on TPU (SURVEY section 2b: "hot per-batch transforms fused into the jitted
train step"): the host pipeline then only decodes and resizes to the
oversized canonical shape, and the device does the randomized part, batched,
fused with the encoders' first ops by XLA.

Semantics match the host transforms: crop offsets uniform over the
(oversize - target) range, flips with probability 1/2, noise N(0, 1e-3).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def random_crop_2d(images: jnp.ndarray, target: int,
                   rng: jax.Array) -> jnp.ndarray:
    """Per-sample random spatial crop of (B, H, W, C) to (B, target, target, C)."""
    b, h, w, c = images.shape
    ry, rx = jax.random.split(rng)
    dy = jax.random.randint(ry, (b,), 0, h - target + 1)
    dx = jax.random.randint(rx, (b,), 0, w - target + 1)

    def crop(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (target, target, c))

    return jax.vmap(crop)(images, dy, dx)


def random_crop_1d(profiles: jnp.ndarray, target: int,
                   rng: jax.Array) -> jnp.ndarray:
    """Per-sample random temporal crop of (B, L, D) to (B, target, D)."""
    b, l, d = profiles.shape
    start = jax.random.randint(rng, (b,), 0, l - target + 1)

    def crop(p, s):
        return jax.lax.dynamic_slice(p, (s, 0), (target, d))

    return jax.vmap(crop)(profiles, start)


def random_vertical_flip(images: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, ::-1], images)


def joint_horizontal_flip(images: jnp.ndarray, profiles: jnp.ndarray,
                          rng: jax.Array
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PairAugmentation semantics (reference: src/data.py:198-204): one coin
    flips BOTH the image horizontally and the profile in time."""
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0],))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1], images)
    profiles = jnp.where(flip[:, None, None], profiles[:, ::-1], profiles)
    return images, profiles


def gaussian_noise(x: jnp.ndarray, rng: jax.Array,
                   scale: float = 1e-3) -> jnp.ndarray:
    return x + scale * jax.random.normal(rng, x.shape, x.dtype)


def multi_train_augment(batch: Dict[str, jnp.ndarray], target_size: int,
                        rng: jax.Array,
                        kind: str = "cnn") -> Dict[str, jnp.ndarray]:
    """Device-side tail of the train_multi augmentation pipeline. Expects the
    host to deliver oversized deterministic inputs: image (B, OS, OS, 1) in
    [-1, 1], profile (B, OS, D) normalized (OS = ceil(1.05 * target)).

    ``kind`` selects the profile encoder's tokenize contract, rebuilt here
    AFTER the temporal crop (the host tokenizer cannot know crop outcomes):
    every profile is exactly ``target_size`` long post-crop, so the
    transformer gets a zero CLS row + dense position ids + all-False padding
    mask, and the LSTM gets ``last_idx = target_size - 1`` — identical to
    what the host path produces for fixed-length resampled profiles
    (data/tokenize.py; reference: src/profile_encoder.py:38-54, 86-94)."""
    r_img, r_prof, r_vflip, r_joint, r_noise = jax.random.split(rng, 5)
    image = random_crop_2d(batch["image"], target_size, r_img)
    image = random_vertical_flip(image, r_vflip)
    profile = random_crop_1d(batch["profile"], target_size, r_prof)
    profile = gaussian_noise(profile, r_noise)
    image, profile = joint_horizontal_flip(image, profile, r_joint)
    out = dict(batch)
    out["image"] = image
    b = profile.shape[0]
    if kind == "transformer":
        cls = jnp.zeros((b, 1, profile.shape[-1]), profile.dtype)
        out["profile"] = jnp.concatenate([cls, profile], axis=1)
        out["time"] = jnp.broadcast_to(
            jnp.arange(target_size + 1, dtype=jnp.int32),
            (b, target_size + 1))
        out["padding_mask"] = jnp.zeros((b, target_size + 1), bool)
    elif kind == "lstm":
        out["profile"] = profile
        out["last_idx"] = jnp.full((b,), target_size - 1, jnp.int32)
    else:
        out["profile"] = profile
    return out
