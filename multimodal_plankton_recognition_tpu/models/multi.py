"""Contrastive cross-modal pretraining model.

Flax redesign of the reference's ``MultiModel`` LightningModule
(reference: src/model.py:19-148): image + profile encoders with bias-free
linear projections into a shared ``dim_embed`` space, plus a coordination
head holding the loss's learnable scalars (CLIP ``logit_scale`` init 1.0,
SigLIP bias init -10.0, ArcFace class weights), so a single SGD parameter
tree matches the reference's optimization exactly.

The training/eval/predict steps live in train/loop.py as jitted pure
functions; this module only defines parameters and the ``encode`` method
(used via ``model.apply(vars, ..., method="encode")``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .image.encoder import ImageEncoder
from .profile.factory import create_profile_encoder
from ..ops import losses


class CoordinationHead(nn.Module):
    """Learnable scalars for the coordination loss, dispatched on
    ``method`` (reference: src/model.py:44-56)."""

    method: str = "clip"
    beta: float = 0.25
    margin: float = 0.25
    #: route clip/siglip through the fused Pallas TPU kernels
    #: (ops/pallas/contrastive.py); identical math, logits never leave VMEM
    fused: bool = False
    # arcface options
    out_features: int = 0
    in_features: int = 0
    s: float = 30.0
    m: float = 0.50
    easy_margin: bool = False

    @nn.compact
    def __call__(self, image_emb: jnp.ndarray, profile_emb: jnp.ndarray,
                 buckets: int = 1,
                 label: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..ops.kernels import kernel_path_allowed

        m = self.method
        if m in ("clip", "clipplus", "siglip", "siglipplus"):
            logit_scale = self.param("logit_scale", nn.initializers.ones, ())
        # kernel path only where a pallas_call sees the full local batch
        # (single-chip TPU / per-chip shard_map trace); under a multi-chip
        # GSPMD mesh the plain losses below shard cleanly instead
        if self.fused and m in ("clip", "clipplus", "siglip", "siglipplus") \
                and kernel_path_allowed():
            from ..ops.pallas.contrastive import (
                clip_loss_fused, siglip_loss_fused,
            )
            interpret = jax.default_backend() != "tpu"
            if m in ("clip", "clipplus"):
                loss = clip_loss_fused(image_emb, profile_emb, logit_scale,
                                       buckets, interpret)
            else:
                bias = self.param("logit_bias",
                                  nn.initializers.constant(-10.0), ())
                loss = siglip_loss_fused(image_emb, profile_emb, logit_scale,
                                         bias, buckets, interpret)
            if m.endswith("plus"):
                loss = loss + self.beta * losses.mse_loss(image_emb,
                                                          profile_emb)
            return loss
        if m == "clip":
            return losses.clip_loss(image_emb, profile_emb, logit_scale, buckets)
        if m == "clipplus":
            return losses.clipplus_loss(image_emb, profile_emb, logit_scale,
                                        buckets, self.beta)
        if m in ("siglip", "siglipplus"):
            bias = self.param("logit_bias",
                              nn.initializers.constant(-10.0), ())
            if m == "siglip":
                return losses.siglip_loss(image_emb, profile_emb, logit_scale,
                                          bias, buckets)
            return losses.siglipplus_loss(image_emb, profile_emb, logit_scale,
                                          bias, buckets, self.beta)
        if m == "rank":
            return losses.rank_loss(image_emb, profile_emb, self.margin,
                                    buckets)
        if m == "distance":
            return losses.distance_loss(image_emb, profile_emb)
        if m == "arcface":
            weight = self.param(
                "weight", nn.initializers.xavier_uniform(),
                (self.out_features, self.in_features))
            return losses.arcface_loss(image_emb, profile_emb, label, weight,
                                       self.s, self.m, self.easy_margin)
        if m == "zero":
            return losses.zero_loss()
        raise ValueError(f"Coordination loss not found: {m!r}")


class MultiModel(nn.Module):
    dim_embed: int = 512
    image_encoder_args: Optional[Dict[str, Any]] = None
    profile_encoder_args: Optional[Dict[str, Any]] = None
    coordination_args: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.image_encoder = ImageEncoder(
            dtype=self.dtype, **(self.image_encoder_args or {}))
        self.profile_encoder = create_profile_encoder(
            self.profile_encoder_args or {}, dtype=self.dtype)
        self.image_projection = nn.Dense(self.dim_embed, use_bias=False,
                                         dtype=self.dtype)
        self.profile_projection = nn.Dense(self.dim_embed, use_bias=False,
                                           dtype=self.dtype)
        coord = dict(self.coordination_args or {"method": "clip"})
        coord.pop("negatives", None)
        if coord.get("method") == "arcface":
            coord.setdefault("in_features", self.dim_embed)
        self.coordination = CoordinationHead(**coord)

    def encode(self, image: Optional[jnp.ndarray] = None,
               image_shape: Optional[jnp.ndarray] = None,
               profile: Optional[jnp.ndarray] = None,
               profile_len: Optional[jnp.ndarray] = None,
               train: bool = False,
               **tokens) -> Dict[str, Optional[jnp.ndarray]]:
        """Embed available modalities; a missing (None) modality is skipped
        ("safe_forward", reference: src/model.py:64-85)."""
        image_emb = profile_emb = None
        if image is not None:
            feat = self.image_encoder(image, image_shape=image_shape,
                                      train=train)
            image_emb = self.image_projection(feat)
        if profile is not None:
            feat = self.profile_encoder(profile, profile_len=profile_len,
                                        train=train, **tokens)
            profile_emb = self.profile_projection(feat)
        return {"image_emb": image_emb, "profile_emb": profile_emb}

    def loss(self, buckets: int = 1, label: Optional[jnp.ndarray] = None,
             train: bool = True, **batch) -> jnp.ndarray:
        emb = self.encode(train=train, **batch)
        return self.coordination(emb["image_emb"], emb["profile_emb"],
                                 buckets=buckets, label=label)

    def __call__(self, **batch):  # default: init path exercises everything
        return self.loss(**batch)
