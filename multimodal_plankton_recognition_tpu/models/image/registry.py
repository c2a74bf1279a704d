"""Image-backbone registry keyed by the timm model names the reference cards
use (reference: src/image_encoder.py:16 ``timm.create_model(name, ...)``,
names swept in scripts/train_image.sh:8-15 and scripts/train_multi.sh:9-14).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.registry import Registry
from . import vit, resnet, efficientnet, densenet

IMAGE_BACKBONES: Registry = Registry("image backbone")

IMAGE_BACKBONES.register("vit_tiny_patch16_224")(vit.vit_tiny_patch16_224)
IMAGE_BACKBONES.register("vit_small_patch16_224")(vit.vit_small_patch16_224)
IMAGE_BACKBONES.register("vit_small_patch32_224")(vit.vit_small_patch32_224)
IMAGE_BACKBONES.register("resnet18")(resnet.resnet18)
IMAGE_BACKBONES.register("resnet50")(resnet.resnet50)
IMAGE_BACKBONES.register("efficientnet_b0")(efficientnet.efficientnet_b0)
IMAGE_BACKBONES.register("efficientnet_b1")(efficientnet.efficientnet_b1)
IMAGE_BACKBONES.register("densenet121")(densenet.densenet121)
IMAGE_BACKBONES.register("densenet169")(densenet.densenet169)


def create_backbone(name: str, in_chans: int = 1,
                    dtype: jnp.dtype = jnp.float32, **kw):
    return IMAGE_BACKBONES.create(name, in_chans=in_chans, dtype=dtype, **kw)
