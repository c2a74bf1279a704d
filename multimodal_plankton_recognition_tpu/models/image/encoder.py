"""Image encoder: backbone + optional image-shape metadata fusion.

Mirrors the reference's ``ImageEncoder`` (reference: src/image_encoder.py:8-29):
a pooled backbone feature with the original (height, width) / 224 appended as
two metadata dims, followed by dropout. ``dim_out = num_features + 2*metadata``.

Fixes a reference landmine: the reference hard-codes ``pretrained=True`` and
ignores its own flag (src/image_encoder.py:17). Here ``pretrained`` weights
are loaded from an npz checkpoint (``pretrained_path``) by the training
driver when requested; the module itself is init-from-scratch.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import flax.linen as nn

from .registry import create_backbone


class ImageEncoder(nn.Module):
    name: str = "efficientnet_b0"
    in_chans: int = 1
    dropout: float = 0.1
    metadata: bool = True
    num_classes: int = 0          # accepted for card parity; features only
    pretrained: bool = False      # handled by the driver (npz load)
    pretrained_path: Optional[str] = None
    #: route EfficientNet MBConv blocks through the fused Pallas TPU kernels
    #: (ops/pallas/experimental/mbconv.py) — identical math, the 6x-expanded
    #: intermediates never leave VMEM; single-chip training path
    fused_mbconv: bool = False
    #: route ViT attention through the fused Pallas kernel
    #: (models/attention.py / ops/pallas/attention.py)
    fused_attention: bool = False
    #: route ViT MLPs through the fused Pallas FFN kernel (models/ffn.py)
    fused_ffn: bool = False
    #: rematerialize EfficientNet MBConv blocks (jax.checkpoint):
    #: ``True`` = full per-block remat (measured negative, docs/PERF.md);
    #: ``"conv_saves"`` = policy remat saving only raw conv outputs and
    #: recomputing the elementwise BN/SiLU/SE chains in backward
    remat: Union[bool, str] = False
    #: extra kwargs forwarded verbatim to the backbone constructor (e.g.
    #: ``{"img_size": 32, "depth": 2}`` for the scaled-down conformance
    #: models in __graft_entry__.dryrun_multichip); also accepted as an
    #: ``image_encoder_args.backbone_kwargs`` card key (config.py validates
    #: it — the parity-gate ViT protocol card uses it)
    backbone_kwargs: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        extra = {"fused": True} \
            if self.fused_mbconv and "efficientnet" in self.name else {}
        if self.fused_attention and self.name.startswith("vit"):
            extra["fused_attention"] = True
        if self.fused_ffn and self.name.startswith("vit"):
            extra["fused_ffn"] = True
        if self.remat and "efficientnet" in self.name:
            extra["remat"] = self.remat
        extra.update(self.backbone_kwargs or {})
        self.backbone = create_backbone(self.name, in_chans=self.in_chans,
                                        dtype=self.dtype, **extra)
        self.drop = nn.Dropout(self.dropout)

    @property
    def dim_out(self) -> int:
        return create_backbone(self.name, in_chans=self.in_chans,
                               dtype=self.dtype,
                               **(self.backbone_kwargs or {})).num_features \
            + 2 * int(self.metadata)

    def __call__(self, image: jnp.ndarray,
                 image_shape: Optional[jnp.ndarray] = None,
                 train: bool = False, **kwargs) -> jnp.ndarray:
        x = self.backbone(image, train=train)
        if self.metadata:
            # original (H, W) scaled by the model input resolution
            # (reference: src/image_encoder.py:26-27 divides by image.shape[2])
            md = image_shape.astype(x.dtype) / image.shape[1]
            x = jnp.concatenate([x, md.reshape(x.shape[0], -1)], axis=1)
        x = self.drop(x, deterministic=not train)
        return x
