from .registry import IMAGE_BACKBONES, create_backbone
from .encoder import ImageEncoder

__all__ = ["IMAGE_BACKBONES", "create_backbone", "ImageEncoder"]
