from .dataset import MultiSet
from .transforms import (
    ImageTransforms,
    ImageTransformTrain,
    ImageTransformTest,
    ImageTransformOversize,
    ProfileTransform,
    ProfileTransformTrain,
    ProfileTransformTest,
    ProfileTransformOversize,
    PairAugmentation,
    PROFILE_LOG_CEILINGS,
)
from .packed import PackedMultiSet, pack_split
from .pipeline import Loader, prefetch_to_device
from . import tokenize

__all__ = [
    "MultiSet",
    "PackedMultiSet",
    "pack_split",
    "ImageTransforms",
    "ImageTransformTrain",
    "ImageTransformTest",
    "ImageTransformOversize",
    "ProfileTransform",
    "ProfileTransformTrain",
    "ProfileTransformTest",
    "ProfileTransformOversize",
    "PairAugmentation",
    "PROFILE_LOG_CEILINGS",
    "Loader",
    "prefetch_to_device",
    "tokenize",
]
