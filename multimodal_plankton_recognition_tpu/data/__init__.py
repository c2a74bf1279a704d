from .dataset import MultiSet
from .transforms import (
    ImageTransforms,
    ImageTransformTrain,
    ImageTransformTest,
    ProfileTransform,
    ProfileTransformTrain,
    ProfileTransformTest,
    PairAugmentation,
    PROFILE_LOG_CEILINGS,
)
from .pipeline import Loader, prefetch_to_device
from . import tokenize

__all__ = [
    "MultiSet",
    "ImageTransforms",
    "ImageTransformTrain",
    "ImageTransformTest",
    "ProfileTransform",
    "ProfileTransformTrain",
    "ProfileTransformTest",
    "PairAugmentation",
    "PROFILE_LOG_CEILINGS",
    "Loader",
    "prefetch_to_device",
    "tokenize",
]
