from .multi import MultiModel
from .classifier import ImageClassifier, ProfileClassifier
from .image.encoder import ImageEncoder
from .profile import ProfileTransformer, ProfileLSTM, ProfileCNN, create_profile_encoder

__all__ = [
    "MultiModel",
    "ImageClassifier",
    "ProfileClassifier",
    "ImageEncoder",
    "ProfileTransformer",
    "ProfileLSTM",
    "ProfileCNN",
    "create_profile_encoder",
]
