from .transformer import ProfileTransformer
from .lstm import ProfileLSTM
from .cnn import ProfileCNN
from .factory import create_profile_encoder

__all__ = ["ProfileTransformer", "ProfileLSTM", "ProfileCNN",
           "create_profile_encoder"]
