from .contrastive import clip_loss_fused, siglip_loss_fused
from .conv1d import fused_conv_bn_relu_1d, fold_batchnorm

__all__ = ["clip_loss_fused", "siglip_loss_fused",
           "fused_conv_bn_relu_1d", "fold_batchnorm"]
