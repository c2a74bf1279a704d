from .contrastive import clip_loss_fused, siglip_loss_fused

__all__ = ["clip_loss_fused", "siglip_loss_fused"]
