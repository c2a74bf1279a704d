from .mesh import create_mesh, batch_sharding, replicated_sharding, shard_batch
from .contrastive import global_clip_loss, global_siglip_loss

__all__ = [
    "create_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "global_clip_loss", "global_siglip_loss",
]
