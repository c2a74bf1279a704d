from .mesh import create_mesh, batch_sharding, replicated_sharding, shard_batch
from .contrastive import global_clip_loss, global_siglip_loss
from .knn import ShardedGallery, shard_gallery, sharded_topk_euclidean

__all__ = [
    "create_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "global_clip_loss", "global_siglip_loss",
    "ShardedGallery", "shard_gallery", "sharded_topk_euclidean",
]
