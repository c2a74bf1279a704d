"""Device mesh and sharding utilities.

The reference is strictly single-device (no ``devices=``/``strategy=``
anywhere; reference: scripts/train_multi.py:99-104), so distribution here is
designed TPU-first rather than ported: a ``(data, model)``
``jax.sharding.Mesh`` over all chips, batches sharded along ``data``,
parameters replicated (models are <=ViT-S scale; the ``model`` axis exists so
tensor parallelism is available but defaults to 1). Under ``jit``, GSPMD
inserts the ICI collectives — gradient psums, global BatchNorm statistics,
and the cross-chip similarity blocks of the global-negatives contrastive
loss — automatically from these shardings.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_data: Optional[int] = None, n_model: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_data = n_data if n_data is not None else len(devices) // n_model
    n = n_data * n_model
    dev = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the data axis.
    Batch sizes must be divisible by the data-axis size (the loaders use
    ``drop_last=True`` in training, matching the reference)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(state, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
