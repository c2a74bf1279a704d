"""Multi-host (multi-slice / pod) support.

The reference is single-process (SURVEY section 2c). For TPU pods, each host
process loads only its shard of every global batch and the shards are
assembled into one global jax.Array along the ``data`` mesh axis; XLA
collectives then ride ICI within a slice and DCN across slices.

Usage in a pod launcher:

    from multimodal_plankton_recognition_tpu.parallel import multihost
    multihost.initialize()                    # jax.distributed.initialize()
    loader = Loader(..., host_shard=multihost.host_shard())
    batch = multihost.make_global_batch(local_batch, mesh)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (no-op when single-process
    and no coordinator is configured)."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_shard() -> Tuple[int, int]:
    """(process_index, process_count) for Loader per-host batch sharding."""
    return jax.process_index(), jax.process_count()


def make_global_batch(local_batch: Dict[str, np.ndarray],
                      mesh: Mesh) -> Dict[str, Any]:
    """Assemble per-host batch shards into global jax.Arrays sharded along
    the data axis. Each host must contribute global_bs / process_count rows."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return {k: put(v) for k, v in local_batch.items()}
