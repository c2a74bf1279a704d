"""Shared gating for the Pallas kernel paths.

A ``pallas_call`` has no GSPMD partitioning rule: under a multi-chip mesh
with batch-sharded inputs it would error or force full replication, so every
fused-kernel module falls back to its jnp/einsum composition there. Two
sanctioned exceptions re-enable the kernels:

* an explicit per-chip ``shard_map`` trace (train/loop.py's shard_map step):
  inside shard_map each chip sees the full local array, which is exactly the
  single-chip situation the kernels are written for — the step marks its
  trace with :func:`shard_map_kernels`;
* the CPU parity tests, which force interpret-mode kernels with the
  ``PLANKTON_FUSED_INTERPRET=1`` env escape hatch.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax

_IN_SHARD_STEP: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "plankton_in_shard_step", default=False)


@contextlib.contextmanager
def shard_map_kernels():
    """Mark the enclosed (synchronous) trace as a per-chip shard_map body
    where Pallas kernels see local, unsharded arrays."""
    token = _IN_SHARD_STEP.set(True)
    try:
        yield
    finally:
        _IN_SHARD_STEP.reset(token)


def in_shard_step() -> bool:
    return _IN_SHARD_STEP.get()


def force_interpret() -> bool:
    """Test escape hatch: run the kernel in interpret mode regardless of
    backend/device-count (CPU parity tests)."""
    return os.environ.get("PLANKTON_FUSED_INTERPRET") == "1"


def kernels_disabled() -> bool:
    """Probe escape hatch: force the jnp/einsum fallbacks everywhere
    (``PLANKTON_FUSED_DISABLE=1``) so a single-chip TPU can run the
    non-kernel composition as an oracle (scripts/mosaic_mesh_check.py)."""
    return os.environ.get("PLANKTON_FUSED_DISABLE") == "1"


def kernel_path_allowed() -> bool:
    """True when a pallas_call will see the full local array: a single-chip
    TPU, a shard_map per-chip trace on TPU, or the forced interpret mode."""
    if kernels_disabled():
        return False
    if force_interpret():
        return True
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or in_shard_step()
