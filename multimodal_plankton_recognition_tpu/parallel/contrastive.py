"""Sharded global-negatives contrastive losses.

TPU-native extension (absent from the reference, which emulates large-batch
contrast with in-batch "buckets"; reference: src/coordination.py:29-47):
embeddings are sharded (B_local, D) along the ``data`` mesh axis; each chip
all-gathers the other modality over ICI and computes its local
(B_local, B_global) block of the similarity matrix, so the full global-batch
InfoNCE/SigLIP is computed without materializing the (B, B) matrix on one
chip.

Two usage modes:

* **GSPMD (default)**: the plain ``ops.losses`` functions with ``buckets=1``
  under ``jit`` with a data-sharded batch — XLA inserts the same all-gather
  automatically. Preferred for simplicity.
* **Explicit shard_map (these functions)**: hand-placed collectives for when
  GSPMD's choices are suboptimal, and the target for a fused Pallas
  similarity+loss kernel. Verified equal to the unsharded loss in
  tests/test_parallel.py on an 8-device CPU mesh.

Symmetric CLIP across chips uses the identity: the column-softmax loss of
I @ P^T equals the row-softmax loss of P @ I^T, so each chip evaluates row
blocks of both directed matrices against its local diagonal labels and the
result is psum-averaged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.losses import l2_normalize


def _local_offset(axis_name: str, b_local: int) -> jnp.ndarray:
    return jax.lax.axis_index(axis_name) * b_local


def _row_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logprobs, labels[:, None], axis=-1))


def global_clip_loss(image_emb: jnp.ndarray, profile_emb: jnp.ndarray,
                     logit_scale: jnp.ndarray,
                     axis_name: str = "data",
                     reduce: bool = True) -> jnp.ndarray:
    """Symmetric InfoNCE over the global batch. Call inside shard_map with
    embeddings sharded (B_local, D) along ``axis_name``.

    ``reduce=False`` returns the UNREDUCED per-chip loss ``l_i`` (the local
    rows' contribution, global = pmean of these) for the shard_map train
    step, which differentiates ``l_i`` locally and pmeans the grads — the
    all_gather transpose routes the cross-chip cotangents, so
    ``pmean_i(grad l_i) == grad(pmean_i l_i)`` (tested on the 8-device
    mesh, tests/test_parallel.py)."""
    i = l2_normalize(image_emb)
    p = l2_normalize(profile_emb)
    b_local = i.shape[0]
    # (n_dev, B_local, D) -> (B_global, D); rides ICI
    p_all = jax.lax.all_gather(p, axis_name).reshape(-1, p.shape[-1])
    i_all = jax.lax.all_gather(i, axis_name).reshape(-1, i.shape[-1])
    scale = jnp.exp(logit_scale)
    labels = _local_offset(axis_name, b_local) + jnp.arange(b_local)
    loss_i2p = _row_xent(i @ p_all.T * scale, labels)
    loss_p2i = _row_xent(p @ i_all.T * scale, labels)
    local = (loss_i2p + loss_p2i) / 2
    return jax.lax.pmean(local, axis_name) if reduce else local


def global_siglip_loss(image_emb: jnp.ndarray, profile_emb: jnp.ndarray,
                       logit_scale: jnp.ndarray, logit_bias: jnp.ndarray,
                       axis_name: str = "data",
                       reduce: bool = True) -> jnp.ndarray:
    """Pairwise sigmoid loss over the global batch, normalized per the
    reference convention (sum over the full matrix / global batch size).
    ``reduce=False``: see :func:`global_clip_loss`."""
    i = l2_normalize(image_emb)
    p = l2_normalize(profile_emb)
    b_local = i.shape[0]
    p_all = jax.lax.all_gather(p, axis_name).reshape(-1, p.shape[-1])
    b_global = p_all.shape[0]
    logits = i @ p_all.T * jnp.exp(logit_scale) + logit_bias
    offset = _local_offset(axis_name, b_local)
    cols = jnp.arange(b_global)[None, :]
    rows = offset + jnp.arange(b_local)[:, None]
    labels = jnp.where(cols == rows, 1.0, -1.0).astype(logits.dtype)
    local = -jax.nn.log_sigmoid(labels * logits).sum() / b_global
    if reduce:
        return jax.lax.psum(local, axis_name)
    # pmean of (local * n_dev) == psum of local == the reduced value
    return local * (b_global // b_local)


def make_global_loss_shard_map(loss_fn, mesh, axis_name: str = "data",
                               n_scalars: int = 1):
    """Wrap a global loss for direct invocation on data-sharded embeddings.
    ``n_scalars`` is the number of trailing replicated scalar params
    (1 for CLIP's logit_scale, 2 for SigLIP's scale+bias)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.7
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    in_specs = (P(axis_name), P(axis_name)) + (P(),) * n_scalars
    return shard_map(
        partial(loss_fn, axis_name=axis_name), mesh=mesh,
        in_specs=in_specs, out_specs=P(),
    )
