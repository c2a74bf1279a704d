"""Pod-scale exact retrieval: gallery-sharded top-k over the device mesh.

The single-chip retrieval path (ops/knn.py) replaces the reference's
pynndescent index (reference: src/ann.py:6-34) with one MXU matmul +
``jax.lax.top_k``. That design scales to galleries far beyond one chip's
HBM by sharding the *gallery rows* across the mesh's data axis: each device
scores the replicated query block against its local gallery shard and
reduces to a local top-k candidate list; GSPMD then gathers the
(queries, n_devices * k) candidate scores/global-indices over ICI — tiny
compared to the (queries, gallery) distance matrix, which never
materializes globally — for a replicated merge top-k. Exactness: the
global top-k set is a subset of the union of per-shard top-k sets, so the
merge loses nothing (distance ties may order differently than the
single-device kernel; both orders are valid k-NN sets, and the virtual-mesh
test asserts exact index equality on tie-free data).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, create_mesh

#: padded gallery rows sit astronomically far from any real query
#: (same convention as ops.knn.ANNClassifier._PAD_VALUE)
_PAD_VALUE = 1e15


def _local_scores(q: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Negated squared euclidean distances of q rows vs local gallery rows."""
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    gn = jnp.sum(g * g, axis=1)
    return -(qn - 2.0 * (q @ g.T) + gn[None, :])


def _local_candidates(q: jnp.ndarray, g: jnp.ndarray, kl: int, shard: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device top-kl candidates as (scores, global row indices)."""
    scores, lidx = jax.lax.top_k(_local_scores(q, g), kl)
    gidx = lidx + jax.lax.axis_index(DATA_AXIS) * shard
    return scores, gidx


@partial(jax.jit, static_argnames=("k", "kl", "shard", "mesh"))
def _sharded_topk(q, g, *, k: int, kl: int, shard: int, mesh: Mesh):
    # per-shard scoring + local top-k under explicit shard_map; the merge
    # runs outside it under GSPMD, which inserts the candidate gather
    local = jax.shard_map(
        partial(_local_candidates, kl=kl, shard=shard),
        mesh=mesh, in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)))
    scores, gidx = local(q, g)  # (nq, ndev*kl) candidates
    best, pos = jax.lax.top_k(scores, k)
    idx = jnp.take_along_axis(gidx, pos, axis=1)
    dist = jnp.sqrt(jnp.maximum(-best, 0.0))
    rep = NamedSharding(mesh, P())
    return (jax.lax.with_sharding_constraint(idx, rep),
            jax.lax.with_sharding_constraint(dist, rep))


class ShardedGallery(NamedTuple):
    """A row-sharded, pad-aligned gallery plus its REAL (unpadded) row count.

    Carrying ``n_real`` lets :func:`sharded_topk_euclidean` validate ``k``
    against the true gallery size rather than the padded one, so a caller
    can never silently receive ``_PAD_VALUE`` sentinel rows as neighbors.
    """

    rows: jnp.ndarray  #: (padded_rows, dim), sharded P(DATA_AXIS, None)
    n_real: int


def shard_gallery(gallery: np.ndarray, mesh: Mesh,
                  n_real: Optional[int] = None) -> ShardedGallery:
    """Pad gallery rows to the data-axis size and place them row-sharded.

    The returned :class:`ShardedGallery` can be passed to
    :func:`sharded_topk_euclidean` repeatedly without re-transfer.
    Pass ``n_real`` when ``gallery`` ALREADY carries sentinel pad rows
    (e.g. ANNClassifier's SHAPE_BUCKET padding) so the k-vs-gallery-size
    guard validates against the true row count, not the padded one
    (round-4 advisor finding).
    """
    ndev = mesh.shape[DATA_AXIS]
    if n_real is None:
        n_real = gallery.shape[0]
    # pad from the ACTUAL array length (it may already carry caller pad
    # rows beyond n_real) so the sharded dim divides the data axis
    pad = (-gallery.shape[0]) % ndev
    if pad:
        gallery = np.concatenate([
            np.asarray(gallery, np.float32),
            np.full((pad, gallery.shape[1]), _PAD_VALUE, np.float32)])
    rows = jax.device_put(jnp.asarray(gallery, jnp.float32),
                          NamedSharding(mesh, P(DATA_AXIS, None)))
    return ShardedGallery(rows, n_real)


def sharded_topk_euclidean(queries,
                           gallery: Union[np.ndarray, jax.Array,
                                          "ShardedGallery"],
                           k: int,
                           mesh: Optional[Mesh] = None,
                           n_real: Optional[int] = None,
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Indices & euclidean distances of the k nearest gallery rows, with the
    gallery row-sharded over ``mesh``'s data axis.

    Matches ops.knn._topk_euclidean (up to distance-tie ordering) while
    holding only ``rows/n_devices`` of the gallery — and of the distance
    matrix — per device. Queries are replicated; results are replicated.
    ``gallery`` may be host numpy, the :class:`ShardedGallery` from
    :func:`shard_gallery` (preferred for repeated queries), or a bare
    pre-sharded ``jax.Array`` (then pass ``n_real`` if the array carries
    pad rows, else the padded size is assumed real).
    """
    mesh = mesh if mesh is not None else create_mesh()
    if isinstance(gallery, ShardedGallery):
        gallery, n_real = gallery.rows, gallery.n_real
    elif not isinstance(gallery, jax.Array):
        gallery, n_real = shard_gallery(np.asarray(gallery), mesh)
    elif n_real is None:
        n_real = gallery.shape[0]
    if k > n_real:
        raise ValueError(f"k={k} exceeds gallery size {n_real}")
    n = gallery.shape[0]
    ndev = mesh.shape[DATA_AXIS]
    shard = n // ndev
    kl = min(k, shard)  # per-shard candidates; ndev*kl >= k since k <= n
    queries = jax.device_put(
        jnp.asarray(np.asarray(queries), jnp.float32),
        NamedSharding(mesh, P()))
    idx, dist = _sharded_topk(queries, gallery, k=k, kl=kl, shard=shard,
                              mesh=mesh)
    return np.asarray(idx), np.asarray(dist)
