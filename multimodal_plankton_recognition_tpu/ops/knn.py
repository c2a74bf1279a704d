"""Exact top-k gallery retrieval.

TPU-native replacement for the reference's pynndescent approximate-NN
classifier (reference: src/ann.py:6-34). Galleries here are at most a few
thousand points x 512 dims, so the idiomatic TPU design is **exact** k-NN:
one jitted ``queries @ gallery.T`` on the MXU plus ``jax.lax.top_k`` —
deterministic, faster than graph-based ANN at this scale, and removing the
reference's "ANN is nondeterministic, seeds set to reproduce" caveat
(reference: experiments.ipynb cell 9 markdown). ``jax.lax.approx_max_k`` (the
TPU-native ANN op) is available behind ``approx=True`` for much larger
galleries.

The public ``ANNClassifier`` API matches the reference: build from
``(X, y)``, ``kneighbors(*X_queries)`` queries the index once per query
modality and h-stacks the results (this is the multimodal fusion mechanism,
reference: src/ann.py:15-21), prediction is inverse-distance weighted mode.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "approx"))
def _topk_euclidean(queries: jnp.ndarray, gallery: jnp.ndarray,
                    k: int, approx: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices & euclidean distances of the k nearest gallery rows.

    Uses ||q - g||^2 = ||q||^2 - 2 q.g + ||g||^2; the -2 q.g term is one MXU
    matmul over the whole query block.
    """
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    gn = jnp.sum(g * g, axis=1)
    sq = qn - 2.0 * (q @ g.T) + gn[None, :]
    neg = -sq
    if approx:
        scores, idx = jax.lax.approx_max_k(neg, k=k)
    else:
        scores, idx = jax.lax.top_k(neg, k=k)
    dist = jnp.sqrt(jnp.maximum(-scores, 0.0))
    return idx, dist


def weighted_mode_device(classes: jnp.ndarray, weights: jnp.ndarray,
                         n_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable row-wise weighted mode: ``(argmax class id, vote matrix)``.

    Device-side counterpart of :func:`weighted_mode` (same semantics:
    ties break toward the smaller class id via argmax-first-occurrence),
    used by the exported retrieval-classifier artifact
    (retrieval/export.py) where the vote accumulation must live inside
    the lowered StableHLO function.
    """
    B, K = classes.shape
    votes = jnp.zeros((B, n_classes), dtype=jnp.float32)
    rows = jnp.repeat(jnp.arange(B), K)
    votes = votes.at[rows, classes.ravel()].add(
        weights.ravel().astype(jnp.float32))
    return jnp.argmax(votes, axis=1), votes


def inverse_distance_weights(dist: jnp.ndarray,
                             exact_eps: float = 0.0) -> jnp.ndarray:
    """Jittable inverse-distance weights with the reference's exact-hit
    rule (reference: src/ann.py:28-34): when any neighbor distance is 0,
    the zero-distance neighbors get all the mass (weight 1) and the rest
    none. Mirrors :meth:`ANNClassifier._get_weights`.

    ``exact_eps`` widens the exact-hit rule to ``dist <= exact_eps`` for
    the serving artifact (retrieval/export.py): the exported StableHLO
    lowering can differ from the jit that built the gallery by ~1e-6 in
    the embeddings, so a query that IS a gallery member lands at d~1e-6,
    not 0, and the ==0 rule silently never fires cross-lowering. Queries
    arrive as raw (image, profile) inputs, so self-hits cannot be
    identified by gallery row id — a distance tolerance far below any
    genuine inter-sample distance (L2-normalized embeddings) but far above
    lowering noise is the robust equivalent. Default 0.0 keeps the
    reference's bit-exact semantics for the in-process classifier."""
    w = jnp.where(dist > exact_eps, 1.0 / jnp.maximum(dist, 1e-38), jnp.inf)
    inf_mask = jnp.isinf(w)
    inf_row = jnp.any(inf_mask, axis=1, keepdims=True)
    return jnp.where(inf_row, inf_mask.astype(w.dtype), w)


def weighted_mode(classes: np.ndarray, weights: np.ndarray,
                  n_classes: int | None = None) -> np.ndarray:
    """Row-wise weighted mode (sklearn.utils.extmath.weighted_mode
    equivalent; reference: src/ann.py:24). Ties break toward the smaller
    class id, matching sklearn."""
    classes = np.asarray(classes, dtype=np.int64)
    weights = np.asarray(weights, dtype=np.float64)
    n = int(classes.max()) + 1 if n_classes is None else n_classes
    rows = np.repeat(np.arange(classes.shape[0]), classes.shape[1])
    votes = np.zeros((classes.shape[0], n), dtype=np.float64)
    np.add.at(votes, (rows, classes.ravel()), weights.ravel())
    return votes.argmax(axis=1)


class ANNClassifier:
    """Weighted-kNN classifier over an exact (or TPU-approximate) index.

    API-compatible with the reference (src/ann.py): pynndescent build kwargs
    (``n_neighbors``, ``metric``, ``diversify_prob``, ...) are accepted and
    ignored — there is no graph to build; ``epsilon`` on query is likewise
    accepted for CLI compatibility.
    """

    #: pad gallery rows / query rows up to multiples of this so repeated
    #: queries with slightly different sizes reuse one compiled XLA program
    #: (distinct shapes would otherwise recompile on TPU each run)
    SHAPE_BUCKET = 256
    _PAD_VALUE = 1e15  # padded gallery rows sit astronomically far away

    def __init__(self, X: np.ndarray, y: np.ndarray, approx: bool = False,
                 sharded: bool = False, mesh=None, **nndescent_args) -> None:
        self.y_ = np.asarray(y).copy()
        X = np.asarray(X, dtype=np.float32)
        self._n_gallery = X.shape[0]
        pad = (-X.shape[0]) % self.SHAPE_BUCKET
        if pad:
            X = np.concatenate(
                [X, np.full((pad, X.shape[1]), self._PAD_VALUE, np.float32)])
        self._approx = approx
        self._mesh = None
        if sharded:
            # pod-scale path: gallery rows sharded over the mesh's data
            # axis; each device holds rows/n_devices of the gallery and of
            # the distance matrix (parallel/knn.py)
            from ..parallel import knn as pknn
            from ..parallel.mesh import create_mesh
            self._mesh = mesh if mesh is not None else create_mesh()
            # X already carries SHAPE_BUCKET sentinel pad rows — pass the
            # true row count so ShardedGallery.n_real (and its k guard)
            # reflects the real gallery, not the bucket-padded one
            self._gallery = pknn.shard_gallery(X, self._mesh,
                                               n_real=self._n_gallery)
        else:
            self._gallery = jnp.asarray(X)

    def kneighbors(self, *X: np.ndarray, k: int = 1, **query_args):
        k = min(k, self._n_gallery)  # clamp to (real) gallery size
        out = []
        for x in X:
            x = np.asarray(x, dtype=np.float32)
            nq = x.shape[0]
            pad = (-nq) % self.SHAPE_BUCKET
            if pad:
                x = np.concatenate([x, np.zeros((pad, x.shape[1]), np.float32)])
            if self._mesh is not None:
                from ..parallel import knn as pknn
                idx, dist = pknn.sharded_topk_euclidean(
                    x, self._gallery, k=k, mesh=self._mesh)
            else:
                idx, dist = _topk_euclidean(jnp.asarray(x), self._gallery,
                                            k=k, approx=self._approx)
            out.append((np.asarray(idx[:nq]), np.asarray(dist[:nq])))
        return tuple(out)

    def predict(self, *X: np.ndarray, k: int = 1, **query_args) -> np.ndarray:
        return self.predict_many(*X, ks=(k,), **query_args)[k]

    def predict_many(self, *X: np.ndarray, ks: Tuple[int, ...],
                     **query_args) -> dict:
        """Predictions for several neighbor counts from ONE top-max(ks)
        query per modality (exact top-k lists are sorted by distance, so the
        k-NN set is a prefix of the max-k set). Avoids re-running — and on
        TPU re-compiling — the retrieval for every k."""
        kmax = min(max(ks), self._n_gallery)
        neighbors = self.kneighbors(*X, k=kmax, **query_args)
        out = {}
        for k in ks:
            kk = min(k, kmax)
            idx = np.hstack([n[0][:, :kk] for n in neighbors])
            dist = np.hstack([n[1][:, :kk] for n in neighbors])
            weights = self._get_weights(dist)
            classes = self.y_[idx]
            out[k] = weighted_mode(classes, weights).astype(int).ravel()
        return out

    @staticmethod
    def _get_weights(dist: np.ndarray) -> np.ndarray:
        """Inverse-distance weights; an exact hit (d=0) gets all the mass
        (reference: src/ann.py:28-34)."""
        with np.errstate(divide="ignore"):
            w = 1.0 / dist
        inf_mask = np.isinf(w)
        inf_row = np.any(inf_mask, axis=1)
        w[inf_row] = inf_mask[inf_row]
        return w
