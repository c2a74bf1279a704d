"""Explicit shard_map data-parallel train/eval steps.

The default GSPMD path (train/loop.py) shards the batch and lets XLA insert
the collectives, but a ``pallas_call`` has no GSPMD partitioning rule, so
the fused Pallas kernels (lane-mask attention, fused contrastive loss) are
forfeited on multi-chip meshes. This module instead traces the SAME
per-chip program the single-chip path compiles — inside ``jax.shard_map``
each chip sees its local ``(B_local, ...)`` batch, which is exactly the
situation the kernels are written for (ops/kernels.py marks the trace) —
and hand-places the collectives:

* gradients: ``pmean`` over the ``data`` axis after a local
  ``value_and_grad``;
* ``negatives: global``: the parallel/contrastive.py losses (all-gather of
  the other modality over ICI); their ``reduce=False`` variants return the
  per-chip loss, whose pmean'd gradients equal the unsharded gradients
  because the all_gather transpose routes the cross-chip cotangents
  (tests/test_shard_step.py verifies both modes against the single-device
  step).

Restricted to BatchNorm-free models (the ViT + ProfileTransformer flagship
family — reference: scripts/train_multi.sh ViT rows): a BN model's
per-chip batch statistics would silently diverge from the GSPMD path's
sync-BN semantics, so the drivers reject ``parallel: shard_map`` cards
whose models carry ``batch_stats``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import losses
from ..ops.kernels import shard_map_kernels
from ..parallel.contrastive import global_clip_loss, global_siglip_loss
from .state import TrainState

try:
    from jax import shard_map as _shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

_GLOBAL_METHODS = ("clip", "clipplus", "siglip", "siglipplus")


def make_multi_steps_shard_map(model, tx: optax.GradientTransformation,
                               mesh, buckets: int = 1,
                               negatives: str = "bucketed",
                               augment_fn=None, axis: str = "data"):
    """(train_step, eval_step) running the per-chip program under shard_map.

    Drop-in signature-compatible with train/loop.make_multi_steps plus the
    mesh; the state must be replicated and batches sharded along ``axis``
    (the drivers' standard placement).
    """
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape[axis]
    coord = dict(model.coordination_args or {"method": "clip"})
    method = coord.get("method", "clip")
    if negatives == "global":
        if method not in _GLOBAL_METHODS:
            raise ValueError(
                f"negatives: global supports methods {_GLOBAL_METHODS}, "
                f"got {method!r}")
        buckets_local = 1
    else:
        if buckets % n_data != 0:
            raise ValueError(
                f"parallel: shard_map with bucketed negatives needs "
                f"buckets ({buckets}) divisible by the data-axis size "
                f"({n_data}) so bucket groups stay chip-local; use the "
                f"GSPMD path or negatives: global otherwise")
        buckets_local = buckets // n_data

    def local_loss(params, batch, rng, *, train: bool):
        variables = {"params": params}
        rngs = {"dropout": rng} if train else None
        if negatives == "global":
            emb = model.apply(variables, method="encode", train=train,
                              rngs=rngs, **batch)
            i = emb["image_emb"].astype(jnp.float32)
            p = emb["profile_emb"].astype(jnp.float32)
            head = params["coordination"]
            scale = head["logit_scale"]
            if method in ("clip", "clipplus"):
                loss = global_clip_loss(i, p, scale, axis, reduce=False)
            else:
                loss = global_siglip_loss(i, p, scale, head["logit_bias"],
                                          axis, reduce=False)
            if method.endswith("plus"):
                loss = loss + coord.get("beta", 0.25) * losses.mse_loss(i, p)
            return loss
        return model.apply(variables, method="loss", train=train, rngs=rngs,
                           buckets=buckets_local, **batch)

    def per_chip_train(state: TrainState, batch: Dict[str, jnp.ndarray],
                       rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        step_rng = jax.random.fold_in(
            jax.random.fold_in(rng, state.step), jax.lax.axis_index(axis))
        if augment_fn is not None:
            aug_rng, step_rng = jax.random.split(step_rng)
            batch = augment_fn(batch, aug_rng)

        # Differentiate the ALREADY-pmean'd loss, then pmean the per-chip
        # gradients — the classic pmap recipe. Under check_vma=False
        # (required for the pallas_call outputs, see smap below) shard_map
        # inserts no implicit replication collectives and pmean's transpose
        # leaves the cotangent unscaled, so each chip's grad is its full
        # local dL_i/dp (cross-chip paths through the global losses'
        # all_gather are still routed by its reduce_scatter transpose);
        # pmean assembles the replicated dL/dp. Pinned against the
        # single-device step in tests/test_shard_step.py.
        def global_loss_fn(p):
            return jax.lax.pmean(
                local_loss(p, batch, step_rng, train=True), axis)

        with shard_map_kernels():
            loss, grads = jax.value_and_grad(global_loss_fn)(state.params)
        grads = jax.lax.pmean(grads, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=new_opt)
        return new_state, loss

    def per_chip_eval(state: TrainState,
                      batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        with shard_map_kernels():
            loss = local_loss(state.params, batch, jax.random.key(0),
                              train=False)
        return {"loss": jax.lax.pmean(loss, axis)}

    def smap(fn, in_specs, out_specs):
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the checker (jax >= 0.7) rejects inside
        # shard_map; the collective/transpose semantics are unchanged and
        # pinned by the parity tests (tests/test_shard_step.py)
        try:
            return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:  # pragma: no cover — older jax spelling
            return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

    train_inner = smap(per_chip_train, (P(), P(axis), P()), (P(), P()))
    eval_inner = smap(per_chip_eval, (P(), P(axis)), P())
    train_step = jax.jit(train_inner, donate_argnums=(0,))
    eval_step = jax.jit(eval_inner)
    return train_step, eval_step
