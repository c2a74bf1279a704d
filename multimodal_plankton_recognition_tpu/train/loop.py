"""Jitted train/eval steps and the fit orchestration loop.

Replaces the reference's Lightning ``Trainer.fit`` + LightningModule step
methods (reference: src/model.py:93-133, scripts/train_multi.py:99-107) with
explicit jitted pure functions:

* the whole hot path (encoders + projections + loss + backward + SGD) is ONE
  XLA-compiled function per step — no Python in the loop body;
* gradient accumulation is handled inside the optimizer (optax.MultiSteps),
  so the per-microbatch step stays a single compiled function;
* under a device mesh, batches arrive sharded along the ``data`` axis and
  GSPMD inserts the cross-chip collectives (gradient psum, global BatchNorm
  reductions) automatically — see parallel/mesh.py.

Epoch-level behavior matches the reference: epoch-mean ``train_loss`` /
``valid_loss`` (+``valid_acc`` for classifiers) logged once per epoch
(reference: src/model.py:104-133), top-k checkpointing on the monitored
metric, early stopping with ``check_finite=False`` semantics (NaN losses do
not abort; reference: scripts/train_multi.py:95-97).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .state import TrainState


def _apply_loss(model, state: TrainState, params, batch, rng, *,
                train: bool, static_kwargs: Dict[str, Any]):
    variables = {"params": params}
    mutable = []
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
        mutable = ["batch_stats"] if train else []
    rngs = {"dropout": rng} if train else None
    if mutable:
        loss, updated = model.apply(
            variables, method="loss", train=train, mutable=mutable,
            rngs=rngs, **static_kwargs, **batch)
        return loss, updated.get("batch_stats", state.batch_stats)
    loss = model.apply(variables, method="loss", train=train, rngs=rngs,
                       **static_kwargs, **batch)
    return loss, state.batch_stats


def make_multi_steps(model, tx: optax.GradientTransformation,
                     buckets: int = 1, augment_fn=None):
    """(train_step, eval_step) for contrastive pretraining.

    ``augment_fn(batch, rng) -> batch`` optionally runs the randomized tail
    of the input transforms on-device inside the jitted step
    (ops/augment.multi_train_augment)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        step_rng = jax.random.fold_in(rng, state.step)
        if augment_fn is not None:
            aug_rng, step_rng = jax.random.split(step_rng)
            batch = augment_fn(batch, aug_rng)

        def loss_fn(params):
            return _apply_loss(model, state, params, batch, step_rng,
                               train=True,
                               static_kwargs={"buckets": buckets})

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, loss

    @jax.jit
    def eval_step(state: TrainState,
                  batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        loss, _ = _apply_loss(model, state, state.params, batch,
                              jax.random.key(0), train=False,
                              static_kwargs={"buckets": buckets})
        return {"loss": loss}

    return train_step, eval_step


def make_classifier_steps(model, tx: optax.GradientTransformation):
    """(train_step, eval_step) for the supervised unimodal classifiers.
    eval_step additionally returns argmax predictions for accuracy /
    confusion-matrix computation (reference: src/model.py:221-250)."""
    from ..ops.losses import cross_entropy_loss

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        step_rng = jax.random.fold_in(rng, state.step)
        label = batch["label"]
        inputs = {k: v for k, v in batch.items() if k != "label"}

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if mutable:
                logits, updated = model.apply(
                    variables, train=True, mutable=mutable,
                    rngs={"dropout": step_rng}, **inputs)
                new_bs = updated.get("batch_stats", state.batch_stats)
            else:
                logits = model.apply(variables, train=True,
                                     rngs={"dropout": step_rng}, **inputs)
                new_bs = state.batch_stats
            return cross_entropy_loss(logits, label), new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, loss

    @jax.jit
    def eval_step(state: TrainState,
                  batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        label = batch["label"]
        inputs = {k: v for k, v in batch.items() if k != "label"}
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, train=False, **inputs)
        loss = cross_entropy_loss(logits, label)
        return {"loss": loss, "pred": jnp.argmax(logits, axis=-1),
                "label": label}

    return train_step, eval_step


class Fitter:
    """Epoch-driven training orchestration (Lightning Trainer equivalent)."""

    def __init__(self, train_step: Callable, eval_step: Callable,
                 writer=None, checkpointer=None, early_stopping=None,
                 min_epochs: int = 1, max_epochs: int = 1,
                 check_val_every_n_epoch: int = 1, seed: int = 0,
                 hooks: Optional[Dict[str, Callable]] = None,
                 put_fn: Optional[Callable] = None) -> None:
        self.train_step = train_step
        self.eval_step = eval_step
        self.put_fn = put_fn or (lambda b: jax.tree.map(jnp.asarray, b))
        self.writer = writer
        self.checkpointer = checkpointer
        self.early_stopping = early_stopping
        self.min_epochs = min_epochs
        self.max_epochs = max_epochs
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.seed = seed
        self.hooks = hooks or {}
        self.history: list[Dict[str, float]] = []

    def _eval_epoch(self, state: TrainState, loader) -> Dict[str, float]:
        # keep everything on device during the loop — a float()/np.asarray
        # per batch is a host sync that serializes validation (costly over a
        # remote-TPU tunnel); fetch ONCE per epoch below
        losses, preds, labels = [], [], []
        for batch in loader:
            batch = self.put_fn(batch)
            out = self.eval_step(state, batch)
            losses.append(out["loss"])
            if "pred" in out:
                preds.append(out["pred"])
                labels.append(out["label"])
        losses, preds, labels = jax.device_get((losses, preds, labels))
        metrics = {"valid_loss": float(np.mean(losses)) if losses else float("nan")}
        if preds:
            p = np.concatenate(preds)
            t = np.concatenate(labels)
            metrics["valid_acc"] = float((p == t).mean())
            metrics["_pred"] = p
            metrics["_true"] = t
        return metrics

    def fit(self, state: TrainState, train_loader,
            valid_loader=None) -> TrainState:
        rng = jax.random.key(self.seed)
        for epoch in range(self.max_epochs):
            t0 = time.monotonic()
            train_losses = []
            n_samples = 0
            for batch in train_loader:
                batch = self.put_fn(batch)
                n_samples += int(jax.tree.leaves(batch)[0].shape[0])
                state, loss = self.train_step(state, batch, rng)
                train_losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(train_losses))) \
                if train_losses else float("nan")
            metrics: Dict[str, float] = {"train_loss": train_loss}

            if valid_loader is not None and \
                    (epoch + 1) % self.check_val_every_n_epoch == 0:
                eval_metrics = self._eval_epoch(state, valid_loader)
                metrics.update({k: v for k, v in eval_metrics.items()
                                if not k.startswith("_")})

            dt = time.monotonic() - t0
            metrics["samples_per_sec"] = n_samples / dt if dt > 0 else 0.0
            self.history.append(dict(metrics, epoch=epoch))
            if self.writer is not None:
                self.writer.log(
                    {k: v for k, v in metrics.items() if k != "samples_per_sec"},
                    step=epoch)
            if "on_epoch_end" in self.hooks:
                self.hooks["on_epoch_end"](epoch, state, metrics)
            if self.checkpointer is not None:
                self.checkpointer.save(epoch, state, metrics)

            if self.early_stopping is not None and epoch + 1 >= self.min_epochs:
                monitor_val = metrics.get(self.early_stopping.monitor)
                if monitor_val is not None and \
                        self.early_stopping.update(monitor_val):
                    break
        if self.checkpointer is not None:
            self.checkpointer.wait()
        return state


def fit(model, tx, state, train_loader, valid_loader=None, *, kind: str,
        buckets: int = 1, **fitter_kwargs) -> TrainState:
    """One-call convenience wrapper: build steps for ``kind`` and fit."""
    if kind == "multi":
        train_step, eval_step = make_multi_steps(model, tx, buckets)
    else:
        train_step, eval_step = make_classifier_steps(model, tx)
    fitter = Fitter(train_step, eval_step, **fitter_kwargs)
    return fitter.fit(state, train_loader, valid_loader)
