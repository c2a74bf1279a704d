"""Optimizer construction.

The reference trains everything with ``torch.optim.SGD(lr, momentum,
weight_decay, nesterov)`` (reference: src/model.py:147-148). The optax chain
below reproduces torch SGD's update exactly:

  torch: g <- g + wd * p; b <- mu * b + g; step = g + mu * b (nesterov)
  optax: add_decayed_weights(wd) then sgd(momentum=mu, nesterov=True)

Gradient accumulation (Lightning ``accumulate_grad_batches``,
reference: model_cards/example_multi.yaml:43) maps to ``optax.MultiSteps``.
"""

from __future__ import annotations

import optax

from ..config import OptimConfig


def make_optimizer(cfg: OptimConfig,
                   accumulate_grad_batches: int = 1) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay
        else optax.identity(),
        optax.sgd(learning_rate=cfg.lr, momentum=cfg.momentum or None,
                  nesterov=cfg.nesterov),
    )
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx
