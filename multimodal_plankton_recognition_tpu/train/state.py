"""Train state: parameters + mutable collections + optimizer state."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any           # BatchNorm running statistics ({} when unused)
    opt_state: Any

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, rng: jax.Array, sample_batch: Dict[str, Any],
                       tx: optax.GradientTransformation,
                       init_kwargs: Optional[Dict[str, Any]] = None
                       ) -> TrainState:
    """Initialize parameters from a sample batch and wrap them in a
    TrainState. ``init_kwargs`` carries static call kwargs (e.g. buckets)."""
    variables = model.init(rng, **sample_batch, **(init_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(step=0, params=params, batch_stats=batch_stats,
                      opt_state=opt_state)
