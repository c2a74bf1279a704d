"""Orbax checkpointing with top-k retention + one-call restore.

Reproduces the reference's Lightning ``ModelCheckpoint`` behavior
(reference: scripts/train_multi.py:89-94: keep ``save_top_k`` checkpoints by
the monitored metric) and its ``load_from_checkpoint`` one-call UX
(reference: experiments.ipynb cell 4): the model card and class vocabulary
are stored as JSON metadata next to the checkpoints, so
``load_from_checkpoint(dir)`` rebuilds the model and restores the best step
without external state.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

from ..config import ModelCard

METADATA_FILE = "plankton_metadata.json"


def _restore_host(directory: Path | str, step: int) -> Dict[str, Any]:
    """Device-agnostic restore: read the checkpoint tree as host numpy.

    A checkpoint saved in a process with different devices (CPU-saved
    checkpoint opened on a TPU host, or vice versa) records shardings
    whose devices do not exist here; orbax's default restore then fails
    with ``Device TFRT_CPU_0 was not found in jax.local_devices()``.
    Restoring every leaf as ``np.ndarray`` sidesteps device placement
    entirely — callers jit/shard the arrays on first use. Used whenever no
    template with concrete shardings is provided.
    """
    import jax

    path = Path(directory) / str(step) / "default"
    if not path.exists():
        # coupled to orbax's CheckpointManager on-disk layout
        # (<dir>/<step>/default); fail loudly if a future orbax changes it
        # rather than producing a confusing metadata error downstream
        step_dir = Path(directory) / str(step)
        raise FileNotFoundError(
            f"orbax item dir {path} not found; step dir contains "
            f"{sorted(p.name for p in step_dir.iterdir()) if step_dir.exists() else 'nothing'} "
            "— the installed orbax may use a different on-disk layout than "
            "the pinned version this restore path was written against")
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), dict(tree))
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


class CheckpointManager:
    def __init__(self, directory: Path | str, monitor: str = "valid_loss",
                 mode: str = "min", save_top_k: int = 1,
                 metadata: Optional[Dict[str, Any]] = None) -> None:
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        # Lightning ModelCheckpoint semantics (reference
        # scripts/train_multi.py:89-94): save_top_k=0 -> save nothing,
        # save_top_k=-1 -> keep every checkpoint, k>0 -> keep best k.
        self._disabled = save_top_k == 0
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if save_top_k < 0 else max(1, save_top_k),
            best_fn=(lambda m: m[monitor]) if save_top_k > 0 else None,
            best_mode=mode,
        )
        self._mngr = ocp.CheckpointManager(self.directory, options=options)
        if metadata is not None:
            # record the monitored metric so a fresh manager (restore time)
            # can rank checkpoints with the same best_fn
            metadata = dict(metadata, _monitor=monitor, _mode=mode)
            with open(self.directory / METADATA_FILE, "w") as f:
                json.dump(metadata, f, indent=2, default=str)

    def save(self, epoch: int, state, metrics: Dict[str, float]) -> bool:
        """Save iff the monitored metric was produced this epoch and is
        finite (orbax best_fn cannot rank NaN)."""
        if self._disabled:  # save_top_k=0: save nothing (Lightning parity)
            return False
        value = metrics.get(self.monitor)
        if value is None or not np.isfinite(value):
            return False
        payload = {
            "step": int(state.step),
            "params": state.params,
            "batch_stats": state.batch_stats or {},
            "opt_state": state.opt_state,
        }
        return self._mngr.save(
            epoch, args=ocp.args.StandardSave(payload),
            metrics={self.monitor: float(value)})

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def restore(self, step: Optional[int] = None,
                template: Optional[Any] = None) -> Dict[str, Any]:
        if step is None:
            step = self._mngr.best_step()
        if step is None:  # no best_fn metrics recorded: fall back to latest
            steps = self._mngr.all_steps()
            step = max(steps) if steps else None
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        if template is not None:
            return self._mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        return _restore_host(self.directory, step)

    def close(self) -> None:
        self._mngr.close()


def read_metadata(directory: Path | str) -> Dict[str, Any]:
    with open(Path(directory) / METADATA_FILE) as f:
        return json.load(f)


def load_from_checkpoint(directory: Path | str,
                         step: Optional[int] = None
                         ) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """Rebuild the model from stored metadata and restore parameters.

    Returns ``(model, variables, metadata)`` where ``variables`` has
    ``params`` (+ ``batch_stats`` when present) ready for ``model.apply``.
    """
    from ..models import build as build_mod

    directory = Path(directory).resolve()
    meta = read_metadata(directory)
    card = ModelCard.from_dict(meta["card"])
    kind = meta.get("kind", "multi")
    if kind == "multi":
        model = build_mod.build_multi_model(card)
    elif kind == "image":
        model = build_mod.build_image_classifier(card, meta["class_names"])
    elif kind == "profile":
        model = build_mod.build_profile_classifier(card, meta["class_names"])
    else:  # pragma: no cover
        raise ValueError(f"Unknown checkpoint kind {kind!r}")

    # reconstruct the best_fn from the recorded monitor so best_step() ranks
    # by the monitored metric, not recency (a bare manager has no best_fn
    # and would silently return the latest kept checkpoint)
    monitor = meta.get("_monitor")
    options = ocp.CheckpointManagerOptions(
        best_fn=(lambda m: m[monitor]) if monitor else None,
        best_mode=meta.get("_mode", "min"),
    ) if monitor else None
    mngr = ocp.CheckpointManager(directory, options=options)
    step = step if step is not None else mngr.best_step()
    if step is None:
        steps = mngr.all_steps()
        if not steps:
            raise FileNotFoundError(f"No checkpoints in {directory}")
        step = max(steps)
    mngr.close()
    restored = _restore_host(directory, step)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    return model, variables, meta
