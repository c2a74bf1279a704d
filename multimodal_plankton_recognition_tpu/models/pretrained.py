"""Pretrained-weight loading from npz checkpoints.

The reference hard-codes ``pretrained=True`` into ``timm.create_model``
(reference: src/image_encoder.py:16-17), pulling ImageNet weights from the
timm hub. This framework has no timm dependency; instead, weights exported
to an npz (keys = '/'-joined Flax param paths, e.g.
``image_encoder/backbone/stem_conv/kernel``) are merged into a freshly
initialized parameter tree. A converter from timm state_dicts can produce
such npz files offline; absent one, models train from scratch (documented
accuracy-parity risk, SURVEY section 7).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

def flatten_params(params: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, path))
        else:
            out[path] = v
    return out


def unflatten_params(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_params_npz(params: Dict[str, Any], path: str | Path) -> None:
    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    np.savez(path, **flat)


def load_pretrained_npz(params: Dict[str, Any], path: str | Path,
                        strict: bool = False, batch_stats=None
                        ) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Merge npz weights into ``params`` by path; shape-mismatched or
    unknown keys are skipped (reported in the stats dict) unless ``strict``.

    npz keys may carry a collection namespace: ``params/<path>`` merges into
    ``params``, ``batch_stats/<path>`` into ``batch_stats`` (BatchNorm
    running statistics, produced by the timm converter); bare keys are
    treated as params for backward compatibility.

    Returns ``(merged_params, stats)``, or
    ``(merged_params, merged_batch_stats, stats)`` when ``batch_stats`` is
    given. stats keys: loaded / skipped / missing.
    """
    flat = flatten_params(params)
    flat_bs = flatten_params(batch_stats or {})
    npz = np.load(path)
    loaded = skipped = 0
    for key in npz.files:
        target, k = flat, key
        if key.startswith("params/"):
            k = key[len("params/"):]
        elif key.startswith("batch_stats/"):
            target, k = flat_bs, key[len("batch_stats/"):]
            if batch_stats is None:  # caller tracks no running stats
                skipped += 1
                continue
        if k in target and target[k].shape == npz[key].shape:
            target[k] = npz[key].astype(np.asarray(target[k]).dtype)
            loaded += 1
        else:
            if strict:
                raise KeyError(
                    f"npz key {key!r} "
                    + ("missing from model"
                       if k not in target else
                       f"shape {npz[key].shape} != {target[k].shape}"))
            skipped += 1
    missing = len(flat) + len(flat_bs) - loaded
    stats = {"loaded": loaded, "skipped": skipped, "missing": missing}
    if batch_stats is not None:
        return unflatten_params(flat), unflatten_params(flat_bs), stats
    return unflatten_params(flat), stats
