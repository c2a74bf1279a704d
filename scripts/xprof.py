#!/usr/bin/env python3
"""Capture a TPU trace of a flagship train step and print the per-op
device-time breakdown (no TensorBoard needed — parses the xplane with
jax.profiler.ProfileData).

Usage: python scripts/xprof.py [b0|vit] [--bs 256] [--steps 5] [--top 40]

Aggregates XLA op durations on the device plane by fusion name, so the
output answers "which fusions eat the step" — the data perf work must
start from (docs/PERF.md records the findings).
"""

import argparse
import glob
import re
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def _build(which, bs, fused=False):
    import jax
    from multimodal_plankton_recognition_tpu.config import OptimConfig
    from multimodal_plankton_recognition_tpu.models.flagships import (
        flagship_b0, flagship_vit, synthetic_batch_b0, synthetic_batch_vit,
    )
    from multimodal_plankton_recognition_tpu.train import (
        make_optimizer, create_train_state, make_multi_steps,
    )

    if which == "b0":
        model = flagship_b0()
        batch = synthetic_batch_b0(bs)
    else:
        model = flagship_vit(fused_attention=fused, fused_ffn=False)
        batch = synthetic_batch_vit(bs)

    tx = make_optimizer(OptimConfig(lr=5e-3, momentum=0.9,
                                    weight_decay=1e-3, nesterov=True))
    state = create_train_state(model, jax.random.key(0), batch, tx,
                               init_kwargs={"buckets": 16})
    train_step, _ = make_multi_steps(model, tx, buckets=16)
    return train_step, state, batch


_CLASS_RULES = (
    ("conv", "convolution"),
    ("fusion", "fusion"),
    ("dot", "dot/matmul"),
    ("dynamic-update-slice", "dyn-update-slice"),
    ("dynamic-slice", "dyn-slice"),
    ("reduce-window", "reduce-window"),
    ("reduce", "reduce"),
    ("all-reduce", "all-reduce"),
    ("copy", "copy/transpose"),
    ("transpose", "copy/transpose"),
    ("custom-call", "custom-call"),
    ("select-and-scatter", "select-and-scatter"),
)


def _classify(name: str) -> str:
    base = name.split(".")[0].rstrip("0123456789")
    for sub, label in _CLASS_RULES:
        if sub in base:
            return label
    return base or name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="b0", choices=["b0", "vit"])
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--fused", action="store_true",
                    help="enable the fused attention kernels (vit)")
    args = ap.parse_args()

    import jax
    from multimodal_plankton_recognition_tpu import (
        enable_compilation_cache, use_fast_prng, use_tpu_runtime_flags,
    )
    use_tpu_runtime_flags()
    enable_compilation_cache()
    use_fast_prng()

    train_step, state, batch = _build(args.which, args.bs, args.fused)
    rng = jax.random.key(1)
    state, loss = train_step(state, batch, rng)  # compile + warm
    float(loss)

    tmp = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmp):
        for i in range(args.steps):
            state, loss = train_step(state, batch,
                                     jax.random.fold_in(rng, i))
        float(loss)

    paths = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    if not paths:
        print(f"no xplane under {tmp}")
        return
    data = jax.profiler.ProfileData.from_serialized_xspace(
        Path(paths[0]).read_bytes())
    per_op = defaultdict(float)
    device_total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            # XLA Ops line carries per-op device durations
            if line.name not in ("XLA Ops", "XLA Modules", "Steps") \
                    and "XLA Ops" not in line.name:
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # ms
                per_op[ev.name] += dur
                device_total += dur

    print(f"== {args.which} bs={args.bs}: device op time over "
          f"{args.steps} steps (total {device_total:.1f} ms, "
          f"{device_total / args.steps:.2f} ms/step) ==")
    by_class = defaultdict(float)
    for name, ms in per_op.items():
        by_class[_classify(name)] += ms
    for cls, ms in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {cls:24s} {ms / args.steps:8.3f} ms/step "
              f"({100 * ms / device_total:5.1f}%)")
    print(f"\n== top {args.top} individual ops (ms/step) ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms / args.steps:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
