#!/usr/bin/env python3
"""Honest host input-pipeline measurement (VERDICT r1 #7).

Measures, on THIS host:
  1. per-sample stage costs of the train-time transform chain — JPEG decode,
     image train transform, profile CSV parse (native C++ vs pure Python),
     profile train transform, tokenize+collate;
  2. end-to-end Loader (threads) and GrainLoader (processes) pairs/s at
     several worker counts;
and prints the extrapolation math: sustained pairs/s ~= workers /
per_sample_seconds (transform work is embarrassingly parallel across
samples; the GIL bounds the threaded loader, processes do not share it).

NOTE: this dev VM has 1 CPU, so absolute loader numbers here are a floor,
not a capability statement — record them together with the per-sample cost
so a multi-core deployment can be predicted. Results go in docs/PERF.md.

Usage: python scripts/input_probe.py [--samples N] [--target-size 224]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def _time_per(fn, items, reps=3):
    """Median seconds per item over reps sweeps."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for it in items:
            fn(it)
        times.append((time.perf_counter() - t0) / len(items))
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--target-size", type=int, default=224)
    ap.add_argument("--tmp", default="/tmp/input_probe_data")
    args = ap.parse_args()

    from PIL import Image

    from multimodal_plankton_recognition_tpu.data import (
        MultiSet, ImageTransformTrain, ProfileTransformTrain,
        PairAugmentation, Loader, tokenize,
    )
    from multimodal_plankton_recognition_tpu.data.grain_pipeline import (
        GrainLoader,
    )
    from multimodal_plankton_recognition_tpu.data.pipeline import (
        multi_collate_fn,
    )
    from multimodal_plankton_recognition_tpu.data.profile_io import (
        load_profile_csv, _parse_python, _load_native,
    )
    from multimodal_plankton_recognition_tpu.data.synthetic import (
        make_synthetic_dataset,
    )

    ts = args.target_size
    root = Path(args.tmp)
    if not (root / "annotations.csv").exists():
        # realistic raw sizes: CytoSense crops are a few hundred px, profiles
        # tens to thousands of rows (SURVEY section 6 dataset-scale note)
        make_synthetic_dataset(root, n_classes=4,
                               n_per_class=args.samples // 4, seed=3,
                               image_size_range=(150, 400),
                               profile_len_range=(60, 1200),
                               with_split=False)
    ds = MultiSet(root / "annotations.csv", ImageTransformTrain(ts),
                  ProfileTransformTrain(ts), PairAugmentation())
    n = min(len(ds), args.samples)
    rows = [(root / ds.table["image"].iloc[i],
             root / ds.table["profile"].iloc[i]) for i in range(n)]
    rng = np.random.default_rng(0)

    print(f"== per-sample stage costs (ms), n={n}, target_size={ts} ==")
    t_decode = _time_per(lambda r: np.asarray(
        Image.open(r[0]).convert("RGB")), rows)
    print(f"jpeg decode + to-array (PIL):  {t_decode * 1e3:7.2f}")
    from multimodal_plankton_recognition_tpu.data.profile_io import (
        _load_native, load_image,
    )
    if getattr(_load_native(), "decode_jpeg", None):
        t_native = _time_per(lambda r: np.asarray(
            load_image(r[0]).convert("RGB")), rows)
        print(f"jpeg decode + to-array (nativ):{t_native * 1e3:7.2f} "
              f"({t_decode / t_native:.2f}x)")

    imgs = [Image.open(r[0]) for r in rows]
    tf_img = ImageTransformTrain(ts)
    t_imgtf = _time_per(lambda im: tf_img(im, rng), imgs)
    print(f"image train transform:         {t_imgtf * 1e3:7.2f}")

    t_parse = _time_per(lambda r: load_profile_csv(r[1]), rows)
    native = "C++" if _load_native() else "python"
    print(f"profile csv parse ({native:6s}):    {t_parse * 1e3:7.2f}")
    texts = [Path(r[1]).read_text() for r in rows]
    t_parse_py = _time_per(_parse_python, texts)
    print(f"profile csv parse (python):    {t_parse_py * 1e3:7.2f}")

    profs = [load_profile_csv(r[1]) for r in rows]
    tf_prof = ProfileTransformTrain(ts)
    t_proftf = _time_per(lambda p: tf_prof(p, rng), profs)
    print(f"profile train transform:       {t_proftf * 1e3:7.2f}")

    tok = tokenize.get_tokenizer("cnn", ts, pad_to=ts)
    collate = multi_collate_fn(tok)
    t_item = _time_per(lambda i: ds.__getitem__(i, rng), range(n))
    print(f"full __getitem__:              {t_item * 1e3:7.2f}")
    samples = [ds.__getitem__(i, rng) for i in range(min(n, 32))]
    t_collate = _time_per(lambda _: collate(samples), range(4)) \
        / len(samples)
    print(f"collate+tokenize (per sample): {t_collate * 1e3:7.2f}")

    per_sample = t_item + t_collate
    print(f"-> one core sustains ~{1.0 / per_sample:,.0f} pairs/s; "
          f"W workers ~= W * that (process workers; threads cap at the GIL)")

    # ---- packed cache path (scripts/pack_dataset.py) ----------------------
    from multimodal_plankton_recognition_tpu.data.packed import (
        PackedMultiSet, pack_split,
    )
    ann = root / "annotations.csv"
    train_csv = root / "train.csv"
    if not train_csv.exists() or \
            train_csv.stat().st_mtime < ann.stat().st_mtime:
        train_csv.write_text(ann.read_text())
    import pandas as pd
    n_rows = len(pd.read_csv(train_csv))  # pack covers the WHOLE table,
    t0 = time.perf_counter()              # not just the n probed samples
    pack_split(train_csv, ts)
    t_pack = (time.perf_counter() - t0) / n_rows
    packed = PackedMultiSet(train_csv, ts)
    t_packed = _time_per(lambda i: packed.__getitem__(i, rng), range(n))
    print(f"\n== packed cache (bit-identical batches, "
          f"tests/test_packed.py) ==")
    print(f"one-off pack cost:             {t_pack * 1e3:7.2f} ms/sample")
    print(f"packed __getitem__:            {t_packed * 1e3:7.2f} ms "
          f"({t_item / t_packed:.1f}x the csv path)")
    per_packed = t_packed + t_collate
    print(f"-> one core sustains ~{1.0 / per_packed:,.0f} pairs/s packed "
          f"({per_sample / per_packed:.1f}x end-to-end per core)")

    print("\n== end-to-end loader pairs/s (THIS host) ==")
    bs = 32
    for label, cls, workers in (("threads", Loader, 1), ("threads", Loader, 4),
                                ("grain", GrainLoader, 1),
                                ("grain", GrainLoader, 2)):
        loader = cls(ds, bs, collate, shuffle=True, drop_last=True,
                     num_workers=workers, seed=0)
        it = iter(loader)
        next(it)  # warm (grain: spawn workers)
        t0 = time.perf_counter()
        got = bs
        for b in it:
            got += b["image"].shape[0]
        dt = time.perf_counter() - t0
        print(f"{label:8s} workers={workers}: {(got - bs) / dt:8,.0f} pairs/s")
        if hasattr(loader, "close"):
            loader.close()

    import multiprocessing
    print(f"\nhost cores: {multiprocessing.cpu_count()} "
          "(1-core dev VM numbers are a floor; see docstring)")


if __name__ == "__main__":
    main()
