#!/usr/bin/env python3
"""Materialize the packed input cache for a dataset's split CSVs.

The packed cache stores the deterministic prefix of the train/eval
transforms (decoded + canonically resized uint8 images, resampled float32
profiles) so train-time workers replay only the cheap random suffix —
see multimodal_plankton_recognition_tpu/data/packed.py. Enable with
``packed_cache: true`` in the model card.

Usage:
    python scripts/pack_dataset.py -d <dataset_dir> -t 224 \
        [--splits train.csv test.csv]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multimodal_plankton_recognition_tpu.data.packed import pack_split


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--dataset", required=True,
                   help="Dataset directory holding the split CSVs.")
    p.add_argument("-t", "--target-size", type=int, default=224,
                   help="Card target_size the cache is built for.")
    p.add_argument("--splits", nargs="*", default=["train.csv", "test.csv"],
                   help="Split CSVs to pack (default: train.csv test.csv).")
    args = p.parse_args()
    root = Path(args.dataset)
    for split in args.splits:
        csv = root / split
        if not csv.exists():
            print(f"skip {csv}: not found")
            continue
        t0 = time.perf_counter()
        out = pack_split(csv, args.target_size)
        n = sum(f.stat().st_size for f in out.iterdir())
        print(f"packed {csv} -> {out} "
              f"({n / 1e6:.1f} MB, {time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()
