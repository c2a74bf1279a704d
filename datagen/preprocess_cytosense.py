#!/usr/bin/env python3
"""Offline preparation of multimodal CytoSense "sea" data.

Pandas reimplementation of the reference's polars pipeline
(reference: data/CytoSense/preprocess.py): read the bulk space-separated
pulse-shape exports, group rows per particle (ID, Sample), write one
6-column per-particle CSV (rows where all channels are > 0), and build
``annotations.csv`` mapping image <-> profile <-> class.

Run inside the dataset directory:
    python preprocess_cytosense.py [--root DIR]
Expects ``<class>/..._Cropped_With_Scalebar.jpg`` image crops and the two
bulk files ``PDexp_Micro_phyto_pulse-shapes.txt`` / ``Uto_2020_pulse-shapes.txt``.
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

import numpy as np
import pandas as pd

CHANNELS_IN = ["FWS", "SWS", "FL.Green", "FL.Yellow", "FL.Orange", "FL.Red"]
CHANNELS_OUT = ["FSC", "SSC", "Green", "Yellow", "Orange", "Red"]
BULK_FILES = ["PDexp_Micro_phyto_pulse-shapes.txt", "Uto_2020_pulse-shapes.txt"]


def build_image_lookup(root: Path) -> dict:
    lookup = {}
    for path in glob.glob(str(root / "**" / "*.jpg"), recursive=True):
        file = str(Path(path).relative_to(root))
        key = file.rsplit("/", 1)[-1].replace(
            "_Cropped_With_Scalebar", "")[:-4]
        lookup[key] = {"class": file.split("/", 1)[0], "image": file}
    return lookup


def main(root: Path) -> None:
    lookup = build_image_lookup(root)

    frames = []
    for bulk in BULK_FILES:
        bulk_path = root / bulk
        if not bulk_path.exists():
            print(f"warning: {bulk_path} missing, skipping")
            continue
        df = pd.read_csv(bulk_path, sep=" ", na_values=["NA"],
                         dtype={c: np.float32 for c in CHANNELS_IN})
        frames.append(df)
    if not frames:
        raise SystemExit("no bulk pulse-shape files found")
    df = pd.concat(frames, ignore_index=True).dropna()
    df = df[df["ID"] > 0]
    df["_key"] = df["Sample"].astype(str) + "_" + df["ID"].astype(int).astype(str)
    df = df[df["_key"].isin(lookup)]

    imgs, profs, classes = [], [], []
    for key, group in df.groupby("_key", sort=True):
        img_path = lookup[key]["image"]
        prof_path = img_path.replace("Cropped_With_Scalebar", "Profile") \
                            .replace("jpg", "csv")
        imgs.append(img_path)
        profs.append(prof_path)
        classes.append(lookup[key]["class"])
        profile = group[CHANNELS_IN].copy()
        profile.columns = CHANNELS_OUT
        profile = profile[(profile > 0).all(axis=1)]
        profile.to_csv(root / prof_path, index=False)

    pd.DataFrame({"image": imgs, "profile": profs, "class": classes}) \
        .sort_values(["class", "image"]) \
        .to_csv(root / "annotations.csv", index=False)
    print(f"wrote {len(imgs)} particle profiles + annotations.csv")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=".", help="dataset directory")
    main(Path(parser.parse_args().root))
