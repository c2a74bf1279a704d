#!/usr/bin/env python3
"""Offline preparation of the FASTVISION-plus "lab" dataset.

Pandas reimplementation of the reference's polars pipeline
(reference: data/FASTVISION-plus/preprocess.py): one combined CSV holds all
pulse shapes keyed by (sp = species/class, file_id = image crop stem);
rows are grouped per particle, positive-only rows are written to
``<sp>/<file_id with Profile>.csv`` and annotations.csv maps the triples.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

CHANNELS_IN = ["FWS", "SWS", "FL.Green", "FL.Yellow", "FL.Orange", "FL.Red"]
CHANNELS_OUT = ["FSC", "SSC", "Green", "Yellow", "Orange", "Red"]
BULK_FILE = "Pulse-shapes_CS_images_FastVISION-plus_exp22.csv"


def main(root: Path) -> None:
    df = pd.read_csv(root / BULK_FILE, na_values=["NA"],
                     dtype={c: np.float32 for c in CHANNELS_IN})

    imgs, profs, classes = [], [], []
    for (sp, file_id), group in df.groupby(["sp", "file_id"], sort=True):
        prof_rel = Path(sp) / (
            str(file_id).replace("Cropped_With_Scalebar", "Profile") + ".csv")
        (root / prof_rel).parent.mkdir(parents=True, exist_ok=True)
        imgs.append(str(Path(sp) / f"{file_id}.jpg"))
        profs.append(str(prof_rel))
        classes.append(sp)
        profile = group[CHANNELS_IN].copy()
        profile.columns = CHANNELS_OUT
        profile = profile[(profile > 0).all(axis=1)]
        profile.to_csv(root / prof_rel, index=False)

    pd.DataFrame({"image": imgs, "profile": profs, "class": classes}) \
        .sort_values(["class", "image"]) \
        .to_csv(root / "annotations.csv", index=False)
    print(f"wrote {len(imgs)} particle profiles + annotations.csv")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=".", help="dataset directory")
    main(Path(parser.parse_args().root))
