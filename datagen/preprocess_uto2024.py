#!/usr/bin/env python3
"""Offline preparation of the large unlabeled CS_103_Uto2024 corpus.

Pandas reimplementation of the reference's polars pipeline
(reference: data/CS_pulse-shape_data_forLUT/CS_103_Uto2024/preprocess.py):
per-export CSVs hold many particles keyed by 'Particle ID'; every particle
gets its own positive-row 6-channel CSV under a directory named after the
export, images are matched by (timestamp tokens, sample key, particle id),
and everything is labeled class ``'unknown'`` — this is the contrastive
pretraining corpus, not a classification set.
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from pathlib import Path

import numpy as np
import pandas as pd

CHANNELS_IN = ["FWS", "SWS", "FL Green", "FL Yellow", "Fl Orange", "FL Red"]
CHANNELS_OUT = ["FSC", "SSC", "Green", "Yellow", "Orange", "Red"]


def extract_img_key(file: str):
    keys = file.rsplit("/", 1)[-1][:-4].split(" ", 2)
    sample_type = keys[-1].split("_")
    return tuple(keys[:-1] + [sample_type[0], sample_type[-1]])


def extract_profiles(file: str) -> dict:
    new_path = file[:-4]
    os.makedirs(new_path, exist_ok=True)
    name = file.rsplit("/", 1)[-1]
    keys = name[:-4].split(" ", 2)
    sample_type = keys[-1].split("_", 1)
    key = tuple(keys[:-1] + [sample_type[0]])

    df = pd.read_csv(file, na_values=["NA"],
                     dtype={"Particle ID": np.int64,
                            **{c: np.float32 for c in CHANNELS_IN}})
    df = df[df["Particle ID"] > 0]

    out = {}
    for pid, group in df.groupby("Particle ID", sort=True):
        profile = group[CHANNELS_IN].copy()
        profile.columns = CHANNELS_OUT
        profile = profile[(profile > 0).all(axis=1)]
        dest = f"{new_path}/{key[0]} {key[1]} {key[2]}_Pulse_{pid}.csv"
        profile.to_csv(dest, index=False)
        out[key + (str(pid),)] = dest
    return out


def main(root: Path) -> None:
    os.chdir(root)
    profile_files = sorted(glob("./*/*.csv"))
    image_files = sorted(glob("./**/*.jpg", recursive=True))

    images = dict(zip(map(extract_img_key, image_files), image_files))
    profiles: dict = {}
    for file in profile_files:
        profiles.update(extract_profiles(file))

    keys = sorted(set(images) & set(profiles))
    pd.DataFrame({
        "image": [images[k] for k in keys],
        "profile": [profiles[k] for k in keys],
        "class": ["unknown"] * len(keys),
    }).to_csv("./annotations.csv", index=False)
    print(f"matched {len(keys)} image/profile pairs -> annotations.csv")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=".", help="dataset directory")
    main(Path(parser.parse_args().root))
