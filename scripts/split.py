#!/usr/bin/env python3
"""Single train/test split by per-class train size.

Same CLI and file contract as the reference (reference: scripts/split.py):
    split.py -d DIR [-s SEED] [-n NAME] [-t TRAINSIZE] [-m MINSIZE]
writes ``DIR/NAME/{train,test}.csv`` with image/profile paths prefixed by
``../`` per directory level so they resolve from the split subdir.
"""

import argparse
from pathlib import Path

import numpy as np
import pandas as pd


def split_dataset(dataset: str, name: str = "split", trainsize: int = 16,
                  minsize: int = 32, seed: int | None = None) -> int:
    data_dir = Path(dataset)
    annotations = pd.read_csv(data_dir / "annotations.csv")
    rng = np.random.default_rng(seed)

    class_names, counts = np.unique(annotations["class"], return_counts=True)
    train_parts, test_parts = [], []
    for cls, count in zip(class_names, counts):
        if count < minsize:
            continue
        annot = annotations[annotations["class"] == cls]
        order = rng.permutation(len(annot))
        train_parts.append(annot.iloc[order[:trainsize]])
        test_parts.append(annot.iloc[order[trainsize:]])

    train = pd.concat(train_parts) if train_parts else annotations.iloc[:0]
    test = pd.concat(test_parts) if test_parts else annotations.iloc[:0]

    annot_dir = data_dir / name
    annot_dir.mkdir(parents=True, exist_ok=True)
    stepback = name.count("/") + 1
    for df in (train, test):
        df.loc[:, ["image", "profile"]] = df[["image", "profile"]].apply(
            lambda col: "../" * stepback + col)
    train.to_csv(annot_dir / "train.csv")
    test.to_csv(annot_dir / "test.csv")

    n = int((counts >= minsize).sum())
    print(f"Dataset of {n} classes created to annotation\n"
          f"files {data_dir}/{name}/[train/test].csv.")
    return n


if __name__ == "__main__":
    pd.options.mode.chained_assignment = None
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset",
                        help="Dataset, location of annotation file.")
    parser.add_argument("-s", "--seed", type=int, default=None,
                        help="Seed for reproducibility")
    parser.add_argument("-n", "--name", default="split",
                        help="Annotation table name: [name]/[train/test].csv.")
    parser.add_argument("-t", "--trainsize", type=int, default=16,
                        help="Number of samples of each class in train set.")
    parser.add_argument("-m", "--minsize", type=int, default=32,
                        help="Minimum size to not be omitted from the dataset.")
    a = parser.parse_args()
    split_dataset(a.dataset, a.name, a.trainsize, a.minsize, a.seed)
