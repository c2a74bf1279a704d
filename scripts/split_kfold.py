#!/usr/bin/env python3
"""Stratified k-fold splits.

Same CLI and file contract as the reference (reference: scripts/split_kfold.py):
    split_kfold.py -d DIR [-s SEED] [-k K] [-n NAME]
writes ``DIR/NAME{1..K}/{train,test}.csv``.
"""

import argparse
from pathlib import Path

import pandas as pd
from sklearn.model_selection import StratifiedKFold


def split_kfold(dataset: str, name: str = "split", kfolds: int = 5,
                seed: int | None = None) -> None:
    data_dir = Path(dataset)
    annot = pd.read_csv(data_dir / "annotations.csv")

    kfold = StratifiedKFold(n_splits=kfolds, shuffle=True, random_state=seed)
    for k, (train, test) in enumerate(
            kfold.split(annot, annot["class"]), 1):
        annot_dir = data_dir / f"{name}{k}"
        annot_dir.mkdir(parents=True, exist_ok=True)
        train_annot = annot.iloc[train].copy()
        test_annot = annot.iloc[test].copy()
        stepback = name.count("/") + 1
        for df in (train_annot, test_annot):
            df.loc[:, ["image", "profile"]] = df[["image", "profile"]].apply(
                lambda col: "../" * stepback + col)
        test_annot.to_csv(annot_dir / "test.csv")
        train_annot.to_csv(annot_dir / "train.csv")

    print(f"Dataset folds created to annotation\n"
          f"files {name}[1-{kfolds}]/[train/test].csv.")


if __name__ == "__main__":
    pd.options.mode.chained_assignment = None
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset",
                        help="Dataset, location of annotation file and "
                             "directories images/ and profiles/")
    parser.add_argument("-s", "--seed", type=int, default=None)
    parser.add_argument("-k", "--kfolds", type=int, default=5,
                        help="Number of folds. Must be at least 2.")
    parser.add_argument("-n", "--name", default="split",
                        help="Annotation table name: [name][k]/[train/test].csv.")
    a = parser.parse_args()
    split_kfold(a.dataset, a.name, a.kfolds, a.seed)
