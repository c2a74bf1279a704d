"""Synthetic CytoSense-like dataset generator for tests and CPU smoke runs.

Produces the same on-disk layout as the reference's offline preprocessing
(reference: data/CytoSense/preprocess.py:78-84): grayscale JPEG crops with a
burned-in scale bar in the top 25 rows, per-particle 6-column profile CSVs,
and an ``annotations.csv`` with columns ``image, profile, class``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from PIL import Image

PROFILE_COLUMNS = ["FSC", "SSC", "Green", "Yellow", "Orange", "Red"]


def make_synthetic_dataset(root: Path | str, n_classes: int = 3,
                           n_per_class: int = 8, seed: int = 0,
                           image_size_range: tuple[int, int] = (80, 160),
                           profile_len_range: tuple[int, int] = (40, 400),
                           with_split: bool = True) -> Path:
    """Write a synthetic dataset under ``root`` and return the annotations dir.

    Each class is a distinct blob shape/brightness + profile frequency, so a
    model can actually learn to separate them in smoke tests.
    """
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    images, profiles, classes = [], [], []
    for c in range(n_classes):
        cls = f"genus_{c}"
        cls_dir = root / cls
        cls_dir.mkdir(exist_ok=True)
        for i in range(n_per_class):
            h = int(rng.integers(*image_size_range))
            w = int(rng.integers(*image_size_range))
            img = rng.normal(200, 5, size=(h, w))
            # class-dependent dark blob
            yy, xx = np.mgrid[0:h, 0:w]
            cy, cx = h // 2 + rng.integers(-5, 6), w // 2 + rng.integers(-5, 6)
            r = (min(h, w) // 4) * (1 + 0.3 * c)
            blob = ((yy - cy) ** 2 / (r ** 2) + (xx - cx) ** 2 /
                    ((r * (1 + 0.5 * c)) ** 2)) < 1.0
            img[blob] = 60 + 40 * c + rng.normal(0, 5, size=blob.sum())
            img[:25] = 255  # fake scale bar strip
            img[5:8, 5:30] = 0
            img = np.clip(img, 0, 255).astype(np.uint8)

            img_rel = f"{cls}/img_{i:04d}.jpg"
            Image.fromarray(img, mode="L").save(root / img_rel, quality=92)

            L = int(rng.integers(*profile_len_range))
            t = np.linspace(0, 1, L)
            freq = 2 + 3 * c
            base = (np.sin(2 * np.pi * freq * t) + 1.2) * (500 + 300 * c)
            prof = np.stack(
                [base * (1 + 0.1 * k) + rng.gamma(2.0, 20.0, size=L)
                 for k in range(6)], axis=1)
            prof = np.clip(prof, 1.0, None)
            prof_rel = f"{cls}/prof_{i:04d}.csv"
            pd.DataFrame(prof, columns=PROFILE_COLUMNS).to_csv(
                root / prof_rel, index=False)

            images.append(img_rel)
            profiles.append(prof_rel)
            classes.append(cls)

    annot = pd.DataFrame({"image": images, "profile": profiles, "class": classes})
    annot.to_csv(root / "annotations.csv", index=False)

    if with_split:
        split_dir = root / "split"
        split_dir.mkdir(exist_ok=True)
        train_rows, test_rows = [], []
        for cls, group in annot.groupby("class"):
            g = group.sample(frac=1.0, random_state=seed)
            k = max(1, len(g) // 2)
            train_rows.append(g.iloc[:k])
            test_rows.append(g.iloc[k:])
        train = pd.concat(train_rows).copy()
        test = pd.concat(test_rows).copy()
        for df in (train, test):
            df["image"] = "../" + df["image"]
            df["profile"] = "../" + df["profile"]
        train.to_csv(split_dir / "train.csv", index=False)
        test.to_csv(split_dir / "test.csv", index=False)
        return split_dir
    return root
