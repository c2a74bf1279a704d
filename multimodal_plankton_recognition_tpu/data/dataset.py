"""Multimodal dataset: one (image, pulse-shape profile, class) triple per row.

Reimplements the reference's ``MultiSet`` (reference: src/data.py:19-59) as a
plain indexable host-side dataset returning numpy. The file contracts are
identical: an ``annotations.csv`` / ``train.csv`` / ``test.csv`` table with
columns ``image, profile, class`` whose paths resolve relative to the table's
directory.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np
import pandas as pd
from .profile_io import load_image, load_profile_csv


class MultiSet:
    """Indexable multimodal dataset.

    Each item is a dict with keys:
      * ``image``          — transformed image, float32 (H, W, 1)
      * ``profile``        — transformed profile, float32 (L, D)
      * ``label``          — class name (str)
      * ``image_shape``    — original (height, width) before transforms, int32 (2,)
      * ``profile_length`` — original profile length, int32 (1,)
    """

    def __init__(self, annotation_path: Path | str,
                 image_transforms: Callable,
                 profile_transform: Callable,
                 pair_augmentation: Optional[Callable] = None) -> None:
        annotation_path = Path(annotation_path)
        self.parent = annotation_path.parent
        self.table = pd.read_csv(annotation_path)
        if "class" not in self.table.columns:
            # label-less inference table (serving-side): synthesize the
            # reference's 'unknown' placeholder label (the convention of its
            # unlabeled corpus, reference: CS_103_Uto2024/preprocess.py:75)
            self.table = self.table.assign(**{"class": "unknown"})
        self.class_names = np.unique(self.table["class"])
        self.image_transforms = image_transforms
        self.profile_transform = profile_transform
        self.pair_augmentation = pair_augmentation

    def __len__(self) -> int:
        return len(self.table)

    def __getitem__(self, index: int,
                    rng: Optional[np.random.Generator] = None) -> Dict:
        image = load_image(self.parent / self.table["image"].iloc[index])
        profile = load_profile_csv(self.parent / self.table["profile"].iloc[index])

        # original (height, width), as torch `image.size[::-1]` (src/data.py:46)
        image_shape = np.array([image.height, image.width], dtype=np.int32)
        profile_length = np.array([profile.shape[0]], dtype=np.int32)

        image = self.image_transforms(image, rng)
        profile = self.profile_transform(profile, rng)

        label = self.table["class"].iloc[index]

        if self.pair_augmentation:
            image, profile = self.pair_augmentation(image, profile, rng)

        return {
            "image": image,
            "profile": profile,
            "label": label,
            "image_shape": image_shape,
            "profile_length": profile_length,
        }
