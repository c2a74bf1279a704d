"""Offline preprocessing tests (reference: data/*/preprocess.py pipelines)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


def _write_jpg(path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.full((40, 40), 128, np.uint8), mode="L").save(path)


def test_preprocess_cytosense(tmp_path):
    root = tmp_path
    # images: <class>/<Sample>_<ID>_Cropped_With_Scalebar.jpg
    _write_jpg(root / "diatom" / "sampleA_1_Cropped_With_Scalebar.jpg")
    _write_jpg(root / "ciliate" / "sampleA_2_Cropped_With_Scalebar.jpg")
    # bulk export: space-separated with Sample + ID + 6 channels
    rows = []
    for pid, n in [(1, 5), (2, 7), (3, 4)]:  # particle 3 has no image
        for _ in range(n):
            rows.append({"Sample": "sampleA", "ID": pid,
                         "FWS": 10.0, "SWS": 20.0, "FL.Green": 1.0,
                         "FL.Yellow": 2.0, "FL.Orange": 3.0, "FL.Red": 4.0})
    rows.append({"Sample": "sampleA", "ID": 1, "FWS": -1.0, "SWS": 20.0,
                 "FL.Green": 1.0, "FL.Yellow": 2.0, "FL.Orange": 3.0,
                 "FL.Red": 4.0})  # non-positive row, dropped from profile
    df = pd.DataFrame(rows)
    df.to_csv(root / "PDexp_Micro_phyto_pulse-shapes.txt", sep=" ",
              index=False)

    subprocess.run([sys.executable,
                    str(REPO / "datagen" / "preprocess_cytosense.py"),
                    "--root", str(root)], check=True)

    annot = pd.read_csv(root / "annotations.csv")
    assert len(annot) == 2  # particle 3 had no image
    assert set(annot["class"]) == {"diatom", "ciliate"}
    prof = pd.read_csv(root / annot["profile"].iloc[0])
    assert list(prof.columns) == ["FSC", "SSC", "Green", "Yellow",
                                  "Orange", "Red"]
    # particle 1: 5 positive rows (the negative one dropped)
    p1 = annot[annot["image"].str.contains("_1_")]["profile"].iloc[0]
    assert len(pd.read_csv(root / p1)) == 5


def test_preprocess_fastvision(tmp_path):
    root = tmp_path
    rows = []
    for sp, fid, n in [("alga", "img_A_Cropped_With_Scalebar", 6),
                       ("alga", "img_B_Cropped_With_Scalebar", 3),
                       ("diatom", "img_C_Cropped_With_Scalebar", 4)]:
        for _ in range(n):
            rows.append({"sp": sp, "file_id": fid, "FWS": 5.0, "SWS": 6.0,
                         "FL.Green": 1.0, "FL.Yellow": 2.0,
                         "FL.Orange": 3.0, "FL.Red": 4.0})
    pd.DataFrame(rows).to_csv(
        root / "Pulse-shapes_CS_images_FastVISION-plus_exp22.csv",
        index=False)

    subprocess.run([sys.executable,
                    str(REPO / "datagen" / "preprocess_fastvision.py"),
                    "--root", str(root)], check=True)

    annot = pd.read_csv(root / "annotations.csv")
    assert len(annot) == 3
    assert (root / annot["profile"].iloc[0]).exists()
    assert "Profile" in annot["profile"].iloc[0]
