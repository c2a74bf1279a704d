"""Packed input cache: decode/resize/resample once, memmap at train time.

The CSV path re-decodes every JPEG and re-parses every profile CSV each
epoch (reference does the same, src/data.py:40-59) — ~2.5 ms/sample of
deterministic work that dominates the host pipeline (docs/PERF.md: ~11
workers per chip to feed the B0 step). This module materializes the
deterministic prefix of each transform once on disk and replays only the
cheap random suffix per epoch:

* train images — the scale-bar crop + LANCZOS oversize resize output is a
  **uint8** array (the float scaling comes after), so the cache stores
  exactly those bytes: reconstruction ``arr/255*2-1`` is bit-identical to
  the CSV path, at a quarter of float32 bytes.
* train profiles — log1p → ceiling-normalize → resample-to-oversize float32.
* test images/profiles — the eval transforms are fully deterministic
  (resize/resample straight to ``target_size``), so the cache stores their
  complete output (images again as the pre-scaling uint8).

``PackedMultiSet`` is interface-compatible with ``MultiSet`` (same item
dict, same ``class_names``/``table``) and replays the random suffix with
the SAME draw order (image dy/dx/flip → profile crop+noise → pair flip),
so batches are bit-identical to the CSV path for the same per-sample RNG —
pinned by tests/test_packed.py.

Layout (one directory per split):
    <dataset>/packed_t<target>/<split>/
        images.npy    (N, S, S)  uint8   S = ceil(1.05*t) train, t test
        profiles.npy  (N, P, D)  float32 P = ceil(1.05*t) train, t test
        shapes.npy    (N, 2)     int32   original (height, width)
        lens.npy      (N, 1)     int32   original profile length
        labels.npy    (N,)       unicode class names
        meta.json     target_size / split / row count / source mtime guard

All arrays are loaded with ``np.load(mmap_mode="r")`` — the OS page cache
shares them across worker processes for free (GrainLoader workers inherit
the mapping, nothing is pickled).

Scope: the cache covers the contrastive-pretraining transform set (the
training hot path). The supervised-baseline drivers keep the CSV path:
their ``ImageTransforms`` canonicalization draws random background noise
per epoch (cover_scale/pad, reference src/data.py:62-70), so there is no
deterministic image prefix to materialize.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .transforms import (
    SCALEBAR_ROWS, ImageTransformOversize, ImageTransformTest,
    ProfileTransformOversize, ProfileTransformTest, resize_edge,
)

_FILES = ("images", "profiles", "shapes", "lens", "labels")


def _payload_fingerprint(table, parent: Path, k: int = 8):
    """(size, mtime_ns) of up to ``k`` image+profile payload files spread
    across the table — a cheap stale guard for payloads regenerated without
    touching the annotation CSV (the CSV's own mtime/rows are checked
    separately)."""
    n = len(table)
    idx = sorted({int(i) for i in np.linspace(0, n - 1, num=min(k, n))})
    fp = []
    for i in idx:
        for col in ("image", "profile"):
            st = (parent / table[col].iloc[i]).stat()
            fp.append([int(i), col, st.st_size, st.st_mtime_ns])
    return fp


def cache_dir(annotation_path: Path | str, target_size: int) -> Path:
    p = Path(annotation_path)
    return p.parent / f"packed_t{target_size}" / p.stem


def pack_split(annotation_path: Path | str, target_size: int,
               out_dir: Optional[Path] = None) -> Path:
    """Materialize the packed cache for one split CSV. The split kind is
    the file stem: ``train`` packs the oversize train prefix, anything else
    packs the deterministic eval output."""
    import pandas as pd

    from .profile_io import load_image, load_profile_csv

    annotation_path = Path(annotation_path)
    train = annotation_path.stem == "train"
    out = Path(out_dir) if out_dir else cache_dir(annotation_path,
                                                  target_size)
    out.mkdir(parents=True, exist_ok=True)
    table = pd.read_csv(annotation_path)
    parent = annotation_path.parent
    n = len(table)
    if n == 0:
        raise ValueError(
            f"{annotation_path} has no data rows — refusing to build an "
            f"empty packed cache (PackedMultiSet could not load it)")
    side = math.ceil(1.05 * target_size) if train else target_size

    prof_tf = (ProfileTransformOversize(target_size) if train
               else ProfileTransformTest(target_size))
    # pack-time oracle: the float path whose uint8 plane we store
    img_tf = (ImageTransformOversize(target_size) if train
              else ImageTransformTest(target_size))

    images = np.lib.format.open_memmap(
        out / "images.npy", mode="w+", dtype=np.uint8, shape=(n, side, side))
    profiles = None  # dtype/width fixed by the first sample
    shapes = np.zeros((n, 2), np.int32)
    lens = np.zeros((n, 1), np.int32)
    for i in range(n):
        img = load_image(parent / table["image"].iloc[i])
        shapes[i] = (img.height, img.width)
        # the shared uint8 prefix of both image transforms: grayscale,
        # scale-bar crop, LANCZOS+edge resize — the float tail
        # (arr/255*2-1) is replayed at load, bit-identically
        gray = img.convert("L")
        gray = gray.crop((0, SCALEBAR_ROWS, gray.width, gray.height))
        arr = resize_edge(gray, side)
        images[i] = arr
        if i < 4:  # self-check the stored plane against the float oracle
            recon = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
            np.testing.assert_array_equal(recon[..., None], img_tf(img))
        prof = load_profile_csv(parent / table["profile"].iloc[i])
        lens[i] = prof.shape[0]
        y = prof_tf(prof)
        if profiles is None:
            profiles = np.lib.format.open_memmap(
                out / "profiles.npy", mode="w+", dtype=np.float32,
                shape=(n,) + y.shape)
        profiles[i] = y
    images.flush()
    if profiles is not None:
        profiles.flush()
    np.save(out / "shapes.npy", shapes)
    np.save(out / "lens.npy", lens)
    np.save(out / "labels.npy",
            table["class"].to_numpy(dtype=np.str_))
    (out / "meta.json").write_text(json.dumps({
        "target_size": target_size, "train": train, "rows": n,
        "source": annotation_path.name,
        "source_mtime": annotation_path.stat().st_mtime,
        "payload_fingerprint": _payload_fingerprint(table, parent),
    }))
    return out


class PackedMultiSet:
    """Memmap-backed drop-in for ``MultiSet`` over a packed cache.

    ``device_augment=True`` returns the stored oversize prefix unchanged
    (the random crop/flip/noise runs on-device, ops/augment.py); otherwise
    the host random suffix replays the CSV path's exact draw order.
    """

    def __init__(self, annotation_path: Path | str, target_size: int,
                 device_augment: bool = False) -> None:
        import pandas as pd

        annotation_path = Path(annotation_path)
        self.train = annotation_path.stem == "train"
        self.target_size = target_size
        self.oversize = math.ceil(1.05 * target_size)
        self.device_augment = device_augment
        self._source_name = annotation_path.name
        root = cache_dir(annotation_path, target_size)
        meta_path = root / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(
                f"no packed cache at {root} — build it with "
                f"scripts/pack_dataset.py -d {annotation_path.parent} "
                f"-t {target_size}")
        meta = json.loads(meta_path.read_text())
        # MultiSet API parity (retrieval/encode.py reads .table)
        self.table = pd.read_csv(annotation_path)
        self.parent = annotation_path.parent
        if meta["source_mtime"] != annotation_path.stat().st_mtime \
                or meta["rows"] != len(self.table):
            raise RuntimeError(
                f"packed cache at {root} is stale (source csv changed) — "
                f"re-run scripts/pack_dataset.py")
        # payload files regenerated WITHOUT touching the csv (e.g. a rsync
        # of re-cropped jpegs) must also invalidate the cache
        want = meta.get("payload_fingerprint")
        if want is not None and \
                _payload_fingerprint(self.table, self.parent) != want:
            raise RuntimeError(
                f"packed cache at {root} is stale (image/profile payload "
                f"files changed since packing) — re-run "
                f"scripts/pack_dataset.py")
        self.images = np.load(root / "images.npy", mmap_mode="r")
        self.profiles = np.load(root / "profiles.npy", mmap_mode="r")
        self.shapes = np.load(root / "shapes.npy")
        self.lens = np.load(root / "lens.npy")
        self.labels = np.load(root / "labels.npy")
        self.class_names = np.unique(self.labels)

    # GrainLoader pickles the dataset into its worker processes — ship only
    # the constructor args and re-mmap there (a pickled memmap would
    # materialize the whole array into the IPC channel)
    def __getstate__(self):
        return {"annotation_path": str(self.parent / self._source_name),
                "target_size": self.target_size,
                "device_augment": self.device_augment}

    def __setstate__(self, state):
        self.__init__(state["annotation_path"], state["target_size"],
                      device_augment=state["device_augment"])

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, index: int,
                    rng: Optional[np.random.Generator] = None) -> Dict:
        from .transforms import _rng

        g = _rng(rng)
        arr = self.images[index]                       # uint8, memmap read
        prof = np.asarray(self.profiles[index])
        t = self.target_size
        if self.train and not self.device_augment:
            # EXACT draw order of the CSV path (tests/test_packed.py):
            # ImageTransformTrain: dy, dx, flip. Crop the uint8 plane
            # BEFORE the float scaling — elementwise, so bit-identical,
            # and skips the float work on the ~10% cropped away.
            dy = int(g.integers(0, arr.shape[0] - t + 1))
            dx = int(g.integers(0, arr.shape[1] - t + 1))
            x = arr[dy:dy + t, dx:dx + t].astype(np.float32) \
                / 255.0 * 2.0 - 1.0
            if g.integers(0, 2) == 0:
                x = x[::-1, :]
            x = np.ascontiguousarray(x)[..., None]
            # ProfileTransformTrain: crop start, additive noise
            start = int(g.integers(0, self.oversize - t + 1))
            prof = prof[start:start + t]
            prof = prof + 1e-3 * g.standard_normal(prof.shape).astype(
                np.float32)
            prof = prof.astype(np.float32)
            # PairAugmentation: joint hflip + time reversal
            if g.integers(0, 2) == 0:
                x = np.ascontiguousarray(x[:, ::-1])
                prof = np.ascontiguousarray(prof[::-1])
        else:
            x = (arr.astype(np.float32) / 255.0 * 2.0 - 1.0)[..., None]
        return {
            "image": x,
            "profile": prof,
            "label": str(self.labels[index]),
            "image_shape": self.shapes[index],
            "profile_length": self.lens[index],
        }
