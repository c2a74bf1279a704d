"""Packed input cache: bit-identity with the CSV path (VERDICT r2 #6).

The cache stores the deterministic transform prefix (uint8 canonical
images, resampled float32 profiles); these tests pin that the replayed
random suffix reproduces the CSV pipeline EXACTLY — same arrays, same
bytes — for train, eval, and device-augment modes, and that an actual
training run over the cache emits identical metrics.
"""

import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.data import (
    ImageTransformOversize, ImageTransformTest, ImageTransformTrain,
    MultiSet, PairAugmentation, ProfileTransformOversize,
    ProfileTransformTest, ProfileTransformTrain,
)
from multimodal_plankton_recognition_tpu.data.packed import (
    PackedMultiSet, pack_split,
)
from multimodal_plankton_recognition_tpu.data.synthetic import (
    make_synthetic_dataset,
)

TS = 32


@pytest.fixture(scope="module")
def packed_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed") / "data"
    make_synthetic_dataset(root, n_classes=3, n_per_class=6, seed=11,
                           with_split=False)
    # annotations.csv plays both roles: copy to the split names
    ann = (root / "annotations.csv").read_text()
    (root / "train.csv").write_text(ann)
    (root / "test.csv").write_text(ann)
    pack_split(root / "train.csv", TS)
    pack_split(root / "test.csv", TS)
    return root


def _pairs(a, b):
    assert a.keys() == b.keys()
    for k in a:
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        np.testing.assert_array_equal(av, bv, err_msg=k)


def test_train_items_bit_identical(packed_root):
    csv_set = MultiSet(packed_root / "train.csv", ImageTransformTrain(TS),
                       ProfileTransformTrain(TS), PairAugmentation())
    packed = PackedMultiSet(packed_root / "train.csv", TS)
    assert len(csv_set) == len(packed)
    for i in range(len(packed)):
        r1 = np.random.default_rng(1000 + i)
        r2 = np.random.default_rng(1000 + i)
        _pairs(csv_set.__getitem__(i, r1), packed.__getitem__(i, r2))


def test_eval_items_bit_identical(packed_root):
    csv_set = MultiSet(packed_root / "test.csv", ImageTransformTest(TS),
                       ProfileTransformTest(TS))
    packed = PackedMultiSet(packed_root / "test.csv", TS)
    for i in range(len(packed)):
        _pairs(csv_set.__getitem__(i, np.random.default_rng(0)),
               packed.__getitem__(i, np.random.default_rng(0)))


def test_device_augment_prefix_bit_identical(packed_root):
    csv_set = MultiSet(packed_root / "train.csv", ImageTransformOversize(TS),
                       ProfileTransformOversize(TS))
    packed = PackedMultiSet(packed_root / "train.csv", TS,
                            device_augment=True)
    for i in range(len(packed)):
        _pairs(csv_set.__getitem__(i, np.random.default_rng(0)),
               packed.__getitem__(i, np.random.default_rng(0)))


def test_class_names_and_stale_guard(packed_root):
    packed = PackedMultiSet(packed_root / "train.csv", TS)
    csv_set = MultiSet(packed_root / "train.csv", ImageTransformTest(TS),
                       ProfileTransformTest(TS))
    np.testing.assert_array_equal(packed.class_names, csv_set.class_names)
    # touching the source csv invalidates the cache
    p = packed_root / "train.csv"
    p.write_text(p.read_text() + "\n")
    with pytest.raises((RuntimeError, FileNotFoundError)):
        PackedMultiSet(p, TS)
    # restore for other tests (mtime changed -> repack)
    pack_split(p, TS)
    PackedMultiSet(p, TS)


def test_payload_stale_guard(packed_root):
    """Rewriting a payload file (same csv) must also invalidate the cache —
    the meta fingerprint samples image/profile sizes+mtimes."""
    import pandas as pd

    p = packed_root / "train.csv"
    table = pd.read_csv(p)
    img = packed_root / table["image"].iloc[0]
    original = img.read_bytes()
    try:
        img.write_bytes(original + b"\x00")  # size + mtime change
        with pytest.raises(RuntimeError, match="payload"):
            PackedMultiSet(p, TS)
    finally:
        img.write_bytes(original)
    # size restored but mtime_ns moved on — still flagged as stale
    with pytest.raises(RuntimeError, match="payload"):
        PackedMultiSet(p, TS)
    pack_split(p, TS)  # repack for any later test
    PackedMultiSet(p, TS)


def test_empty_split_refused(tmp_path):
    csv = tmp_path / "train.csv"
    csv.write_text("image,profile,class\n")
    with pytest.raises(ValueError, match="no data rows"):
        pack_split(csv, TS)


def test_pickle_roundtrip_remmaps(packed_root):
    """GrainLoader workers unpickle the dataset — the memmaps must be
    re-opened there, not serialized."""
    import pickle

    packed = PackedMultiSet(packed_root / "train.csv", TS)
    blob = pickle.dumps(packed)
    # the payload must be tiny (paths, not arrays)
    assert len(blob) < 4096, len(blob)
    clone = pickle.loads(blob)
    _pairs(packed.__getitem__(2, np.random.default_rng(3)),
           clone.__getitem__(2, np.random.default_rng(3)))


def test_grain_process_workers_over_packed(packed_root):
    """GrainLoader with REAL process workers over the packed cache yields
    batches bit-identical to the threaded Loader over the CSV path — the
    full unpickle→re-mmap→random-suffix chain in a worker process."""
    from multimodal_plankton_recognition_tpu.data.grain_pipeline import (
        GrainLoader,
    )
    from multimodal_plankton_recognition_tpu.data.pipeline import (
        Loader, multi_collate_fn,
    )
    from multimodal_plankton_recognition_tpu.data import tokenize

    csv_set = MultiSet(packed_root / "train.csv", ImageTransformTrain(TS),
                       ProfileTransformTrain(TS), PairAugmentation())
    packed = PackedMultiSet(packed_root / "train.csv", TS)
    collate = multi_collate_fn(tokenize.get_tokenizer("cnn", TS, pad_to=TS))
    l_csv = Loader(csv_set, 4, collate, shuffle=True, drop_last=True,
                   num_workers=1, seed=21)
    l_packed = GrainLoader(packed, 4, collate, shuffle=True, drop_last=True,
                           num_workers=2, seed=21)
    n = 0
    for b1, b2 in zip(l_csv, l_packed):
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["profile"], b2["profile"])
        n += 1
    assert n > 0


def test_missing_cache_error_names_the_script(tmp_path):
    root = tmp_path / "d"
    make_synthetic_dataset(root, n_classes=2, n_per_class=3, seed=1,
                           with_split=False)
    (root / "train.csv").write_text((root / "annotations.csv").read_text())
    with pytest.raises(FileNotFoundError, match="pack_dataset"):
        PackedMultiSet(root / "train.csv", TS)


@pytest.mark.slow
def test_packed_training_metrics_identical(tmp_path):
    """Same card trained over the CSV path and the packed cache produces
    byte-identical metrics — the end-to-end proof of bit-identity."""
    import json

    import yaml

    from multimodal_plankton_recognition_tpu.train.drivers import train_multi

    base = tmp_path / "data"
    make_synthetic_dataset(base, n_classes=3, n_per_class=6, seed=5,
                           with_split=True)
    root = base / "split"
    card = {
        "bs": 4, "dim_embedding": 16, "target_size": TS, "buckets": 2,
        "num_workers": 2, "patience": 99, "save_top_k": 1, "seed": 0,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                                 "blocks": [1, 1, 1, 1],
                                 "base_channels": 8},
        "coordination_args": {"method": "clip"},
        "optim_args": {"lr": 1e-2, "momentum": 0.9},
        "trainer_args": {"precision": "32", "min_epochs": 2,
                         "max_epochs": 2},
    }
    results = {}
    for packed in (False, True):
        if packed:
            pack_split(root / "train.csv", TS)
            pack_split(root / "test.csv", TS)
        card["packed_cache"] = packed
        card_path = tmp_path / f"card_{packed}.yaml"
        card_path.write_text(yaml.safe_dump(card))
        out = train_multi(root, card_path,
                          logdir=tmp_path / f"logs_{packed}")
        metrics = [json.loads(line) for line in
                   open(f"{out['logdir']}/metrics.jsonl")]
        results[packed] = metrics
    assert results[False] == results[True], (
        results[False][-1], results[True][-1])
