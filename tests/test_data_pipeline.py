"""Dataset / tokenizer / loader tests."""

import numpy as np

from multimodal_plankton_recognition_tpu.data import (
    MultiSet, ImageTransformTrain, ImageTransformTest, ProfileTransformTrain,
    ProfileTransformTest, PairAugmentation, Loader, tokenize,
)
from multimodal_plankton_recognition_tpu.data.pipeline import (
    multi_collate_fn, image_collate_fn, profile_collate_fn,
)
from multimodal_plankton_recognition_tpu.data.transforms import ImageTransforms, ProfileTransform
from multimodal_plankton_recognition_tpu.utils import LabelVocab


def test_multiset_item(synthetic_dataset):
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransformTrain(64), ProfileTransformTrain(64),
                  PairAugmentation())
    assert len(ds) == 12
    item = ds.__getitem__(0, np.random.default_rng(0))
    assert item["image"].shape == (64, 64, 1)
    assert item["profile"].shape == (64, 6)
    assert item["image_shape"].shape == (2,)
    assert item["profile_length"].shape == (1,)
    assert isinstance(item["label"], str)
    assert len(ds.class_names) == 3


def test_tokenize_transformer():
    profiles = [np.ones((5, 6), np.float32), np.full((9, 6), 2.0, np.float32)]
    out = tokenize.tokenize_transformer(profiles, target_size=16)
    T = out["profile"].shape[1]
    assert T == 16  # 9+1 rounded to 16
    # CLS row is zeros with position id 0
    assert np.all(out["profile"][:, 0] == 0)
    assert np.all(out["time"][:, 0] == 0)
    # first sample: 5 rows at tokens 1..5, then padding idx 17
    assert np.all(out["profile"][0, 1:6] == 1)
    assert np.all(out["time"][0, 1:6] == np.arange(1, 6))
    assert np.all(out["time"][0, 6:] == 17)
    assert not out["padding_mask"][0, :6].any()
    assert out["padding_mask"][0, 6:].all()


def test_tokenize_lstm_and_cnn():
    profiles = [np.ones((5, 6), np.float32), np.full((9, 6), 2.0, np.float32)]
    out = tokenize.tokenize_lstm(profiles)
    assert out["profile"].shape == (2, 16, 6)
    assert list(out["last_idx"]) == [4, 8]

    fixed = [np.ones((8, 6), np.float32)] * 3
    out = tokenize.tokenize_cnn(fixed)
    assert out["profile"].shape == (3, 8, 6)


def test_loader_deterministic(synthetic_dataset):
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransformTrain(32), ProfileTransformTrain(32),
                  PairAugmentation())
    collate = multi_collate_fn(tokenize.get_tokenizer("transformer", 32, pad_to=33))
    mk = lambda: Loader(ds, batch_size=4, collate_fn=collate, shuffle=True,
                        drop_last=True, num_workers=2, seed=7)
    b1 = next(iter(mk()))
    b2 = next(iter(mk()))
    assert b1["image"].shape == (4, 32, 32, 1)
    assert b1["profile"].shape == (4, 33, 6)
    np.testing.assert_array_equal(b1["image"], b2["image"])
    np.testing.assert_array_equal(b1["profile"], b2["profile"])
    # different epochs differ
    loader = mk()
    e1 = next(iter(loader))
    e2 = next(iter(loader))
    assert not np.array_equal(e1["image"], e2["image"])


def test_supervised_collates(synthetic_dataset):
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransforms(target_size=48), ProfileTransform(max_len=24))
    vocab = LabelVocab(ds.class_names)
    img_batch = next(iter(Loader(ds, 4, image_collate_fn(vocab),
                                 num_workers=1)))
    assert img_batch["image"].shape == (4, 48, 48, 1)
    assert img_batch["label"].dtype == np.int32

    prof_collate = profile_collate_fn(tokenize.get_tokenizer("cnn"), vocab)
    prof_batch = next(iter(Loader(ds, 4, prof_collate, num_workers=1)))
    assert prof_batch["profile"].shape == (4, 24, 6)
    assert prof_batch["label"].shape == (4,)


def test_loader_host_sharding(synthetic_dataset):
    """Two simulated host processes cover each global batch exactly,
    disjointly, in order (multi-host input pattern)."""
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransformTrain(32), ProfileTransformTrain(32))
    collate = lambda samples: {
        "image": np.stack([s["image"] for s in samples])}
    full = Loader(ds, 4, collate, shuffle=True, drop_last=True,
                  num_workers=1, seed=3)
    h0 = Loader(ds, 4, collate, shuffle=True, drop_last=True,
                num_workers=1, seed=3, host_shard=(0, 2))
    h1 = Loader(ds, 4, collate, shuffle=True, drop_last=True,
                num_workers=1, seed=3, host_shard=(1, 2))
    for bf, b0, b1 in zip(full, h0, h1):
        assert b0["image"].shape[0] == 2 and b1["image"].shape[0] == 2
        np.testing.assert_array_equal(
            np.concatenate([b0["image"], b1["image"]]), bf["image"])


def test_loader_host_sharding_divisibility():
    import pytest
    with pytest.raises(ValueError):
        Loader(None, 5, lambda s: s, host_shard=(0, 2))


def test_grain_loader_parity(synthetic_dataset):
    """GrainLoader yields bit-identical batches to the threaded Loader
    (worker_count=0 runs in-process: correctness without process spawn)."""
    from multimodal_plankton_recognition_tpu.data.grain_pipeline import (
        GrainLoader,
    )
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransformTrain(32), ProfileTransformTrain(32),
                  PairAugmentation())
    collate = multi_collate_fn(tokenize.get_tokenizer("cnn", 32, pad_to=32))
    l1 = Loader(ds, 4, collate, shuffle=True, drop_last=True,
                num_workers=1, seed=11)
    l2 = GrainLoader(ds, 4, collate, shuffle=True, drop_last=True,
                     num_workers=0, seed=11)
    for _ in range(2):  # two epochs: shuffling + rng advance identically
        for b1, b2 in zip(l1, l2):
            np.testing.assert_array_equal(b1["image"], b2["image"])
            np.testing.assert_array_equal(b1["profile"], b2["profile"])


def test_grain_loader_host_shard(synthetic_dataset):
    from multimodal_plankton_recognition_tpu.data.grain_pipeline import (
        GrainLoader,
    )
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransformTrain(32), ProfileTransformTrain(32))
    collate = lambda samples: {
        "image": np.stack([s["image"] for s in samples])}
    full = Loader(ds, 4, collate, shuffle=True, drop_last=True,
                  num_workers=1, seed=3)
    h0 = GrainLoader(ds, 4, collate, shuffle=True, drop_last=True,
                     num_workers=0, seed=3, host_shard=(0, 2))
    h1 = GrainLoader(ds, 4, collate, shuffle=True, drop_last=True,
                     num_workers=0, seed=3, host_shard=(1, 2))
    for bf, b0, b1 in zip(full, h0, h1):
        np.testing.assert_array_equal(
            np.concatenate([b0["image"], b1["image"]]), bf["image"])


def test_grain_loader_early_break_realigns(synthetic_dataset):
    """Breaking out of an epoch mid-stream must not shift later epochs off
    the deterministic (seed, epoch) schedule (ADVICE r1): the loader rebuilds
    its stream at the current epoch's first record."""
    from multimodal_plankton_recognition_tpu.data.grain_pipeline import (
        GrainLoader,
    )
    ds = MultiSet(synthetic_dataset / "train.csv",
                  ImageTransformTrain(32), ProfileTransformTrain(32),
                  PairAugmentation())
    collate = multi_collate_fn(tokenize.get_tokenizer("cnn", 32, pad_to=32))
    ref = GrainLoader(ds, 4, collate, shuffle=True, drop_last=True,
                      num_workers=0, seed=11)
    golden = [[b["image"] for b in ref] for _ in range(2)]  # epochs 0, 1

    l2 = GrainLoader(ds, 4, collate, shuffle=True, drop_last=True,
                     num_workers=0, seed=11)
    for b in l2:  # early break: consume only 1 batch of epoch 0
        first = b["image"]
        break
    np.testing.assert_array_equal(first, golden[0][0])
    # epoch 0 replays from its start, then epoch 1 follows the schedule
    for got, want in zip(l2, golden[0]):
        np.testing.assert_array_equal(got["image"], want)
    for got, want in zip(l2, golden[1]):
        np.testing.assert_array_equal(got["image"], want)
