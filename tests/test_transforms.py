"""Unit tests for host-side transforms (reference semantics: src/data.py)."""

import numpy as np
import pytest
from PIL import Image

from multimodal_plankton_recognition_tpu.data import transforms as T


def _blob_image(h=120, w=90, bg=200, seed=0, scalebar=True):
    rng = np.random.default_rng(seed)
    img = np.clip(rng.normal(bg, 3, size=(h, w)), 0, 255).astype(np.uint8)
    img[40:60, 30:50] = 50
    if scalebar:
        img[5:8, 5:30] = 0  # fake scale bar inside the top-25 strip
    return img


class TestBackgroundStats:
    def test_mode_and_std(self):
        img = _blob_image()
        bg, std = T.find_background_stats(img)
        assert abs(float(bg[0]) - 200) <= 3
        assert 0 < float(std[0]) < 10

    def test_cover_scale_overwrites_top_rows(self):
        img = _blob_image()
        rng = np.random.default_rng(1)
        out = T.cover_scale(img, np.array([200]), np.array([3.0]), rng)
        assert out[:25].min() > 100  # scale bar (zeros) gone
        assert np.array_equal(out[25:], img[25:])

    def test_pad_to_square(self):
        img = _blob_image(h=120, w=90)
        rng = np.random.default_rng(2)
        out = T.pad_image_to_square(img, np.array([200]), np.array([3.0]), rng)
        assert out.shape == (120, 120)
        # original image centered
        assert np.array_equal(out[:, 15:105], img)


class TestResampleLinear:
    def test_identity(self):
        x = np.arange(24, dtype=np.float32).reshape(-1, 2)
        assert np.array_equal(T.resample_linear(x, 12), x)

    def test_upsample_linear_interp(self):
        # pure bilinear upsample of a linear ramp stays (nearly) linear
        x = np.linspace(0, 1, 10, dtype=np.float32)[:, None]
        y = T.resample_linear(x, 20)
        assert y.shape == (20, 1)
        diffs = np.diff(y[2:-2, 0])
        assert np.allclose(diffs, diffs[0], atol=1e-4)

    def test_downsample_antialias_mean_preserving(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1000, 6)).astype(np.float32)
        y = T.resample_linear(x, 100)
        assert y.shape == (100, 6)
        assert np.allclose(y.mean(0), x.mean(0), atol=0.05)

    def test_matches_torch_bilinear_antialias(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(3)
        for L, target in [(37, 224), (512, 224), (2048, 256), (100, 236)]:
            x = rng.normal(size=(L, 6)).astype(np.float32)
            ours = T.resample_linear(x, target)
            xt = torch.tensor(x).t().unsqueeze(0).unsqueeze(2)  # (1, 6, 1, L)
            yt = F.interpolate(xt, size=(1, target), mode="bilinear",
                               antialias=L > target, align_corners=False)
            theirs = yt.squeeze(2).squeeze(0).t().numpy()
            np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


class TestImageTransforms:
    def test_train_output_shape_and_range(self):
        img = Image.fromarray(_blob_image(130, 100), mode="L")
        tr = T.ImageTransformTrain(64)
        out = tr(img, np.random.default_rng(0))
        assert out.shape == (64, 64, 1)
        assert out.dtype == np.float32
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_test_transform_deterministic(self):
        img = Image.fromarray(_blob_image(130, 100), mode="L")
        tr = T.ImageTransformTest(64)
        a, b = tr(img), tr(img)
        assert a.shape == (64, 64, 1)
        np.testing.assert_array_equal(a, b)

    def test_raw_transform(self):
        tr = T.ImageTransforms(target_size=96)
        out = tr(Image.fromarray(_blob_image(), mode="L"),
                 np.random.default_rng(0))
        assert out.shape == (96, 96, 1)
        assert 0.0 <= out.min() and out.max() <= 1.0


class TestProfileTransforms:
    def test_raw_log1p(self):
        prof = np.abs(np.random.default_rng(0).normal(100, 10, (50, 6)))
        out = T.ProfileTransform()(prof)
        np.testing.assert_allclose(out, np.log1p(prof).astype(np.float32),
                                   rtol=1e-6)

    def test_raw_resample(self):
        prof = np.abs(np.random.default_rng(0).normal(100, 10, (50, 6)))
        out = T.ProfileTransform(max_len=32)(prof)
        assert out.shape == (32, 6)

    def test_train_shape_and_range(self):
        prof = np.abs(np.random.default_rng(0).normal(500, 100, (300, 6)))
        tr = T.ProfileTransformTrain(224)
        out = tr(prof, np.random.default_rng(1))
        assert out.shape == (224, 6)
        assert out.min() >= -1.1 and out.max() <= 1.1

    def test_test_deterministic(self):
        prof = np.abs(np.random.default_rng(0).normal(500, 100, (300, 6)))
        tr = T.ProfileTransformTest(224)
        np.testing.assert_array_equal(tr(prof), tr(prof))


class TestPairAugmentation:
    def test_joint_flip_consistency(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
        prof = np.arange(10, dtype=np.float32).reshape(5, 2)
        aug = T.PairAugmentation()
        flipped = unflipped = 0
        for seed in range(20):
            i2, p2 = aug(img, prof, np.random.default_rng(seed))
            img_flipped = not np.array_equal(i2, img)
            prof_flipped = not np.array_equal(p2, prof)
            assert img_flipped == prof_flipped  # always joint
            flipped += img_flipped
            unflipped += not img_flipped
        assert flipped > 0 and unflipped > 0
        # flip semantics: horizontal (width) flip + time reversal
        i2, p2 = aug(img, prof, np.random.default_rng(0))
        if not np.array_equal(i2, img):
            np.testing.assert_array_equal(i2, img[:, ::-1])
            np.testing.assert_array_equal(p2, prof[::-1])


def test_resample_empty_profile():
    """Zero-row profiles (all rows dropped by preprocess positivity filter)
    resample to silence instead of crashing."""
    out = T.resample_linear(np.zeros((0, 6), np.float32), 16)
    assert out.shape == (16, 6)
    assert (out == 0).all()
    # and through the transform classes
    out = T.ProfileTransformTest(16)(np.zeros((0, 6)))
    assert out.shape == (16, 6) and np.isfinite(out).all()
