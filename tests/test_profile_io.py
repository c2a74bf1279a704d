"""Profile CSV parser tests (native C++ + pure-Python fallback)."""

import numpy as np
import pandas as pd
import pytest

from multimodal_plankton_recognition_tpu.data import profile_io


@pytest.fixture
def csv_file(tmp_path):
    rng = np.random.default_rng(0)
    prof = rng.gamma(2.0, 100.0, size=(57, 6)).astype(np.float32)
    path = tmp_path / "prof.csv"
    pd.DataFrame(prof, columns=list("ABCDEF")).to_csv(path, index=False)
    return path, prof


def test_load_matches_loadtxt(csv_file):
    path, prof = csv_file
    got = profile_io.load_profile_csv(path)
    ref = np.loadtxt(path, delimiter=",", skiprows=1).astype(np.float32)
    assert got.shape == (57, 6)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_python_fallback_matches(csv_file):
    path, _ = csv_file
    with open(path) as f:
        text = f.read()
    got = profile_io._parse_python(text)
    ref = np.loadtxt(path, delimiter=",", skiprows=1).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_single_row(tmp_path):
    path = tmp_path / "one.csv"
    path.write_text("A,B,C,D,E,F\n1.5,2,3,4,5,6\n")
    got = profile_io.load_profile_csv(path)
    assert got.shape == (1, 6)
    np.testing.assert_allclose(got[0], [1.5, 2, 3, 4, 5, 6])


def test_empty_profile(tmp_path):
    path = tmp_path / "empty.csv"
    path.write_text("A,B,C,D,E,F\n")
    got = profile_io.load_profile_csv(path)
    assert got.shape[0] == 0


def test_native_if_built():
    lib = profile_io._load_native()
    if not lib:
        pytest.skip("native library not built (run native/build.sh)")
    # exercised implicitly by test_load_matches_loadtxt when built
    assert lib.parse_profile_csv is not None


def _jpeg_fixture(tmp_path, mode, size=(37, 53), quality=92, seed=0):
    from PIL import Image
    rs = np.random.RandomState(seed)
    if mode == "L":
        arr = rs.randint(0, 256, size=size[::-1], dtype=np.uint8)
    else:
        arr = rs.randint(0, 256, size=size[::-1] + (3,), dtype=np.uint8)
    path = tmp_path / f"img_{mode}.jpg"
    Image.fromarray(arr, mode=mode).save(path, quality=quality)
    return path


@pytest.mark.parametrize("mode", ["L", "RGB"])
def test_native_jpeg_decode_bit_identical_to_pil(tmp_path, mode):
    """The packed input cache must stay bit-identical to the CSV path
    (CLAUDE.md), so the native decode must produce EXACTLY PIL's pixels
    (same libjpeg, JDCT_ISLOW)."""
    from PIL import Image
    lib = profile_io._load_native()
    if not lib or not hasattr(lib, "decode_jpeg"):
        pytest.skip("native library without decode_jpeg (run native/build.sh)")
    path = _jpeg_fixture(tmp_path, mode)
    got = profile_io.load_image(path)
    ref = Image.open(path)
    assert got.mode == ref.mode and got.size == ref.size
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_load_image_png_falls_back_to_pil(tmp_path):
    from PIL import Image
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    path = tmp_path / "img.png"
    Image.fromarray(arr, mode="L").save(path)
    got = profile_io.load_image(path)
    np.testing.assert_array_equal(np.asarray(got), arr)


def test_load_image_corrupt_jpeg_falls_back(tmp_path):
    """A JPEG-magic file the native decoder rejects must reach PIL, which
    raises its usual error — never a silent wrong image."""
    path = tmp_path / "bad.jpg"
    path.write_bytes(b"\xff\xd8\xff\xe0garbage")
    with pytest.raises(Exception):
        np.asarray(profile_io.load_image(path))
