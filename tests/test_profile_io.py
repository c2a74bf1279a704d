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
