"""Unit checks for the real-data parity harness (scripts/parity_real.py).

The end-to-end plumbing is proven by ``parity_real.py --dry-run``
(executed, VALIDATION.md round 5); these tests pin the cheap invariants —
the reference-expectation tables match BASELINE.md's recorded notebook
outputs and the tolerance diff classifies correctly — without training
anything.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location(
        "parity_real", REPO / "scripts" / "parity_real.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["parity_real"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_expected_tables_match_baseline_md():
    pr = _load()
    text = (REPO / "BASELINE.md").read_text()
    # every cell-12 fused accuracy appears verbatim in BASELINE.md
    for model, acc in pr.CELL12_FUSED_ACC.items():
        assert f"{acc:.2f}" in text, (model, acc)
    # every cell-22 cross-modal accuracy appears in BASELINE.md
    for model, row in pr.CELL22_CROSS_ACC.items():
        assert set(row) == {"I - I", "I - P", "I - I+P", "P - I", "P - P",
                            "P - I+P", "I+P - I", "I+P - P"}, model
        for setup, acc in row.items():
            assert f"{acc:.2f}" in text, (model, setup, acc)
    # the flagship set is a subset of the full card set with card files
    for name in pr.ALL_CARDS:
        assert (REPO / "model_cards" / "multi" / f"{name}.yaml").exists()
    assert set(pr.FLAGSHIP_CARDS) <= set(pr.ALL_CARDS)


def test_folds_validated_before_training(monkeypatch):
    # --folds beyond --n-folds must die at argument time (parser error,
    # SystemExit 2), not hours later on fold{N}/train.csv — round-5 review
    # finding. --data points nowhere: validation must fire before any IO.
    import pytest

    pr = _load()
    monkeypatch.setattr(sys, "argv", ["parity_real.py", "--data",
                                      "/nonexistent", "--folds", "6"])
    with pytest.raises(SystemExit) as e:
        pr.main()
    assert e.value.code == 2


def test_diff_tolerance_classification():
    pr = _load()
    failures = []
    ok = pr._diff(96.0, 96.2, tol=2.0, label="x", failures=failures)
    assert ok["within_tolerance"] and not failures
    bad = pr._diff(90.0, 96.2, tol=2.0, label="y", failures=failures)
    assert not bad["within_tolerance"]
    assert len(failures) == 1 and "y" in failures[0]
    assert bad["delta_pct"] == -6.2
