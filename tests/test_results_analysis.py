"""Unit tests for the results-analysis module (notebook-replacement layer)."""

import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.retrieval import results as R


def _fake_results(cross=False):
    """Minimal results pickle structure: 1 model, 1 fold, n=4, 2 runs."""
    rs = np.random.RandomState(0)
    classes = np.array(["a", "b", "c"])

    def preds(n):
        return classes[rs.randint(0, 3, n)]

    runs = {}
    for run in range(2):
        true = classes[rs.randint(0, 3, 30)]
        if cross:
            pred = {1: {"I - I": preds(30), "P - P": preds(30)},
                    3: {"I - I": true.copy(), "P - P": preds(30)}}
        else:
            pred = {1: preds(30), 3: true.copy()}  # k=3 predicts perfectly
        runs[run] = {"true": true, "pred": pred}
    return {"model_x": {1: {4: runs}}}


def test_accuracy_table_flat():
    table = R.accuracy_table(_fake_results(), k=3)
    acc_mean, acc_std = table["model_x"][4]["acc"]
    assert acc_mean == 1.0 and acc_std == 0.0
    table1 = R.accuracy_table(_fake_results(), k=1)
    assert table1["model_x"][4]["acc"][0] < 1.0


def test_accuracy_table_cross_requires_setup():
    with pytest.raises(ValueError, match="setup"):
        R.accuracy_table(_fake_results(cross=True), k=3)
    table = R.accuracy_table(_fake_results(cross=True), k=3, setup="I - I")
    assert table["model_x"][4]["acc"][0] == 1.0


def test_cross_modal_table():
    table = R.cross_modal_table(_fake_results(cross=True), n=4, k=3)
    assert set(table["model_x"]) == {"I - I", "P - P"}
    assert table["model_x"]["I - I"][0] == 1.0


def test_classification_report_text_and_latex():
    txt = R.classification_report(_fake_results(), "model_x", n=4, k=3)
    assert "accuracy" in txt and "macro f1" in txt
    tex = R.classification_report(_fake_results(), "model_x", n=4, k=3,
                                  latex=True)
    assert tex.startswith(r"\begin{tabular}") and r"\end{tabular}" in tex


def test_figures_render(tmp_path):
    R.accuracy_vs_n_figure(_fake_results(), k=3, out_path=tmp_path / "a.png")
    assert (tmp_path / "a.png").stat().st_size > 0
    R.confusion_figure(_fake_results(), "model_x", n=4, k=3,
                       out_path=tmp_path / "cm.png")
    assert (tmp_path / "cm.png").stat().st_size > 0
