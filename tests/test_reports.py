"""Reports subsystem tests: metrics/timing/model subreports + LaTeX."""

import json

import numpy as np

from mmtpu.reports import ExperimentReportGenerator
from mmtpu.reports.report import split_missing_conditions


def test_split_missing_conditions():
    out = split_missing_conditions(
        {"accuracy_AI": 0.9, "accuracy_A": 0.5, "f1_weighted_AI": 0.8, "loss": 0.1}
    )
    assert out["AI"] == {"accuracy": 0.9, "f1_weighted": 0.8}
    assert out["A"] == {"accuracy": 0.5}
    assert out["overall"] == {"loss": 0.1}


def test_generate_report(tmp_path):
    history = {
        "train": [{"accuracy_AI": 0.5, "loss": 1.0}, {"accuracy_AI": 0.9, "loss": 0.3}],
        "validation": [{"accuracy_AI": 0.4, "loss": 1.1}, {"accuracy_AI": 0.8, "loss": 0.5}],
    }
    timing = {"train": [2.0, 1.5], "validation": [0.5, 0.4]}
    params = {"layer": {"kernel": np.zeros((4, 4), np.float32)}}
    gen = ExperimentReportGenerator(tmp_path, "Test Experiment")
    out = gen.generate_report(
        metrics_history=history,
        timing_history=timing,
        params=params,
        test_metrics={"test": {"accuracy_AI": 0.85, "loss": 0.4}},
    )
    assert (tmp_path / "train_metrics.json").exists()
    assert (tmp_path / "timing.csv").exists()
    assert (tmp_path / "report.tex").exists()
    info = json.loads((tmp_path / "model_info.json").read_text())
    assert info["total_parameters"] == 16
    # reference records schema: concat-then-split dataframe semantics —
    # 'index' continues across splits, columns are the union, test has no
    # Epoch field
    test_payload = json.loads((tmp_path / "test_metrics.json").read_text())
    assert test_payload == [
        {"index": 4, "accuracy_AI": 0.85, "loss": 0.4, "split": "test"}
    ]
    train_payload = json.loads((tmp_path / "train_metrics.json").read_text())
    assert train_payload[0]["index"] == 0
    assert train_payload[0]["Epoch"] == 1
    assert train_payload[1]["accuracy_AI"] == 0.9
    assert train_payload[1]["split"] == "train"
    val_payload = json.loads((tmp_path / "validation_metrics.json").read_text())
    assert val_payload[0]["index"] == 2  # continues after the 2 train rows
    tex = (tmp_path / "report.tex").read_text()
    assert "Test\\_Experiment" in tex or "Test Experiment" in tex.replace("\\_", "_")


def test_confusion_matrices_saved_and_extra_split_has_no_epoch(tmp_path):
    """Reference parity (experiment_report.py:332-339,357-361,557): the
    ConfusionMatrix columns are popped from the records, saved as
    confusion_matrices_{split}.npy (readable by the analysis loader), and
    Epoch is added to train/validation ONLY — an extra test-style split
    gets no Epoch field."""
    cm1 = [[3, 1], [0, 4]]
    cm2 = [[4, 0], [1, 3]]
    history = {
        "train": [
            {"accuracy_AI": 0.5, "loss": 1.0, "ConfusionMatrix_AI": cm1},
            {"accuracy_AI": 0.9, "loss": 0.3, "ConfusionMatrix_AI": cm2},
        ],
        "validation": [{"accuracy_AI": 0.4, "loss": 1.1}],
    }
    gen = ExperimentReportGenerator(tmp_path, "CM Test")
    gen.generate_report(
        metrics_history=history,
        timing_history={"train": [1.0], "validation": [0.5]},
        params={"layer": {"kernel": np.zeros((2, 2), np.float32)}},
        test_metrics={
            "test": {"accuracy_AI": 0.8, "ConfusionMatrix_AI": cm1},
            "holdout": {"accuracy_AI": 0.7},
        },
    )
    # npy artifacts, loadable through the analysis reader
    from mmtpu.analysis.processing import load_confusion_matrices

    train_cms = load_confusion_matrices(tmp_path, "train")
    assert list(train_cms) == ["ConfusionMatrix_AI"]
    np.testing.assert_array_equal(train_cms["ConfusionMatrix_AI"][0], cm1)
    np.testing.assert_array_equal(train_cms["ConfusionMatrix_AI"][1], cm2)
    test_cms = load_confusion_matrices(tmp_path, "test")
    np.testing.assert_array_equal(test_cms["ConfusionMatrix_AI"][0], cm1)
    # the matrices were popped from the records themselves
    recs = json.loads((tmp_path / "train_metrics.json").read_text())
    assert all("ConfusionMatrix" not in k for r in recs for k in r)
    # Epoch: train/validation yes, test-style splits (incl. extras) no
    assert recs[0]["Epoch"] == 1
    holdout = json.loads((tmp_path / "holdout_metrics.json").read_text())
    assert "Epoch" not in holdout[0]


def test_latex_report_has_per_condition_tables(tmp_path):
    """The reference's final report renders one metrics table per missing
    condition (experiment_report.py:543-549 over split_missing_conditions
    output) — report.tex carries those sections."""
    history = {
        "train": [{"accuracy_AI": 0.5, "loss": 1.0}],
        "validation": [
            {"accuracy_AI": 0.8, "accuracy_A": 0.6, "f1_weighted_AI": 0.7,
             "loss": 0.5}
        ],
    }
    gen = ExperimentReportGenerator(tmp_path, "Cond Test")
    gen.generate_report(
        metrics_history=history,
        timing_history={"train": [1.0], "validation": [0.5]},
        params={"layer": {"kernel": np.zeros((2, 2), np.float32)}},
        test_metrics={"test": {"accuracy_AI": 0.85, "accuracy_A": 0.65}},
    )
    tex = (tmp_path / "report.tex").read_text()
    assert "validation-AI" in tex
    assert "validation-A" in tex
    assert "test-AI" in tex
