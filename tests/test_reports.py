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
