"""Post-hoc analysis: UMAP projection, per-pattern significance plots, and
the run-corpus processing toolkit (reference results_processing/*)."""

import json
from pathlib import Path

import numpy as np
import pytest

from mmtpu.analysis import plotting, processing


@pytest.fixture()
def clustered_points():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(3, 16))
    pts = np.concatenate(
        [c + rng.normal(scale=0.5, size=(40, 16)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), 40)
    return pts, labels


class TestUMAP:
    def test_embedding_shape_and_determinism(self, clustered_points):
        from mmtpu.analysis.umap_lite import umap_embed

        pts, _ = clustered_points
        e1 = umap_embed(pts, n_epochs=50, random_state=7)
        e2 = umap_embed(pts, n_epochs=50, random_state=7)
        assert e1.shape == (120, 2)
        np.testing.assert_allclose(e1, e2)

    def test_separates_clusters(self, clustered_points):
        from mmtpu.analysis.umap_lite import umap_embed

        pts, labels = clustered_points
        emb = umap_embed(pts, n_epochs=100, random_state=0)
        # cluster centroids in embedding space are farther apart than the
        # mean within-cluster spread
        cents = np.stack([emb[labels == k].mean(0) for k in range(3)])
        spread = np.mean(
            [np.linalg.norm(emb[labels == k] - cents[k], axis=1).mean()
             for k in range(3)]
        )
        sep = min(
            np.linalg.norm(cents[a] - cents[b])
            for a in range(3) for b in range(a + 1, 3)
        )
        assert sep > 2 * spread, (sep, spread)

    def test_plot_entrypoint(self, clustered_points, tmp_path):
        pts, labels = clustered_points
        out = plotting.plot_embeddings_projection(
            pts, labels, method="umap", out=tmp_path / "u.png"
        )
        assert (tmp_path / "u.png").exists(), out


class TestSignificancePlot:
    def test_two_experiment_stars(self, tmp_path):
        rng = np.random.default_rng(0)
        runs = {
            "scratch": {
                "AI": list(rng.normal(0.85, 0.01, 5)),
                "A": list(rng.normal(0.60, 0.02, 5)),
            },
            "pretrained": {
                "AI": list(rng.normal(0.95, 0.01, 5)),
                "A": list(rng.normal(0.80, 0.02, 5)),
            },
        }
        out = plotting.plot_modality_available_results_with_significance(
            runs, metric_name="accuracy", out=tmp_path / "sig.png"
        )
        assert (tmp_path / "sig.png").exists(), out

    def test_star_scheme(self):
        assert plotting.get_significance_stars(0.0001) == "***"
        assert plotting.get_significance_stars(0.005) == "**"
        assert plotting.get_significance_stars(0.03) == "*"
        assert plotting.get_significance_stars(0.2) == "ns"


def _fake_runs(tmp_path, n_runs=4):
    rng = np.random.default_rng(1)
    files = []
    for r in range(1, n_runs + 1):
        d = tmp_path / "metrics" / str(r)
        d.mkdir(parents=True)
        rec = {
            "index": 0,
            "accuracy_ATV": float(rng.normal(0.9, 0.01)),
            "accuracy_A": float(rng.normal(0.6, 0.02)),
            "f1_weighted_ATV": float(rng.normal(0.88, 0.01)),
            "f1_weighted_A": float(rng.normal(0.55, 0.02)),
            "loss": 0.3,
            "split": "test",
        }
        (d / "test_metrics.json").write_text(json.dumps([rec]))
        val = [
            {"index": e, "accuracy_ATV": 0.5 + 0.1 * e,
             "accuracy_A": 0.4 + 0.05 * e, "loss": 1.0 - 0.1 * e,
             "split": "validation", "Epoch": e + 1}
            for e in range(3)
        ]
        (d / "validation_metrics.json").write_text(json.dumps(val))
        files.append(d)
    return files


class TestProcessingToolkit:
    def test_run_discovery_and_extractors(self, tmp_path):
        files = _fake_runs(tmp_path)
        assert processing.get_run_data(tmp_path) == files
        assert processing.extract_modality_availability("f1_weighted_AI") == "AI"
        assert processing.extract_metric("f1_weighted_AI") == "f1_weighted"

    def test_load_all_test_metrics_and_stats(self, tmp_path):
        files = _fake_runs(tmp_path)
        df = processing.load_all_test_metrics(files)
        assert len(df) == 4 and "loss" not in df.columns
        indexed = processing.to_metric_modality_index(df)
        assert ("accuracy", "ATV") in indexed.index
        stats = processing.calculate_stats(indexed)
        basic = stats["basic_stats"]
        assert float(basic.loc[("accuracy", "ATV"), "n_runs"]) == 4
        ci = stats["confidence_intervals"]
        assert (ci["ci_upper"] >= ci["ci_lower"]).all()

    def test_within_modality_significance(self, tmp_path):
        files = _fake_runs(tmp_path)
        indexed = processing.to_metric_modality_index(
            processing.load_all_test_metrics(files)
        )
        chance, baseline = processing.calculate_within_modality_stats(
            indexed, {"accuracy": 0.5}, baseline_modality="ATV"
        )
        assert set(chance["compared_to"]) == {"chance"}
        assert (baseline["Modalities Available"] == "A").all()
        assert "p_value_corrected" in chance.columns
        # A-pattern accuracy is clearly below the ATV baseline
        assert (baseline["p_value"] < 0.01).all()

    def test_fdr_bh_matches_known_case(self):
        p = [0.01, 0.04, 0.03, 0.005]
        corrected = processing.fdr_bh(p)
        # BH: sorted p * n/rank with step-up monotonicity
        assert corrected[3] == pytest.approx(0.02)   # 0.005*4/1
        assert corrected[0] == pytest.approx(0.02)   # 0.01*4/2
        assert corrected[1] == pytest.approx(0.04)   # 0.04*4/4
        assert corrected[2] == pytest.approx(0.04)   # 0.03*4/3 -> step-up

    def test_validation_metrics_pipeline(self, tmp_path):
        files = _fake_runs(tmp_path)
        idf = processing.load_all_validation_metrics(files)
        split = processing.split_validation_metrics_by_available_modalities(
            idf, ["ATV", "A"]
        )
        assert "accuracy" in split
        assert list(split["accuracy"].columns) == ["ATV", "A"]
        assert len(split["accuracy"]) == 3  # epochs

    def test_latex_writer(self, tmp_path):
        files = _fake_runs(tmp_path)
        indexed = processing.to_metric_modality_index(
            processing.load_all_test_metrics(files)
        )
        out = tmp_path / "table.tex"
        processing.write_latex_to_file(
            processing.calculate_stats(indexed)["basic_stats"], out
        )
        text = out.read_text()
        assert "\\begin{table}" in text and "landscape" in text

    def test_confusion_matrix_helpers(self, tmp_path):
        cms = {"AI": [np.eye(3, dtype=int) * (i + 1) for i in range(2)]}
        np.save(tmp_path / "confusion_matrices_test.npy", cms,
                allow_pickle=True)
        loaded = processing.load_confusion_matrices(tmp_path, "test")
        assert set(loaded) == {"AI"}
        all_cms = processing.load_all_confusion_matrices([tmp_path], "test")
        means = processing.compute_mean_confusion_matrix_per_epoch(
            {k: v["AI"] for k, v in all_cms.items()}
        )
        assert len(means) == 2
        np.testing.assert_array_equal(means[0], np.eye(3, dtype=int))

    def test_embeddings_loader(self, tmp_path):
        d = tmp_path / "embeddings"
        d.mkdir()
        np.save(d / "audio_embeddings.npy", np.ones((5, 8)))
        emb = processing.load_embeddings(tmp_path, "audio")
        assert emb.shape == (5, 8)
        np.save(d / "audio_reconstructions.npy", np.zeros((5, 8)))
        both = processing.load_embeddings(tmp_path, "audio",
                                          include_reconstructions=True)
        assert both.shape == (5, 8, 2)


class TestVisualiser:
    @pytest.fixture()
    def runs_df(self):
        import pandas as pd

        rng = np.random.default_rng(0)
        rows = []
        for cond, base in (("Full", 0.9), ("Audio Only", 0.6),
                           ("Image Only", 0.7)):
            for _ in range(6):
                rows.append({
                    "Modality Availability": cond,
                    "accuracy": float(rng.normal(base, 0.02)),
                    "f1_weighted": float(rng.normal(base - 0.05, 0.02)),
                })
        return pd.DataFrame(rows)

    def test_create_all_visualizations(self, runs_df, tmp_path):
        from mmtpu.analysis.visualiser import ExperimentVisualiser

        vis = ExperimentVisualiser(tmp_path)
        out = vis.create_all_visualizations(
            runs_df, ["accuracy", "f1_weighted"], reference_condition="Full"
        )
        assert len(out) == 9
        for path in out.values():
            assert Path(path).exists()

    def test_validation_over_epochs(self, tmp_path):
        from mmtpu.analysis.visualiser import ExperimentVisualiser

        vis = ExperimentVisualiser(tmp_path)
        p = vis.plot_validation_over_epochs(
            {"Full": [0.5, 0.7, 0.8], "Audio Only": [0.4, 0.5, 0.55]},
            "accuracy",
        )
        assert Path(p).exists()


class TestAggregateRuns:
    def _write_run(self, root, entries):
        import json

        d = root / "metrics" / "1"
        d.mkdir(parents=True)
        (d / "epoch_metrics.json").write_text(json.dumps(entries))

    def test_avmnist_nesting_and_min_mode(self, tmp_path):
        """aggregate_runs reads avmnist pattern-nested entries and takes
        the per-run MIN for lower-is-better metrics."""
        from mmtpu.analysis.processing import aggregate_runs

        self._write_run(tmp_path, [
            {"epoch": 1, "validation": {"loss": 1.0,
                                        "AI": {"accuracy": 0.5}}},
            {"epoch": 2, "validation": {"loss": 0.4,
                                        "AI": {"accuracy": 0.8}}},
        ])
        acc = aggregate_runs(tmp_path, "accuracy", "validation")
        assert acc["runs"] == 1 and acc["values"] == [0.8]
        # min mode: best loss is the smallest, not max(per_epoch)
        import json

        d = tmp_path / "metrics" / "1"
        entries = json.loads((d / "epoch_metrics.json").read_text())
        for e in entries:
            e["validation"]["metrics"] = {"mae": 3.0 - e["epoch"]}
        (d / "epoch_metrics.json").write_text(json.dumps(entries))
        mae = aggregate_runs(tmp_path, "mae", "validation", mode="min")
        assert mae["values"] == [1.0]


def test_clean_checkpoints_idempotent_and_keep_best(tmp_path):
    """Repeated retention passes must not cascade *_last renames, and
    keep_best=False drops the best checkpoint like the reference."""
    from mmtpu.utils.utils import clean_checkpoints

    for n in (1, 2, 3):
        (tmp_path / f"epoch_{n}.ckpt").write_bytes(b"x")
    (tmp_path / "best.ckpt").write_bytes(b"x")
    clean_checkpoints(tmp_path)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["best.ckpt", "epoch_3_last.ckpt"]
    clean_checkpoints(tmp_path)  # second pass: nothing to do
    names2 = sorted(p.name for p in tmp_path.iterdir())
    assert names2 == names  # no epoch_3_last_last.ckpt
    clean_checkpoints(tmp_path, keep_best=False)
    assert not (tmp_path / "best.ckpt").exists()
