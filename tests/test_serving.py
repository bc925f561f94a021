"""Serving subsystem: export artifacts, in-process predictor, micro-batcher,
and the predict CLI (beyond-reference — the reference has no inference path)."""

import json
import sys
import threading
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/MML_Suite")
sys.path.insert(0, str(REPO / "scripts"))

from mmtpu.serving import (  # noqa: E402
    MicroBatcher,
    Predictor,
    export_task,
    load_artifact,
)
from mmtpu.train.losses import LossFunctionGroup  # noqa: E402
from mmtpu.train.step import ClassificationTask  # noqa: E402


class TinyFusion(nn.Module):
    """Minimal 2-input fusion classifier (BN exercises batch_stats)."""

    @nn.compact
    def __call__(self, a, b, train=False):
        x = jnp.concatenate([nn.Dense(8)(a), nn.Dense(8)(b)], axis=-1)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Dense(3)(x)


def _tiny_task():
    model = TinyFusion()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((2, 5)), jnp.ones((2, 7)), train=False
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    return task, variables


def _batch(n, seed=0):
    g = np.random.default_rng(seed)
    return {
        "audio": g.normal(size=(n, 5)).astype(np.float32),
        "image": g.normal(size=(n, 7)).astype(np.float32),
    }


class TestPredictor:
    def test_matches_direct_apply(self):
        task, variables = _tiny_task()
        b = _batch(4)
        pred = Predictor(task, variables)
        out = pred(audio=b["audio"], image=b["image"])
        direct = task.model.apply(variables, b["audio"], b["image"], train=False)
        np.testing.assert_allclose(out["logits"], np.asarray(direct), rtol=1e-6)
        assert out["preds"].shape == (4,)
        np.testing.assert_allclose(out["probs"].sum(axis=-1), 1.0, rtol=1e-5)
        # positional call agrees with keyword call
        out2 = pred(b["audio"], b["image"])
        np.testing.assert_array_equal(out["preds"], out2["preds"])

    def test_missing_keyword_raises(self):
        task, variables = _tiny_task()
        with pytest.raises(KeyError, match="image"):
            Predictor(task, variables)(audio=_batch(2)["audio"])


class TestExportArtifact:
    def test_roundtrip_symbolic_batch(self, tmp_path):
        """One artifact serves multiple batch sizes, bit-matching the
        in-process predictor; meta records the full input signature."""
        task, variables = _tiny_task()
        path = export_task(
            task, variables, _batch(2), tmp_path / "tiny.mmx",
            platforms=("cpu",),
        )
        served = load_artifact(path)
        assert served.meta["input_keys"] == ["audio", "image"]
        assert served.meta["input_shapes"] == [["b", 5], ["b", 7]]
        assert served.meta["outputs"] == ["logits", "preds", "probs"]
        pred = Predictor(task, variables)
        for n in (1, 3, 8):
            b = _batch(n, seed=n)
            got = served(audio=b["audio"], image=b["image"])
            want = pred(audio=b["audio"], image=b["image"])
            np.testing.assert_allclose(
                got["logits"], want["logits"], rtol=1e-5, atol=1e-6
            )
            np.testing.assert_array_equal(got["preds"], want["preds"])

    def test_fixed_batch_export(self, tmp_path):
        task, variables = _tiny_task()
        path = export_task(
            task, variables, _batch(4), tmp_path / "fixed.mmx",
            platforms=("cpu",), symbolic_batch=False,
        )
        served = load_artifact(path)
        assert served.meta["input_shapes"] == [[4, 5], [4, 7]]
        b = _batch(4, seed=9)
        got = served(audio=b["audio"], image=b["image"])
        assert got["logits"].shape == (4, 3)

    def test_multi_platform_blob(self, tmp_path):
        """cpu+tpu lowering in one artifact (the deployment default)."""
        task, variables = _tiny_task()
        path = export_task(
            task, variables, _batch(2), tmp_path / "multi.mmx"
        )
        served = load_artifact(path)
        assert set(served.meta["platforms"]) == {"cpu", "tpu"}
        b = _batch(2, seed=1)
        out = served(audio=b["audio"], image=b["image"])
        assert out["preds"].shape == (2,)

    def test_rejects_foreign_file(self, tmp_path):
        p = tmp_path / "bogus.mmx"
        p.write_bytes(b"not an artifact")
        with pytest.raises(ValueError, match="not an mmtpu serving artifact"):
            load_artifact(p)

    def test_lstm_model_exports_with_symbolic_batch(self, tmp_path):
        """UttFusion's scanned LSTMs export under a symbolic batch dim (the
        ops.xla_only trace path); artifact output matches direct apply."""
        from mmtpu.models import build_module

        model = build_module(
            "utt_fusion",
            netA=build_module("lstmencoder", input_size=4, hidden_size=8,
                              embd_method="last"),
            netV=build_module("lstmencoder", input_size=6, hidden_size=8,
                              embd_method="last"),
            netT=build_module("textcnn", input_size=16, embd_size=8,
                              in_channels=1, out_channels=4,
                              kernel_heights=[3, 4, 5], dropout=0.0),
            netC=build_module("fcclassifier", input_dim=24, layers=[16],
                              output_dim=3, dropout=0.0),
        )
        g = np.random.default_rng(0)
        a = g.normal(size=(2, 10, 4)).astype(np.float32)
        v = g.normal(size=(2, 10, 6)).astype(np.float32)
        t = g.normal(size=(2, 10, 16)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), a, v, t, train=False)
        task = ClassificationTask(
            model=model,
            loss_group=LossFunctionGroup.from_dict(
                {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
            ),
            input_keys=("audio", "video", "text"),
        )
        path = export_task(
            task, variables, {"audio": a, "video": v, "text": t},
            tmp_path / "utt.mmx", platforms=("cpu",),
        )
        served = load_artifact(path)
        for n in (2, 5):
            aa = g.normal(size=(n, 10, 4)).astype(np.float32)
            vv = g.normal(size=(n, 10, 6)).astype(np.float32)
            tt = g.normal(size=(n, 10, 16)).astype(np.float32)
            got = served(audio=aa, video=vv, text=tt)
            want = model.apply(variables, aa, vv, tt, train=False)
            np.testing.assert_allclose(
                got["logits"], np.asarray(want), rtol=1e-5, atol=1e-6
            )


class TestCMAMExport:
    def test_missing_modality_artifact(self, tmp_path):
        """A trained C-MAM + frozen base export to ONE artifact: the
        available modality in → imputed target embedding + class scores,
        matching the eval-step reconstruction/classification exactly, at
        multiple (symbolic) batch sizes."""
        from test_cmam import build_task, make_batch

        from mmtpu.serving import export_cmam, load_artifact
        from mmtpu.serving.export import make_cmam_serving_fn
        from mmtpu.train.cmam_step import make_cmam_eval_step

        task, state, batch, _ = build_task()
        cmam_vars = {"params": state.params}
        if state.batch_stats:
            cmam_vars["batch_stats"] = state.batch_stats
        path = export_cmam(
            task, cmam_vars, {"audio": np.asarray(batch["audio"])},
            tmp_path / "cmam.mmx", platforms=("cpu",),
        )
        served = load_artifact(path)
        assert served.meta["task_type"] == "cmam"
        assert served.meta["imputes"] == ["image"]
        assert served.meta["input_keys"] == ["audio"]

        # parity vs the eval step's reconstruction + teacher classification
        # on the SAME inputs (full-keep masks in the eval batch)
        eval_out = make_cmam_eval_step(task)(state, batch)
        got = served(audio=np.asarray(batch["audio"]))
        np.testing.assert_allclose(
            got["rec_embd"], np.asarray(eval_out["rec_embd"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(got["preds"],
                                      np.asarray(eval_out["preds"]))

        # symbolic batch: a different batch size through the same artifact
        g = np.random.default_rng(21)
        a3 = g.normal(size=(3, 32, 94, 1)).astype(np.float32)
        got3 = served(audio=a3)
        want3 = make_cmam_serving_fn(task, cmam_vars)(a3)
        np.testing.assert_allclose(
            got3["logits"], np.asarray(want3["logits"]),
            rtol=1e-5, atol=1e-6,
        )
        assert got3["rec_embd"].shape == (3, 16)


class TestMicroBatcher:
    def test_matches_direct_and_batches(self):
        task, variables = _tiny_task()
        pred = Predictor(task, variables)
        n = 7
        b = _batch(n, seed=3)
        want = pred(audio=b["audio"], image=b["image"])
        with MicroBatcher(pred, task.input_keys, max_batch=8,
                          max_wait_ms=30.0) as mb:
            futs = [
                mb.submit({"audio": b["audio"][i], "image": b["image"][i]})
                for i in range(n)
            ]
            rows = [f.result(timeout=30) for f in futs]
        for i, row in enumerate(rows):
            np.testing.assert_allclose(
                row["logits"], want["logits"][i], rtol=1e-5, atol=1e-6
            )
            assert row["preds"].shape == ()
        # grouping happened: far fewer predict calls than requests
        assert mb.stats["requests"] == n
        assert mb.stats["batches"] < n

    def test_concurrent_submitters(self):
        task, variables = _tiny_task()
        pred = Predictor(task, variables)
        b = _batch(16, seed=5)
        want = pred(audio=b["audio"], image=b["image"])
        results = {}
        with MicroBatcher(pred, task.input_keys, max_batch=4,
                          max_wait_ms=10.0) as mb:
            def client(i):
                results[i] = mb(
                    {"audio": b["audio"][i], "image": b["image"][i]}
                )

            threads = [
                threading.Thread(target=client, args=(i,)) for i in range(16)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        for i in range(16):
            np.testing.assert_array_equal(results[i]["preds"], want["preds"][i])

    def test_error_propagates_and_batcher_survives(self):
        task, variables = _tiny_task()
        pred = Predictor(task, variables)
        calls = {"n": 0}

        def flaky(*inputs):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient")
            return pred(*inputs)

        b = _batch(2, seed=7)
        with MicroBatcher(flaky, task.input_keys, max_batch=1,
                          max_wait_ms=1.0) as mb:
            f1 = mb.submit({"audio": b["audio"][0], "image": b["image"][0]})
            with pytest.raises(RuntimeError, match="transient"):
                f1.result(timeout=30)
            f2 = mb.submit({"audio": b["audio"][1], "image": b["image"][1]})
            assert f2.result(timeout=30)["preds"].shape == ()

    def test_submit_missing_key_raises(self):
        task, variables = _tiny_task()
        with MicroBatcher(Predictor(task, variables), task.input_keys) as mb:
            with pytest.raises(KeyError, match="image"):
                mb.submit({"audio": np.zeros(5, np.float32)})

    def test_shape_contract_rejects_bad_sample(self):
        """With input_shapes set, a mis-shaped sample fails ITS OWN submit
        instead of poisoning the whole co-batched group's np.stack."""
        task, variables = _tiny_task()
        pred = Predictor(task, variables)
        with MicroBatcher(pred, task.input_keys, max_batch=8,
                          max_wait_ms=20.0,
                          input_shapes={"audio": (5,), "image": (7,)}) as mb:
            with pytest.raises(ValueError, match="expected \\(5,\\)"):
                mb.submit({"audio": np.zeros(6, np.float32),
                           "image": np.zeros(7, np.float32)})
            # good samples co-submitted around the rejection still resolve
            b = _batch(2, seed=17)
            futs = [
                mb.submit({"audio": b["audio"][i], "image": b["image"][i]})
                for i in range(2)
            ]
            for f in futs:
                assert f.result(timeout=30)["preds"].shape == ()

    def test_close_drain_respects_max_batch(self):
        """Requests drained at shutdown are processed in max_batch chunks —
        never one oversized non-bucket batch (which would force a fresh
        compile or a hard shape error on fixed-shape artifacts)."""
        task, variables = _tiny_task()
        pred = Predictor(task, variables)
        seen = []

        def recording(*inputs):
            seen.append(inputs[0].shape[0])
            return pred(*inputs)

        mb = MicroBatcher(recording, task.input_keys, max_batch=4,
                          max_wait_ms=10_000.0)  # worker waits; queue piles up
        b = _batch(10, seed=19)
        futs = [
            mb.submit({"audio": b["audio"][i], "image": b["image"][i]})
            for i in range(10)
        ]
        mb.close()
        for f in futs:
            assert f.result(timeout=30)["preds"].shape == ()
        assert max(seen) <= 4


@pytest.mark.skipif(not REF.exists(), reason="reference configs absent")
def test_predict_cli_on_trained_run(tmp_path, capfd):
    """End-to-end: train a tiny MM-IMDb run, then `mmtpu.cli.predict`
    restores its best checkpoint, writes the predictions JSON (records +
    per-pattern accuracy), and exports a working serving artifact."""
    from _cli_harness import run_cli_inproc
    from generate_reference_golden import make_mmimdb_data, write_tiny_config

    make_mmimdb_data(tmp_path)
    cfg = tmp_path / "mmimdb_tiny.yaml"
    write_tiny_config(
        REF / "configs/mmimdb/centralised/mmimdb_baseline.yaml",
        cfg, tmp_path, epochs=1,
    )
    code = run_cli_inproc("mmtpu.cli.train_multimodal", cfg, run_id="1",
                          cwd=tmp_path, env_extra={"EXP_PATH": str(tmp_path)})
    assert code == 0

    out_json = tmp_path / "preds.json"
    artifact = tmp_path / "mmimdb.mmx"
    code = run_cli_inproc(
        "mmtpu.cli.predict", cfg, run_id="1", cwd=tmp_path,
        env_extra={"EXP_PATH": str(tmp_path)},
        extra=["--out", str(out_json), "--export", str(artifact)],
    )
    assert code == 0

    data = json.loads(out_json.read_text())
    assert data["split"] == "test"
    assert data["checkpoint"] == "best"
    assert data["predictions"], "no prediction records"
    rec = data["predictions"][0]
    assert {"pattern", "pred", "label", "correct"} <= set(rec)
    # mmimdb eval visits the pattern product: multiple patterns recorded
    assert len(data["accuracy_per_pattern"]) >= 2
    for v in data["accuracy_per_pattern"].values():
        assert 0.0 <= v <= 1.0

    served = load_artifact(artifact)
    assert served.meta["multilabel"] is True
    n_img = served.meta["input_shapes"][0][1]
    n_txt = served.meta["input_shapes"][1][1]
    g = np.random.default_rng(0)
    out = served(
        **{
            served.meta["input_keys"][0]:
                g.normal(size=(3, n_img)).astype(np.float32),
            served.meta["input_keys"][1]:
                g.normal(size=(3, n_txt)).astype(np.float32),
        }
    )
    assert out["preds"].shape[0] == 3
    assert set(np.unique(out["preds"])) <= {0, 1}  # multilabel thresholding
