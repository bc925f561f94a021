"""HTTP serving endpoint (mmtpu.cli.serve): request/response contract,
concurrent micro-batching through the server, and error surfaces."""

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from mmtpu.cli.serve import ServerThread
from mmtpu.serving import Predictor, export_task, load_artifact

from test_serving import _batch, _tiny_task  # reuse the tiny fusion model


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def served_url(tmp_path_factory):
    """Server thread over an exported artifact (the deployment path)."""
    task, variables = _tiny_task()
    path = tmp_path_factory.mktemp("serve") / "tiny.mmx"
    export_task(task, variables, _batch(2), path, platforms=("cpu",))
    served = load_artifact(path)
    with ServerThread(served, dict(served.meta), max_batch=8,
                      max_wait_ms=20.0) as st:
        yield st.url, task, variables


class TestEndpoints:
    def test_health_and_meta(self, served_url):
        url, task, _ = served_url
        assert _get(f"{url}/health")["status"] == "ok"
        meta = _get(f"{url}/meta")
        assert meta["input_keys"] == ["audio", "image"]
        assert meta["input_dtypes"] == ["float32", "float32"]

    def test_predict_single_sample(self, served_url):
        url, task, variables = served_url
        b = _batch(1, seed=11)
        out = _post(f"{url}/predict", {
            "audio": b["audio"][0].tolist(),
            "image": b["image"][0].tolist(),
        })
        want = Predictor(task, variables)(
            audio=b["audio"], image=b["image"]
        )
        assert out["preds"] == int(want["preds"][0])
        np.testing.assert_allclose(
            out["logits"], want["logits"][0], rtol=1e-5, atol=1e-6
        )

    def test_predict_batch_endpoint(self, served_url):
        url, task, variables = served_url
        b = _batch(5, seed=12)
        out = _post(f"{url}/predict_batch", {
            "audio": b["audio"].tolist(), "image": b["image"].tolist(),
        })
        want = Predictor(task, variables)(audio=b["audio"], image=b["image"])
        np.testing.assert_array_equal(out["preds"], want["preds"])

    def test_concurrent_requests_get_microbatched(self, served_url):
        url, task, variables = served_url
        n = 12
        b = _batch(n, seed=13)
        want = Predictor(task, variables)(audio=b["audio"], image=b["image"])
        before = _get(f"{url}/stats")
        results = {}

        def client(i):
            results[i] = _post(f"{url}/predict", {
                "audio": b["audio"][i].tolist(),
                "image": b["image"][i].tolist(),
            })

        threads = [threading.Thread(target=client, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(n):
            assert results[i]["preds"] == int(want["preds"][i])
        after = _get(f"{url}/stats")
        served = after["requests"] - before["requests"]
        batches = after["batches"] - before["batches"]
        assert served == n
        assert batches < n  # grouping actually happened

    def test_missing_input_is_400(self, served_url):
        url, _, _ = served_url
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{url}/predict", {"audio": [0.0] * 5})
        assert e.value.code == 400
        assert "image" in json.loads(e.value.read())["error"]

    def test_unknown_path_is_404(self, served_url):
        url, _, _ = served_url
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{url}/nope")
        assert e.value.code == 404


def test_server_over_in_process_predictor():
    """Config-mode serving uses a Predictor instead of an artifact."""
    task, variables = _tiny_task()
    pred = Predictor(task, variables)
    meta = {
        "input_keys": list(pred.input_keys),
        "input_dtypes": ["float32", "float32"],
        "model": "TinyFusion",
    }
    b = _batch(3, seed=14)
    with ServerThread(pred, meta, max_batch=4, max_wait_ms=5.0) as st:
        out = _post(f"{st.url}/predict_batch", {
            "audio": b["audio"].tolist(), "image": b["image"].tolist(),
        })
    want = pred(audio=b["audio"], image=b["image"])
    np.testing.assert_array_equal(out["preds"], want["preds"])


def test_serve_cli_dry_run(tmp_path, capfd):
    """--artifact --dry-run builds, binds, prints the address, exits 0."""
    from mmtpu.cli import serve as serve_cli

    task, variables = _tiny_task()
    path = tmp_path / "tiny.mmx"
    export_task(task, variables, _batch(2), path, platforms=("cpu",))
    code = serve_cli.main(["--artifact", str(path), "--port", "0",
                           "--dry-run"])
    out = capfd.readouterr().out
    assert code == 0
    assert "serving" in out and "http://" in out
