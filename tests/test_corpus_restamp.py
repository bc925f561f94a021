"""corpus_restamp: device provenance recovered from each row's own log."""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from corpus_restamp import restamp  # noqa: E402


def _row(**kw):
    base = {"config": "x.yaml", "status": "ok", "log": ""}
    base.update(kw)
    return base


def test_restamp_reads_device_from_log(tmp_path):
    tpu_log = tmp_path / "tpu.log"
    tpu_log.write_text("... Platform 'axon' is experimental ...\nok\n")
    cpu_log = tmp_path / "cpu.log"
    cpu_log.write_text("plain cpu run\n")
    rows = [
        _row(config="a.yaml", log=str(tpu_log)),
        _row(config="b.yaml", log=str(cpu_log)),
        _row(config="c.yaml", status="xfail"),
        _row(config="d.yaml", log=str(tmp_path / "missing.log")),
        _row(config="e.yaml", device="tpu"),  # already stamped: untouched
    ]
    stats = restamp(rows, "r4")
    assert stats == {"tpu": 1, "cpu": 1, "xfail": 1, "missing_log": 1,
                     "already": 1}
    assert rows[0]["device_observed"] == "tpu"
    assert rows[0]["restamped_from_log"] is True
    assert rows[0]["lane"] == "r4-restamp"
    assert rows[1]["device_observed"] == "cpu"
    assert rows[2]["device"].startswith("n/a")
    # missing-log rows stay device-less so --resume re-runs them
    assert "device" not in rows[3]
    assert rows[4] == _row(config="e.yaml", device="tpu")


def test_restamp_roundtrips_through_json(tmp_path):
    log = tmp_path / "a.log"
    log.write_text("Platform 'axon'\n")
    rows = [_row(log=str(log))]
    restamp(rows, "r4")
    assert json.loads(json.dumps(rows))[0]["device"] == "tpu"
