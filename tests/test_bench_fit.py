"""bench.py's contention normalization (quiet_rate_fit): the
proportional-share slope fit must recover the quiet-chip rate from
contended windows, converge to the raw rate on a quiet chip, and respect
the MFU-1.0 cap. Pure host-side math — no devices involved."""

import pytest

import bench


def test_quiet_chip_is_identity():
    # chip already quiet: every canary at the quiet value -> fit returns
    # the measured rate itself (no extrapolation)
    rates = [100_000.0] * 4
    canaries = [bench.QUIET_CANARY_TFLOPS] * 4
    out = bench.quiet_rate_fit(rates, canaries, flops=None, B=1024)
    assert out["normalized"] == pytest.approx(100_000.0, rel=1e-12)
    assert out["r2"] == pytest.approx(1.0)
    assert not out["capped"]


def test_contended_windows_extrapolate_proportionally():
    # exact proportional sharing at varying contention levels: the slope
    # fit recovers the underlying quiet rate from ANY mix of windows
    quiet = 250_000.0
    fracs = [0.2, 0.35, 0.5, 0.9]
    canaries = [bench.QUIET_CANARY_TFLOPS * f for f in fracs]
    rates = [quiet * f for f in fracs]
    out = bench.quiet_rate_fit(rates, canaries, flops=None, B=1024)
    assert out["normalized"] == pytest.approx(quiet, rel=1e-9)
    assert out["r2"] == pytest.approx(1.0)


def test_noisy_windows_weight_least_contended():
    # one wildly optimistic low-canary window must not dominate: the
    # c^2-weighted slope keeps the estimate near the high-canary windows'
    # implied quiet rate
    canaries = [10.0, 150.0, 160.0, 170.0]
    rates = [50_000.0, 200_000.0 * 150 / 185, 200_000.0 * 160 / 185,
             200_000.0 * 170 / 185]
    out = bench.quiet_rate_fit(rates, canaries, flops=None, B=1024)
    # unweighted per-window ratios would average in the 925k implied by
    # window 0; the slope fit stays close to 200k
    assert out["normalized"] == pytest.approx(200_000.0, rel=0.05)
    # the outlier window degrades the proportionality evidence and the
    # emitted R^2 must say so
    assert out["r2"] < 0.999


def test_mfu_cap_applies():
    # extrapolation can never exceed the program's MFU-1.0 throughput
    flops = 1e9  # per-batch FLOPs
    B = 1024
    cap = bench.V5E_PEAK_FLOPS * B / flops
    rates = [cap * 0.5]
    canaries = [bench.QUIET_CANARY_TFLOPS * 0.1]  # implies 5x cap
    out = bench.quiet_rate_fit(rates, canaries, flops=flops, B=B)
    assert out["normalized"] == pytest.approx(cap)
    assert out["capped"]
    assert out["uncapped"] == pytest.approx(cap * 5, rel=1e-6)


def test_affine_fit_matches_origin_on_proportional_data():
    quiet = 250_000.0
    fracs = [0.2, 0.4, 0.6, 0.8]
    canaries = [bench.QUIET_CANARY_TFLOPS * f for f in fracs]
    rates = [quiet * f for f in fracs]
    out = bench.affine_rate_fit(rates, canaries, flops=None, B=1024)
    assert out["model"] == "affine"
    assert out["normalized"] == pytest.approx(quiet, rel=1e-9)
    assert out["intercept"] == pytest.approx(0.0, abs=1e-6)


def test_affine_fit_corrects_origin_overshoot_on_concave_data():
    # mixed (non-pure-MXU) step degrades LESS than the canary under
    # contention: rate = a + b*canary with a>0. The origin fit overshoots
    # on quiet extrapolation; the affine fit recovers the truth.
    a, b = 40_000.0, 1_000.0
    canaries = [30.0, 60.0, 90.0, 120.0]
    rates = [a + b * c for c in canaries]
    truth = a + b * bench.QUIET_CANARY_TFLOPS
    affine = bench.affine_rate_fit(rates, canaries, flops=None, B=1024)
    origin = bench.quiet_rate_fit(rates, canaries, flops=None, B=1024)
    assert affine["normalized"] == pytest.approx(truth, rel=1e-9)
    assert origin["normalized"] > truth  # the round-3 failure mode
    assert affine["r2"] == pytest.approx(1.0)


def test_affine_fit_falls_back_without_spread():
    canaries = [50.0, 52.0, 51.0, 50.5]  # spread < 25 TFLOPS
    rates = [100_000.0, 104_000.0, 102_000.0, 101_000.0]
    out = bench.affine_rate_fit(rates, canaries, flops=None, B=1024)
    assert out["model"] == "origin"
    assert out["normalized"] == pytest.approx(
        bench.quiet_rate_fit(rates, canaries, None, 1024)["normalized"]
    )


def test_affine_fit_never_below_best_observed_window():
    # downward-sloping noise must not predict quiet SLOWER than observed
    canaries = [100.0, 150.0, 60.0]
    rates = [200_000.0, 205_000.0, 120_000.0]
    out = bench.affine_rate_fit(rates, canaries, flops=None, B=1024)
    assert out["normalized"] >= 205_000.0


def test_affine_fit_respects_mfu_cap():
    flops, B = 1e9, 1024
    cap = bench.V5E_PEAK_FLOPS * B / flops
    canaries = [30.0, 90.0, 150.0]
    rates = [cap * 0.5, cap * 1.5, cap * 2.5]
    out = bench.affine_rate_fit(rates, canaries, flops=flops, B=B)
    assert out["normalized"] == pytest.approx(cap)
    assert out["capped"]


def test_quiet_captures_picks_best_entry(tmp_path, monkeypatch):
    import json as _json
    import os as _os

    root = tmp_path
    lines = [
        {"ts": "t1", "trigger_canary": 160.0, "rc": 0,
         "bench": {"value": 200000.0, "mfu": 0.7}},
        {"ts": "t2", "trigger_canary": 180.0, "rc": 0,
         "bench": {"value": 280000.0, "mfu": 0.95}},
        {"ts": "t3", "rc": 1, "raw": "crashed"},  # no bench -> skipped
    ]
    with open(root / "QUIET_CAPTURES.jsonl", "w") as f:
        for e in lines:
            f.write(_json.dumps(e) + "\n")
    monkeypatch.setattr(
        _os.path, "dirname", lambda p, _d=_os.path.dirname: str(root)
        if p == bench.__file__ else _d(p),
    )
    out = bench.quiet_captures()
    assert out["value_quiet_observed"] == 280000.0
    assert out["quiet_observed_ts"] == "t2"
    assert out["quiet_observed_trigger_canary"] == 180.0
    assert out["quiet_observed_mfu"] == 0.95


def test_quiet_captures_empty_without_files(tmp_path, monkeypatch):
    import os as _os

    monkeypatch.setattr(
        _os.path, "dirname", lambda p, _d=_os.path.dirname: str(tmp_path)
        if p == bench.__file__ else _d(p),
    )
    assert bench.quiet_captures() == {}


def test_affine_fallback_excludes_calibration_points():
    # natural windows all near one canary (no spread); self-load points at
    # LOW canary with inflated rate/canary ratio. The origin fallback must
    # be fit over the natural windows only — including the calibration
    # points would inflate the extrapolation (the round-3 failure mode).
    nat_rates, nat_canaries = [60_000.0, 61_000.0, 59_500.0], [30.0, 31.0, 30.5]
    cal_rates, cal_canaries = [55_000.0], [20.0]  # ratio 2750 vs natural ~1970
    out = bench.affine_rate_fit(
        nat_rates + cal_rates, nat_canaries + cal_canaries,
        flops=None, B=1024, n_natural=len(nat_rates),
    )
    assert out["model"] == "origin"  # spread 11 < 25
    expected = bench.quiet_rate_fit(nat_rates, nat_canaries, None, 1024)
    assert out["normalized"] == pytest.approx(expected["normalized"])
