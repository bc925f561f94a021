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


def test_displacement_recovers_known_share():
    # synthetic chip at share (1-sigma)=0.25, quiet step time 4 ms:
    # W_plain = S*T_step/share; W_mixed adds m*t_mm/share
    S, B, m = 60, 1024, 60
    share = 0.25
    t_step = 0.004
    w_plain = S * t_step / share
    w_mixed = w_plain + m * bench.T_MM_DEV_S / share
    out = bench.displacement_estimate(
        [(w_plain, w_mixed)] * 3, m, S, B, flops=None)
    assert out["model"] == "displacement"
    assert out["share_median"] == pytest.approx(share, rel=1e-9)
    assert out["normalized"] == pytest.approx(B / t_step, rel=1e-9)
    assert not out["capped"]


def test_displacement_is_m_invariant():
    # same chip, different injected counts -> identical estimates (the
    # property contention_study2.py verified on the real chip to 0.3%)
    S, B = 60, 1024
    share, t_step = 0.2, 0.005
    outs = []
    for m in (30, 60, 120):
        w_plain = S * t_step / share
        w_mixed = w_plain + m * bench.T_MM_DEV_S / share
        outs.append(bench.displacement_estimate(
            [(w_plain, w_mixed)], m, S, B, flops=None))
    vals = [o["normalized"] for o in outs]
    assert max(vals) == pytest.approx(min(vals), rel=1e-9)


def test_displacement_drops_degenerate_pairs():
    # a co-tenant burst during the plain window can make w_mixed <= w_plain
    # or imply share > 1; both pairs must be dropped, and with none left
    # the estimator returns None (caller falls back to the origin fit)
    S, B, m = 60, 1024, 60
    assert bench.displacement_estimate([(2.0, 1.9)], m, S, B, None) is None
    # share > 1: w_mixed - w_plain smaller than the matmuls' device time
    too_fast = (1.0, 1.0 + 0.5 * m * bench.T_MM_DEV_S)
    assert bench.displacement_estimate([too_fast], m, S, B, None) is None
    # a good pair among bad ones survives
    share, t_step = 0.5, 0.004
    good = (S * t_step / share,
            S * t_step / share + m * bench.T_MM_DEV_S / share)
    out = bench.displacement_estimate(
        [(2.0, 1.9), good], m, S, B, flops=None)
    assert out["share_median"] == pytest.approx(share, rel=1e-9)


def test_displacement_never_below_best_observed_window():
    # co-tenant busy during the plain calibration windows but quiet during
    # the natural windows: the estimate must not come out below a rate
    # actually measured this run
    S, B, m = 60, 1024, 60
    share, t_step = 0.9, 0.01  # slow plain window, near-full share
    w_plain = S * t_step / share
    w_mixed = w_plain + m * bench.T_MM_DEV_S / share
    best_raw = 2 * B / t_step  # raw window measured far faster
    out = bench.displacement_estimate(
        [(w_plain, w_mixed)], m, S, B, flops=None, floor=best_raw)
    assert out["normalized"] == best_raw


def test_displacement_divides_by_n_chips():
    # measure()'s window rates are per-chip; the displacement estimate
    # must be in the same units on a multi-device host
    S, B, m = 60, 1024, 60
    share, t_step = 0.25, 0.004
    w_plain = S * t_step / share
    w_mixed = w_plain + m * bench.T_MM_DEV_S / share
    one = bench.displacement_estimate([(w_plain, w_mixed)], m, S, B, None)
    four = bench.displacement_estimate([(w_plain, w_mixed)], m, S, B, None,
                                       n_chips=4)
    assert four["normalized"] == pytest.approx(one["normalized"] / 4)


def test_displacement_respects_mfu_cap():
    flops, B, S, m = 1e9, 1024, 60, 60
    cap = bench.V5E_PEAK_FLOPS * B / flops
    # implied quiet rate 2x the cap -> capped, flagged
    share = 0.5
    t_step = B / (2 * cap)
    w_plain = S * t_step / share
    w_mixed = w_plain + m * bench.T_MM_DEV_S / share
    out = bench.displacement_estimate([(w_plain, w_mixed)], m, S, B, flops)
    assert out["normalized"] == pytest.approx(cap)
    assert out["capped"]
    assert out["uncapped"] == pytest.approx(2 * cap, rel=1e-9)


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


def test_quiet_captures_skips_mismatched_config(tmp_path, monkeypatch):
    # a capture recorded under a different batch/precision is not evidence
    # for the current headline config and must be skipped
    import json as _json
    import os as _os

    lines = [
        {"ts": "t1", "rc": 0,
         "bench": {"value": 999999.0, "mfu": 0.99,
                   "batch": bench.DEFAULT_BATCH // 2,
                   "precision": bench.DEFAULT_PRECISION}},
        {"ts": "t2", "rc": 0,
         "bench": {"value": 888888.0, "mfu": 0.98,
                   "batch": bench.DEFAULT_BATCH, "precision": "f32"}},
        {"ts": "t3", "rc": 0,
         "bench": {"value": 250000.0, "mfu": 0.9,
                   "batch": bench.DEFAULT_BATCH,
                   "precision": bench.DEFAULT_PRECISION}},
    ]
    with open(tmp_path / "QUIET_CAPTURES.jsonl", "w") as f:
        for e in lines:
            f.write(_json.dumps(e) + "\n")
    monkeypatch.setattr(
        _os.path, "dirname", lambda p, _d=_os.path.dirname: str(tmp_path)
        if p == bench.__file__ else _d(p),
    )
    out = bench.quiet_captures()
    assert out["value_quiet_observed"] == 250000.0
    assert out["quiet_observed_ts"] == "t3"


def test_quiet_captures_empty_without_files(tmp_path, monkeypatch):
    import os as _os

    monkeypatch.setattr(
        _os.path, "dirname", lambda p, _d=_os.path.dirname: str(tmp_path)
        if p == bench.__file__ else _d(p),
    )
    assert bench.quiet_captures() == {}
