"""Stacked runs (mmtpu/train/stacked.py): K models in one compiled program
must be bit-identical to K separate runs — vmap is a batching transform,
not an approximation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtpu.config.optim import OptimizerConfig
from mmtpu.models import build_module
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.optim import build_optimizer
from mmtpu.train.stacked import (
    StackedLoaderGroup,
    make_stacked_eval_step,
    make_stacked_train_step,
    stack_batches,
    stack_states,
    stacked_rngs,
    unstack_states,
)
from mmtpu.train.state import TrainState
from mmtpu.train.step import ClassificationTask, make_train_step

K = 3


def build_runs(k: int):
    """One model/task/optimizer (the run_n / CV setting: same config),
    k differently-seeded parameter sets. States share tx/apply_fn — the
    static pytree aux data must be identical for stacking."""
    model = build_module(
        "fcclassifier", input_dim=12, layers=[16], output_dim=4, dropout=0.0
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("x",),
    )
    params0 = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 12)))["params"]
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-2}), params0
    )
    states = []
    for seed in range(k):
        params = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((2, 12))
        )["params"]
        states.append(TrainState.create(
            apply_fn=model.apply, params=params, tx=tx, batch_stats={}
        ))
    return states, task


def make_batch(seed: int, B=16):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 4, B)
    return {
        "x": (rng.normal(size=(B, 12)) + labels[:, None]).astype(np.float32),
        "labels": labels,
    }


def test_stacked_step_matches_separate_runs():
    states, task = build_runs(K)
    batches = [make_batch(100 + s) for s in range(K)]
    rng = jax.random.PRNGKey(7)
    rngs = stacked_rngs(rng, K)

    # separate runs, 3 steps each
    sep_step = make_train_step(task, donate=False)
    sep_states, sep_losses = list(states), []
    for s in range(K):
        st = sep_states[s]
        for t in range(3):
            st, out = sep_step(
                st, jax.device_put(batches[s]), jax.random.fold_in(rngs[s], t)
            )
        sep_states[s] = st
        sep_losses.append(float(out["loss"]))

    # one stacked program, 3 steps
    stacked = stack_states(states)
    sbatch = stack_batches(batches)
    sstep = make_stacked_train_step(task, donate=False)
    for t in range(3):
        step_rngs = jnp.stack(
            [jax.random.fold_in(rngs[s], t) for s in range(K)]
        )
        stacked, souts = sstep(stacked, sbatch, step_rngs)

    np.testing.assert_allclose(
        np.asarray(souts["loss"]), np.asarray(sep_losses), rtol=1e-6
    )
    for s, st in enumerate(unstack_states(stacked, K)):
        a = jax.tree_util.tree_leaves(jax.device_get(st.params))
        b = jax.tree_util.tree_leaves(jax.device_get(sep_states[s].params))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-7)


def test_stacked_eval_matches_separate():
    states, task = build_runs(K)
    batches = [make_batch(200 + s) for s in range(K)]
    from mmtpu.train.step import make_eval_step

    sep = [
        make_eval_step(task)(states[s], jax.device_put(batches[s]))
        for s in range(K)
    ]
    stacked_out = make_stacked_eval_step(task)(
        stack_states(states), stack_batches(batches)
    )
    for s in range(K):
        np.testing.assert_array_equal(
            np.asarray(stacked_out["preds"][s]), np.asarray(sep[s]["preds"])
        )


def test_loader_group_pads_exhausted_folds():
    from mmtpu.data.avmnist import SyntheticAVMNIST
    from mmtpu.data.loader import BatchLoader

    loaders = [
        BatchLoader(
            SyntheticAVMNIST(split="train", num_samples=n,
                             selected_patterns=["ai"], seed=s),
            16, prefetch=0,
        )
        for s, n in enumerate((48, 32))  # 3 steps vs 2 steps
    ]
    group = StackedLoaderGroup(loaders)
    assert len(group) == 3
    steps = list(group)
    assert len(steps) == 3
    # fold 1's third step is padding: sample_mask all zero
    last = steps[-1]
    assert float(np.asarray(last["sample_mask"][1]).sum()) == 0.0
    assert float(np.asarray(last["sample_mask"][0]).sum()) > 0.0
    # static shapes across steps
    assert all(
        np.asarray(s["labels"]).shape == (2, 16) for s in steps
    )


def test_stacked_cv_cli_matches_sequential(tmp_path):
    """--stacked-folds must reproduce sequential CV: same per-fold epoch
    losses (early stopping off, same seeds) and the same aggregate files."""
    import json
    from pathlib import Path

    from _cli_harness import run_cli_inproc

    REPO = Path(__file__).resolve().parent.parent
    cfg = REPO / "configs/avmnist/synthetic_cv.yaml"

    def run(workdir, extra=()):
        workdir.mkdir(exist_ok=True)
        code = run_cli_inproc("mmtpu.cli.train_multimodal", cfg, run_id="1",
                              extra=list(extra), cwd=workdir,
                              env_extra={"EXP_PATH": str(workdir)})
        assert code == 0
        base = next(workdir.glob("experiments_output/*/metrics/1"))
        return base

    seq = run(tmp_path / "seq")
    stk = run(tmp_path / "stk", extra=["--stacked-folds"])

    for fold in (1, 2):
        a = json.loads((seq / f"fold_{fold}/epoch_metrics.json").read_text())
        b = json.loads((stk / f"fold_{fold}/epoch_metrics.json").read_text())
        la = [e["train"]["loss"] for e in a if "train" in e]
        lb = [e["train"]["loss"] for e in b if "train" in e]
        assert len(la) == len(lb) >= 2
        np.testing.assert_allclose(la, lb, rtol=1e-4)
    agg_a = json.loads((seq / "validation_metrics_agg.json").read_text())
    agg_b = json.loads((stk / "validation_metrics_agg.json").read_text())
    assert len(agg_a) == len(agg_b)
    assert set(agg_a[0]) == set(agg_b[0])
    for ka in agg_a[0]:
        np.testing.assert_allclose(agg_a[0][ka], agg_b[0][ka], rtol=1e-3,
                                   atol=1e-6)


def test_padding_steps_leave_fold_state_untouched():
    """A lockstep step where a fold's sample_mask is all zero must not move
    that fold's params, optimizer state (Adam momentum!), BN stats, or step
    counter — otherwise stacked CV with unequal fold lengths diverges from
    separate sequential runs."""
    states, task = build_runs(2)
    stacked = stack_states(states)
    sstep = make_stacked_train_step(task, donate=False)
    b0, b1 = make_batch(7), make_batch(8)
    b0["sample_mask"] = np.ones(16, np.float32)
    b1["sample_mask"] = np.ones(16, np.float32)
    rngs = stacked_rngs(jax.random.PRNGKey(0), 2)

    # one live step for both folds, then a step where fold 1 is padding
    stacked, _ = sstep(stacked, stack_batches([b0, b1]), rngs)
    before = unstack_states(stacked, 2)[1]
    b1_dead = dict(b1)
    b1_dead["sample_mask"] = np.zeros(16, np.float32)
    stacked, _ = sstep(stacked, stack_batches([b0, b1_dead]), rngs)
    after_live, after_dead = unstack_states(stacked, 2)

    # fold 0 moved...
    moved = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            unstack_states(stack_states(states), 2)[0].params,
            after_live.params,
        )
    )
    assert any(m > 0 for m in moved)
    # ...fold 1 did not (params, opt_state, step — exact equality)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(before)),
                    jax.tree_util.tree_leaves(jax.device_get(after_dead))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_empty_fold_raises_clear_error():
    """A fold whose split yields zero batches must fail loudly by name,
    not crash with TypeError deep in lockstep iteration."""
    from mmtpu.train.stacked import StackedLoaderGroup

    class Empty:
        def __len__(self):
            return 0

        def __iter__(self):
            return iter(())

    class One:
        def __len__(self):
            return 1

        def __iter__(self):
            yield {"labels": np.zeros(4, np.int32)}

    group = StackedLoaderGroup([One(), Empty()])
    with pytest.raises(ValueError, match="stacked run 1"):
        list(group)


class _Recorder:
    def __init__(self):
        self.calls = []

    def __call__(self, name):
        def fn(cfg, args, **kw):
            self.calls.append((name, kw))
            return 0

        return fn


def _route_cfg(cv=3, dp=None, model_type="avmnist"):
    from types import SimpleNamespace

    return SimpleNamespace(
        experiment=SimpleNamespace(cross_validation=cv, data_parallel=dp),
        model=SimpleNamespace(model_type=model_type),
    )


def test_route_stacked_with_dp_falls_back_to_sequential(monkeypatch):
    """--stacked-folds + data_parallel: the mesh wins — sequential CV runs
    (the stacked engine is a single-device program)."""
    from types import SimpleNamespace

    from mmtpu.cli import train_multimodal as tm

    rec = _Recorder()
    monkeypatch.setattr(tm, "main_cross_validation", rec("sequential"))
    args = SimpleNamespace(stacked_folds=True, data_parallel=2)
    assert tm.route(_route_cfg(dp=None), args) == 0
    assert rec.calls == [("sequential", {"json_nesting": "reference"})]


def test_route_stacked_with_resume_falls_back_to_sequential(monkeypatch):
    """--stacked-folds + --resume: continuation wins — sequential CV runs
    (the stacked engine has no mid-run resume point), instead of silently
    restarting every fold from scratch."""
    from types import SimpleNamespace

    from mmtpu.cli import train_multimodal as tm

    rec = _Recorder()
    monkeypatch.setattr(tm, "main_cross_validation", rec("sequential"))
    args = SimpleNamespace(stacked_folds=True, data_parallel=None, resume=True)
    assert tm.route(_route_cfg(dp=None), args) == 0
    assert rec.calls == [("sequential", {"json_nesting": "reference"})]


def test_route_stacked_no_dp_uses_stacked_engine(monkeypatch):
    from types import SimpleNamespace

    from mmtpu.cli import stacked_cv
    from mmtpu.cli import train_multimodal as tm

    rec = _Recorder()
    monkeypatch.setattr(stacked_cv, "run", rec("stacked"))
    args = SimpleNamespace(stacked_folds=True, data_parallel=None)
    assert tm.route(_route_cfg(dp=None), args, json_nesting="avmnist") == 0
    assert rec.calls == [("stacked", {"json_nesting": "avmnist"})]


def test_route_stacked_runs_uses_repeat_engine(monkeypatch):
    """--stacked-runs K (no CV) dispatches to the stacked repeat engine."""
    from types import SimpleNamespace

    from mmtpu.cli import stacked_cv
    from mmtpu.cli import train_multimodal as tm

    calls = []
    monkeypatch.setattr(
        stacked_cv, "run_repeat",
        lambda args, json_nesting: calls.append(json_nesting) or 0,
    )
    args = SimpleNamespace(stacked_runs=3, data_parallel=None)
    assert tm.route(_route_cfg(cv=0), args, json_nesting="avmnist") == 0
    assert calls == ["avmnist"]


def test_route_stacked_runs_dp_falls_back_to_sequential(monkeypatch):
    """--stacked-runs + data_parallel: the mesh wins — each run trains
    sequentially on the mesh instead of single-device stacked."""
    from types import SimpleNamespace

    from mmtpu.cli import train_multimodal as tm

    calls = []
    monkeypatch.setattr(
        tm, "sequential_runs",
        lambda args, runs, json_nesting: calls.append(runs) or 0,
    )
    args = SimpleNamespace(stacked_runs=3, data_parallel=2)
    assert tm.route(_route_cfg(cv=0), args) == 0
    assert calls == [3]


def test_route_stacked_runs_with_cv_falls_back_to_sequential(monkeypatch):
    """--stacked-runs with a CV config: no stacking engine exists (the vmap
    axis is folds), but the K requested repeats must still run — route
    falls back to sequential_runs(K) instead of dropping K-1 runs."""
    from types import SimpleNamespace

    from mmtpu.cli import train_multimodal as tm

    calls = []
    monkeypatch.setattr(
        tm, "sequential_runs",
        lambda args, runs, json_nesting="reference": calls.append(runs) or 0,
    )
    args = SimpleNamespace(stacked_runs=2, stacked_folds=False,
                           data_parallel=None)
    assert tm.route(_route_cfg(cv=2), args) == 0
    assert calls == [2]


def test_sequential_runs_derive_members_like_stacked_engine(monkeypatch):
    """sequential_runs and run_id_sweep both derive members through
    common.derive_member_args: run_id base+i, seed_offset i (applied by
    finalize_config), stacking disarmed — the single recipe the stacked
    engine also uses."""
    from types import SimpleNamespace

    from mmtpu.cli import common as cli_common
    from mmtpu.cli import train_multimodal as tm

    base = SimpleNamespace(run_id=3, stacked_runs=2, config="x.yaml")
    seen = []

    def fake_load(sub):
        seen.append((sub.run_id, sub.seed_offset, sub.stacked_runs))
        return _route_cfg(cv=0)

    monkeypatch.setattr(cli_common, "load_config", fake_load)
    monkeypatch.setattr(tm, "route", lambda cfg, sub, json_nesting: 0)
    assert tm.sequential_runs(base, 2) == 0
    assert seen == [(3, 0, 0), (4, 1, 0)]

    # run_id_sweep (train_monomodal/train_cmam's fallback): same recipe
    swept = []
    rc = cli_common.run_id_sweep(
        base, lambda sub: swept.append(
            (sub.run_id, sub.seed_offset, sub.stacked_runs)) or 0
    )
    assert rc == 0
    assert swept == [(3, 0, 0), (4, 1, 0)]


def test_finalize_config_applies_seed_offset(tmp_path):
    """Member i's seed = config seed + i, applied centrally so BOTH config
    loaders (standard and CMAM) honor the sweep recipe."""
    from types import SimpleNamespace

    from mmtpu.cli import common as cli_common

    cfg = _route_cfg(cv=0)
    cfg.experiment.seed = 10
    cfg.logging = SimpleNamespace(
        create_directories=lambda: None, log_path=str(tmp_path),
    )
    args = SimpleNamespace(run_id=1, seed=None, seed_offset=3)
    out = cli_common.finalize_config(cfg, args)
    assert out.experiment.seed == 13


def test_stacked_runs_cli_matches_sequential(tmp_path):
    """--stacked-runs 2 must be bit-comparable to invoking the driver twice
    with --run_id 1 (base seed) and --run_id 2 --seed base+1: same per-run
    epoch losses and the same run_id-scoped output layout."""
    import json
    from pathlib import Path

    from _cli_harness import run_cli_inproc

    REPO = Path(__file__).resolve().parent.parent
    cfg = REPO / "configs/avmnist/synthetic_runs.yaml"

    def run(workdir, run_id, extra=()):
        workdir.mkdir(exist_ok=True)
        code = run_cli_inproc("mmtpu.cli.train_multimodal", cfg,
                              run_id=run_id, extra=list(extra), cwd=workdir,
                              env_extra={"EXP_PATH": str(workdir)})
        assert code == 0
        return workdir / "experiments_output/Synthetic_Runs/metrics"

    # sequential equivalents: run 1 at the config seed, run 2 at seed+1
    seq = run(tmp_path / "seq", "1")
    run(tmp_path / "seq", "2", extra=["--seed", "12"])
    stk = run(tmp_path / "stk", "1", extra=["--stacked-runs", "2"])

    for rid in (1, 2):
        a = json.loads((seq / str(rid) / "epoch_metrics.json").read_text())
        b = json.loads((stk / str(rid) / "epoch_metrics.json").read_text())
        la = [e["train"]["loss"] for e in a if "train" in e]
        lb = [e["train"]["loss"] for e in b if "train" in e]
        assert len(la) == len(lb) == 2
        np.testing.assert_allclose(la, lb, rtol=1e-4)
        ta = [e["test"]["loss"] for e in a if "test" in e]
        tb = [e["test"]["loss"] for e in b if "test" in e]
        np.testing.assert_allclose(ta, tb, rtol=1e-4)
    # the two members trained on different seeds — losses must differ
    l1 = json.loads((stk / "1" / "epoch_metrics.json").read_text())
    l2 = json.loads((stk / "2" / "epoch_metrics.json").read_text())
    assert l1[0]["train"]["loss"] != l2[0]["train"]["loss"]
