"""CLI surface tests: reference YAMLs drive our entry points unchanged."""

import json
import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF_MONO = Path(
    "/root/reference/MML_Suite/configs/avmnist/mono/train_audio_encoder_resnet.yaml"
)
REF_NORTH_STAR = Path(
    "/root/reference/MML_Suite/configs/avmnist/centralised/"
    "train_avmnist_resnet_pretrained.yaml"
)
REF_CMAM = Path(
    "/root/reference/MML_Suite/configs/mmimdb/centralised/cmams/image_to_text.yaml"
)
REF_SELF_MM = Path(
    "/root/reference/MML_Suite/configs/self-mm/train_self_mm_mosi.yaml"
)
REPO = Path(__file__).resolve().parent.parent

_HAVE_AVMNIST = (REPO / "DATA/avmnist/train_subset.csv").exists()


from _cli_harness import run_cli_inproc as _run_cli_inproc  # noqa: E402


@pytest.mark.skipif(
    not REF_MONO.exists() or not (REPO / "DATA/avmnist/train_subset.csv").exists(),
    reason="reference configs or AVMNIST index not available",
)
def test_reference_mono_config_dry_run(capfd):
    code = _run_cli_inproc("mmtpu.cli.train_monomodal", REF_MONO,
                           extra=["--dry-run"],
                           env_extra={"EXP_PATH": str(REPO)}, cwd=REPO)
    out = capfd.readouterr().out
    assert code == 0
    assert "dry run complete" in out


@pytest.mark.skipif(
    not REF_MONO.exists() or not (REPO / "DATA/avmnist/train_subset.csv").exists(),
    reason="reference configs or AVMNIST index not available",
)
def test_mono_stacked_runs_sweeps_sequentially(capfd):
    """train_monomodal has no stacking engine — --stacked-runs K must run
    the K members sequentially (run_n.sh semantics), never silently train
    one run. train_cmam routes through the same common.run_id_sweep."""
    code = _run_cli_inproc("mmtpu.cli.train_monomodal", REF_MONO,
                           run_id="7",
                           extra=["--dry-run", "--stacked-runs", "2"],
                           env_extra={"EXP_PATH": str(REPO)}, cwd=REPO)
    out = capfd.readouterr().out
    assert code == 0
    assert out.count("dry run complete") == 2
    assert "run 7 (1/2)" in out and "run 8 (2/2)" in out


@pytest.fixture(scope="module")
def _encoder_artifacts():
    """Synthesize the monomodal→multimodal handoff artifacts the north-star
    config points at (encoder_{mod}_best) when no real pretrain run has
    produced them in this workspace, so the dry-run test is hermetic."""
    import jax
    import numpy as np

    from mmtpu.checkpoints.manager import save_pytree
    from mmtpu.models import build_module

    specs = {
        "AVMNIST_Audio_Encoder_Resnet_Pretrain": (
            "audio", "resnet18", 64, (1, 32, 94, 1)),
        "AVMNIST_Image_Encoder_Resnet_Pretrain": (
            "image", "resnet34", 128, (1, 28, 28, 1)),
    }
    for exp_name, (mod, arch, hidden, shape) in specs.items():
        path = (REPO / "experiments_output" / exp_name / "models" / "1"
                / f"encoder_{mod}_best.ckpt")
        if path.exists():
            continue
        path.parent.mkdir(parents=True, exist_ok=True)
        enc = build_module(arch, in_channels=1, hidden_dim=hidden)
        variables = enc.init(
            {"params": jax.random.PRNGKey(0)},
            np.zeros(shape, np.float32), train=False)
        save_pytree(path, {"params": variables["params"],
                           "batch_stats": variables["batch_stats"]})


@pytest.mark.skipif(
    not REF_NORTH_STAR.exists() or not _HAVE_AVMNIST,
    reason="reference configs or AVMNIST index not available",
)
@pytest.mark.parametrize(
    "module", ["mmtpu.cli.train_multimodal", "mmtpu.cli.train_avmnist"]
)
def test_north_star_dry_run(module, _encoder_artifacts, capfd):
    """The north-star multimodal config drives both generic and
    AVMNIST-specialized entry points, including pretrained-encoder loading
    from the round-1 monomodal artifacts (synthesized if absent)."""
    code = _run_cli_inproc(module, REF_NORTH_STAR, run_id="1",
                           extra=["--dry-run"],
                           env_extra={"EXP_PATH": str(REPO)}, cwd=REPO)
    out = capfd.readouterr().out
    assert code == 0
    assert "dry run complete" in out


@pytest.mark.skipif(not REF_CMAM.exists(), reason="reference configs absent")
def test_reference_cmam_dry_run(tmp_path, capfd):
    """train_cmam builds base model + CMAM from a reference CMAM YAML.
    Synthesizes MM-IMDb HDF5 data and the base-model checkpoint the config
    points at (experiments_output/.../best.pth, msgpack pytree)."""
    import h5py

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "DATA" / "mmimdb"
    data_dir.mkdir(parents=True)
    for split, n in (("train", 24), ("validation", 12), ("test", 12)):
        with h5py.File(data_dir / f"{split}.hdf5", "w") as f:
            f["vgg_features"] = rng.normal(size=(n, 4096)).astype(np.float32)
            f["features"] = rng.normal(size=(n, 300)).astype(np.float32)
            f["genres"] = (rng.random((n, 23)) < 0.2).astype(np.float32)
            f["imdb_ids"] = np.arange(n)

    # base-model checkpoint at the config's pretrained_path (run_id=99)
    import jax
    from flax import serialization

    from mmtpu.cli import common
    from mmtpu.config.cmam import CMAMConfig

    os.environ["EXP_PATH"] = str(tmp_path)
    try:
        cfg = CMAMConfig.load(str(REF_CMAM), run_id=99)
        model = common.build_model_from_config(cfg.model)
        img = np.zeros((2, 4096), np.float32)
        txt = np.zeros((2, 300), np.float32)
        variables = model.init(jax.random.PRNGKey(0), img, txt, train=False)
    finally:
        os.environ.pop("EXP_PATH", None)
    ckpt = tmp_path / Path(str(cfg.model.pretrained_path))
    ckpt.parent.mkdir(parents=True, exist_ok=True)
    ckpt.write_bytes(
        serialization.msgpack_serialize(
            {"params": serialization.to_state_dict(variables["params"])}
        )
    )

    code = _run_cli_inproc("mmtpu.cli.train_cmam", REF_CMAM,
                           extra=["--dry-run"],
                           env_extra={"EXP_PATH": str(tmp_path)},
                           cwd=tmp_path)
    out = capfd.readouterr().out
    assert code == 0, out[-500:]
    assert "dry run complete" in out


@pytest.mark.skipif(not REF_SELF_MM.exists(), reason="reference configs absent")
def test_self_mm_reference_config_dry_run(tmp_path, capfd):
    """Self-MM reference config drives the self-mm runner (BERT falls back
    to random init in this zero-egress environment)."""
    rng = np.random.default_rng(0)

    def split(n):
        return {
            "audio": rng.normal(size=(n, 50, 5)).astype(np.float32),
            "vision": rng.normal(size=(n, 50, 20)).astype(np.float32),
            "text": rng.normal(size=(n, 3, 50)).astype(np.float32),
            "classification_labels": rng.integers(0, 3, n),
            "regression_labels": rng.uniform(-3, 3, n).astype(np.float32),
            "audio_lengths": rng.integers(5, 50, n),
            "vision_lengths": rng.integers(5, 50, n),
        }

    mosi = tmp_path / "DATA" / "MOSI"
    mosi.mkdir(parents=True)
    with open(mosi / "aligned_50.pkl", "wb") as f:
        pickle.dump({"train": split(16), "valid": split(8), "test": split(8)}, f)

    code = _run_cli_inproc("mmtpu.cli.train_multimodal", REF_SELF_MM,
                           extra=["--dry-run"],
                           env_extra={"EXP_PATH": str(tmp_path)},
                           cwd=tmp_path)
    out = capfd.readouterr().out
    assert code == 0, out[-500:]
    assert "dry run complete" in out


def test_cross_validation_end_to_end(tmp_path):
    """2-fold CV: per-fold outputs plus reference-schema aggregation of
    every numeric metric (train_multimodal.py:1037-1102)."""
    import shutil

    cfg_src = REPO / "configs/avmnist/synthetic_cv.yaml"
    code = _run_cli_inproc("mmtpu.cli.train_multimodal", cfg_src,
                           run_id="77", cwd=tmp_path,
                           env_extra={"EXP_PATH": str(tmp_path)})
    assert code == 0
    base = tmp_path / "experiments_output/Synthetic_CV/metrics/77"
    assert (base / "fold_1/epoch_metrics.json").exists()
    assert (base / "fold_2/epoch_metrics.json").exists()
    for name in ("train", "validation", "test"):
        agg = json.loads((base / f"{name}_metrics_agg.json").read_text())
        assert len(agg) >= 1
        assert all(isinstance(v, float) for v in agg[0].values())
        assert "loss" in agg[0]
    val = json.loads((base / "validation_metrics_agg.json").read_text())
    assert "accuracy_AI" in val[0]  # every metric, not just loss
    shutil.rmtree(tmp_path / "experiments_output", ignore_errors=True)


@pytest.mark.parametrize(
    "config", ["configs/mosi/synthetic_mmin.yaml",
               "configs/mosi/synthetic_utt_fusion.yaml"]
)
def test_msa_runner_dry_run(config, capfd):
    """MMIN routes through msa_runners; UttFusion through the generic
    driver — both from the multimodal CLI."""
    code = _run_cli_inproc("mmtpu.cli.train_multimodal", REPO / config,
                           extra=["--dry-run"], cwd=REPO)
    out = capfd.readouterr().out
    assert code == 0, out[-500:]
    assert "dry run complete" in out


def test_dual_cmam_cli_dry_run(capfd):
    code = _run_cli_inproc("mmtpu.cli.train_cmam",
                           REPO / "configs/mosi/synthetic_dual_cmam.yaml",
                           extra=["--dry-run"], cwd=REPO)
    out = capfd.readouterr().out
    assert code == 0, out[-500:]
    assert "dry run complete" in out


def test_dryrun_multichip_in_process():
    """The driver-facing multi-chip contract: a full sharded train step on
    an 8-device mesh (conftest provisions 8 virtual CPU devices)."""
    import sys

    sys.path.insert(0, str(REPO))
    try:
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
    finally:
        sys.path.remove(str(REPO))


def test_unknown_flag_rejected():
    r = subprocess.run(
        [sys.executable, "-m", "mmtpu.cli.train_multimodal", "--nope"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode != 0
    assert "--config" in r.stderr or "unrecognized" in r.stderr


def test_numpy_warning_tripwire_promotes_to_errors():
    """The reference hardens three numpy RuntimeWarnings into errors
    (train_multimodal.py:46-60); promote_numpy_warnings is its counterpart,
    installed by every driver via load_config. A NaN/degenerate metric
    computation must fail loudly, not poison epoch metrics."""
    import warnings

    import numpy as np
    import pytest

    from mmtpu.cli import common

    with warnings.catch_warnings():
        common.promote_numpy_warnings()
        with pytest.raises(RuntimeWarning, match="Degrees of freedom"):
            np.std(np.array([]))
        with pytest.raises(RuntimeWarning, match="invalid value"):
            np.array([np.inf]) * np.array([0.0])


def test_epochs_override_flag():
    """--epochs N overrides training.epochs at finalize time (the corpus
    smoke and quick-iteration knob; every driver reads cfg.training.epochs
    after finalize_config)."""
    import argparse

    from mmtpu.cli import common
    from mmtpu.config import StandardMultimodalConfig

    cfg = StandardMultimodalConfig.load(
        str(REPO / "configs/avmnist/multimodal_resnet_scratch.yaml"), run_id=1
    )
    assert cfg.training.epochs != 1
    args = argparse.Namespace(epochs=1, run_id=1)
    common.finalize_config(cfg, args)
    assert cfg.training.epochs == 1


def test_corpus_smoke_routing():
    """The corpus smoke runner picks the same driver a reference user would:
    CMAM configs -> train_cmam, mono -> train_monomodal, avmnist ->
    train_avmnist, everything else -> train_multimodal; pipeline staging
    orders producers before consumers."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import corpus_smoke as cs
    finally:
        sys.path.remove(str(REPO / "scripts"))

    assert cs.route("mmimdb/centralised/cmams/image_to_text.yaml", "x") \
        == "mmtpu.cli.train_cmam"
    assert cs.route("self-mm/train_self_mm_mosi.yaml", "!CMAMConfig") \
        == "mmtpu.cli.train_cmam"
    assert cs.route("avmnist/mono/train_audio_encoder.yaml", "x") \
        == "mmtpu.cli.train_monomodal"
    assert cs.route("avmnist/centralised/train_avmnist.yaml", "x") \
        == "mmtpu.cli.train_avmnist"
    assert cs.route("mosei/centralised/utt_fusion_train_mosei.yaml", "x") \
        == "mmtpu.cli.train_multimodal"

    mono = cs.stage_rank("avmnist/mono/a.yaml", "mmtpu.cli.train_monomodal")
    base = cs.stage_rank("mosei/x/utt_fusion_baseline_train.yaml",
                         "mmtpu.cli.train_multimodal")
    cons = cs.stage_rank("ch3_experiments/mosei/with_missing/mmin_train_25.yaml",
                         "mmtpu.cli.train_multimodal")
    cmam = cs.stage_rank("mosei/centralised/cmams/x.yaml", "mmtpu.cli.train_cmam")
    assert mono < base < cons < cmam


def test_corpus_smoke_transient_detection():
    """Only shared-TPU/tunnel fault signatures earn a retry: backend
    FAILED_PRECONDITION/UNAVAILABLE on host fetches, not timeouts (empty
    tail) or genuine program errors."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import corpus_smoke as cs
    finally:
        sys.path.remove(str(REPO / "scripts"))

    assert cs._is_transient(
        "jax.errors.JaxRuntimeError: FAILED_PRECONDITION: "
        "TPU backend error (FailedPrecondition).")
    assert cs._is_transient("UNAVAILABLE: socket closed")
    assert not cs._is_transient("")  # timeout (rc=-9) has no tail
    assert not cs._is_transient("KeyError: 'audio'\nTraceback ...")


def test_corpus_smoke_pickle_truncation(tmp_path, monkeypatch):
    """Workspace staging slices MOSI/MOSEI pickles to smoke-sized splits,
    replaces a legacy full-data symlink, and is idempotent via the sidecar
    marker (re-truncates only when the source or sizes change)."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import corpus_smoke as cs
    finally:
        sys.path.remove(str(REPO / "scripts"))

    src_root = tmp_path / "repo"
    (src_root / "DATA" / "mosi").mkdir(parents=True)
    full = {
        split: {
            "audio": np.zeros((n, 4, 2), np.float32),
            "classification_labels": np.arange(n),
        }
        for split, n in (("train", 40), ("valid", 30), ("test", 20))
    }
    src = src_root / "DATA" / "mosi" / "aligned_50.pkl"
    with open(src, "wb") as f:
        pickle.dump(full, f)
    monkeypatch.setattr(cs, "REPO", src_root)

    data = tmp_path / "ws" / "DATA"
    data.mkdir(parents=True)
    (data / "mosi").symlink_to(src_root / "DATA" / "mosi")  # legacy layout

    sizes = {"train": 8, "valid": 4, "test": 4}
    cs._truncate_sentiment_pickles(data, "mosi", sizes)
    dst = data / "mosi" / "aligned_50.pkl"
    assert not (data / "mosi").is_symlink()
    with open(dst, "rb") as f:
        small = pickle.load(f)
    assert small["train"]["audio"].shape == (8, 4, 2)
    assert small["valid"]["classification_labels"].shape == (4,)

    # idempotent: marker short-circuits the rewrite
    mtime = dst.stat().st_mtime_ns
    cs._truncate_sentiment_pickles(data, "mosi", sizes)
    assert dst.stat().st_mtime_ns == mtime

    # a regenerated source (new mtime) forces re-truncation
    os.utime(src, None)
    cs._truncate_sentiment_pickles(data, "mosi", sizes)
    assert dst.stat().st_mtime_ns != mtime


def test_corpus_smoke_ensures_source_data(tmp_path, monkeypatch):
    """On a fresh host the synthetic source datasets are absent (gitignored);
    _ensure_source_data runs every generator whose marker doesn't prove
    provenance against the CURRENT generator script, and every mapped
    generator script actually exists. Markers record the generator's
    content hash, so a changed generator (the round-5 ReLU image fix)
    regenerates stale data instead of silently keeping it."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import corpus_smoke as cs
    finally:
        sys.path.remove(str(REPO / "scripts"))

    for _, script in cs.GENERATORS.values():
        assert (REPO / "scripts" / script).exists(), script

    fake_repo = tmp_path / "repo"
    (fake_repo / "scripts").mkdir(parents=True)
    for _, script in cs.GENERATORS.values():
        (fake_repo / "scripts" / script).write_text(f"# gen {script}\n")
    # mosi data present but WITHOUT a marker: provenance unknown -> it is
    # regenerated too (pre-hash grandfathering is unsound once markers
    # carry generator hashes)
    (fake_repo / "DATA" / "mosi").mkdir(parents=True)
    (fake_repo / "DATA" / "mosi" / "unaligned_50.pkl").write_bytes(b"x")
    monkeypatch.setattr(cs, "REPO", fake_repo)

    ran = []
    monkeypatch.setattr(cs.subprocess, "run",
                        lambda cmd, **kw: ran.append(Path(cmd[-1]).name))
    cs._ensure_source_data()
    expected = {script for _, script in cs.GENERATORS.values()}
    assert set(ran) == expected
    # completion markers: written (only after the generator exits 0) with
    # the generator's content hash
    for name in cs.GENERATORS:
        marker = fake_repo / "DATA" / name / f".generated.{name}"
        assert marker.exists()
        assert marker.read_text().startswith("generator:")
    # markers match the current generators -> a rerun runs nothing
    ran.clear()
    cs._ensure_source_data()
    assert ran == []
    # a CHANGED generator invalidates only its own marker
    name, (_, script) = next(iter(cs.GENERATORS.items()))
    (fake_repo / "scripts" / script).write_text("# changed generator\n")
    ran.clear()
    cs._ensure_source_data()
    assert ran == [script]
