"""Config-system tests: YAML tag surface, pattern generation, funnel kwargs.

The reference's 110 YAML files are the richest behavioral spec in the repo
(SURVEY.md §4); we parse them all directly from the read-only mount.
"""

import yaml

import pytest

from mmtpu.config import (
    DatasetConfig,
    MissingPatternConfig,
    ModalityConfig,
    ModelConfig,
    ModuleSpec,
    StandardMultimodalConfig,
)
from mmtpu.modalities import Modality

NORTH_STAR = (
    "/root/reference/MML_Suite/configs/avmnist/centralised/"
    "train_avmnist_resnet_pretrained.yaml"
)

# Shipped configs whose YAML is structurally broken in the reference too
# (model tag attached to an empty scalar node).
KNOWN_BROKEN_SUBSTRINGS = ()


def test_all_reference_yamls_parse(reference_configs):
    failures = []
    for path in reference_configs:
        try:
            with open(path) as f:
                yaml.safe_load(f)
        except Exception as e:  # noqa: BLE001
            failures.append((path, str(e)))
    assert not failures, failures


def test_north_star_config_fields():
    cfg = StandardMultimodalConfig.load(NORTH_STAR, run_id=7)
    assert cfg.experiment.name == "AVMNIST ResNet Pretrained Training"
    assert cfg.experiment.run_id == 7
    # Encoder tags become ModuleSpecs, not live modules.
    spec = cfg.model.kwargs["audio_encoder"]
    assert isinstance(spec, ModuleSpec)
    assert spec.name == "resnet18"
    assert spec.kwargs == {"in_channels": 1, "hidden_dim": 64}
    assert cfg.model.kwargs["image_encoder"].name == "resnet34"
    # Unknown model keys funnel into kwargs (reference model_config.py:123-145).
    assert cfg.model.kwargs["fusion_fn"] == "concat"
    assert cfg.training.optimizer.name == "Adam"
    assert cfg.training.scheduler == "plateau"
    assert cfg.training.scheduler_args["factor"] == 0.5
    assert "cross_entropy" in cfg.training.loss_functions
    assert cfg.logging.save_metric == "loss"
    # run_id templated into output paths.
    assert cfg.logging.log_path.endswith("/logs/7")


def test_missing_pattern_powerset():
    mp = MissingPatternConfig(
        modalities={
            Modality("audio"): ModalityConfig(missing_rate=0.2, apply_to=["a"]),
            Modality("image"): ModalityConfig(missing_rate=0.0),
        }
    )
    pats = mp.generate_patterns()
    assert set(pats) == {"a", "i", "ai"}
    # apply_to scoping: rate applies in pattern "a" only.
    assert pats["a"][Modality.AUDIO] == pytest.approx(0.8)
    assert pats["ai"][Modality.AUDIO] == pytest.approx(0.8)  # full pattern uses rate
    assert pats["i"][Modality.AUDIO] == 0.0  # absent → always masked
    assert pats["i"][Modality.IMAGE] == 1.0


def test_missing_pattern_no_apply_to_never_applies():
    # Reference quirk (config/data_config.py:33-38): without apply_to the
    # rate does NOT apply to individual patterns, only the full pattern.
    mp = MissingPatternConfig(
        modalities={
            Modality("audio"): ModalityConfig(missing_rate=0.5),
            Modality("image"): ModalityConfig(missing_rate=0.0),
        }
    )
    pats = mp.generate_patterns()
    assert pats["a"][Modality.AUDIO] == 1.0
    assert pats["ai"][Modality.AUDIO] == pytest.approx(0.5)


def test_selected_patterns_sorted_and_filtered():
    mp = MissingPatternConfig(
        modalities={
            Modality("audio"): ModalityConfig(),
            Modality("image"): ModalityConfig(),
        },
        selected_patterns=["ia", "a"],  # unsorted input
    )
    assert mp.selected_patterns == ["ai", "a"]
    assert set(mp.generate_patterns()) == {"a", "ai"}


def test_model_config_funnel():
    cfg = ModelConfig.from_dict(
        {"name": "m", "model_type": "avmnist", "hidden_dim": 128, "extra": 1}
    )
    assert cfg.kwargs == {"hidden_dim": 128, "extra": 1}
    assert cfg.get_param("hidden_dim") == 128
    assert cfg.get_param("model_type") == "avmnist"


def test_dataset_config_env_expansion(monkeypatch, tmp_path):
    monkeypatch.setenv("MY_TEST_PATH", str(tmp_path))
    cfg = DatasetConfig.from_dict(
        {
            "dataset": "AVMNIST",
            "data_fp": "$MY_TEST_PATH/x.csv",
            "split": "train",
            "target_modality": "multimodal",
        }
    )
    assert cfg.data_fp == f"{tmp_path}/x.csv"
    assert cfg.target_modality == Modality.MULTIMODAL


def test_modality_identity():
    assert Modality("audio") is Modality.AUDIO
    assert str(Modality.AUDIO) == "audio"
    assert f"{Modality.AUDIO}_original" == "audio_original"
    assert Modality.from_str("IMAGE") is Modality.IMAGE
