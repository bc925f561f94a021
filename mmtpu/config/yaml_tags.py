"""YAML tag registry — the full `!Tag` surface of the reference configs.

Reference: config/yaml_constructors.py:37-207 registers ~45 tags on
yaml.SafeLoader; model tags there construct live torch modules during
parsing. Here, config tags construct config dataclasses and **model tags
construct ModuleSpecs** (deferred, parameter-free) — same YAML files, no
eager parameter allocation (see mmtpu/config/spec.py).

Importing this module registers everything (idempotent).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import yaml

from mmtpu.config.data import DataConfig, DatasetConfig, MissingPatternConfig, ModalityConfig
from mmtpu.config.metrics import MetricConfig
from mmtpu.config.model import ModelConfig
from mmtpu.config.optim import OptimizerConfig, ParameterGroupConfig
from mmtpu.config.spec import ModuleSpec
from mmtpu.modalities import add_modality
from mmtpu.train.losses import LossFunctionGroup

_registered = False


def _mapping_constructor(fn: Callable[[Dict[str, Any]], Any]):
    def constructor(loader: yaml.SafeLoader, node: yaml.Node) -> Any:
        data = loader.construct_mapping(node, deep=True)
        return fn(data)

    return constructor


def _register_config(tag: str, cls, from_dict: bool = True) -> None:
    yaml.SafeLoader.add_constructor(
        tag,
        _mapping_constructor(cls.from_dict if from_dict else (lambda d: cls(**d))),
    )


def _register_passthrough(tag: str) -> None:
    """Tag resolves to the plain mapping; assembly happens in load()."""
    yaml.SafeLoader.add_constructor(tag, _mapping_constructor(dict))


def _register_spec(tag: str, spec_name: str) -> None:
    # Tolerates empty scalar nodes (4 shipped reference configs attach a
    # model tag to an empty scalar; the reference loader crashes on them).
    def constructor(loader: yaml.SafeLoader, node: yaml.Node, n=spec_name):
        if isinstance(node, yaml.MappingNode):
            return ModuleSpec(n, loader.construct_mapping(node, deep=True))
        return ModuleSpec(n, {})

    yaml.SafeLoader.add_constructor(tag, constructor)


# Registry-name map for every model tag in the reference surface.
MODEL_TAGS: Dict[str, str] = {
    "!MNISTAudio": "mnist_audio",
    "!MNISTImage": "mnist_image",
    "!ConvBlock": "conv_block",
    "!ConvBlockArgs": "conv_block_args",
    "!ResNet18": "resnet18",
    "!ResNet34": "resnet34",
    "!ResNet50": "resnet50",
    "!ResNetEncoder": "resnetencoder",
    "!LeNet5": "lenet5",
    "!LeNet5Enhanced": "lenet5enhanced",
    "!LeNetEncoder": "lenetencoder",
    "!FcEncoder": "fcencoder",
    "!FcClassifier": "fcclassifier",
    "!LSTMEncoder": "lstmencoder",
    "!TextCNN": "textcnn",
    "!Transformer": "transformer",
    "!ResidualAE": "residual_ae",
    "!ResidualXE": "residual_xe",
    "!UttFusionModel": "utt_fusion",
    "!Self_MM": "self_mm",
    "!AuViSubNet": "auvi_subnet",
    "!BertTextEncoder": "bert_text_encoder",
    "!MMIMDb": "mmimdb",
    "!MMIMDbModalityEncoder": "mmimdb_modality_encoder",
    "!MLPGenreClassifier": "mlp_genre_classifier",
    "!MaxOut": "maxout",
    "!GatedBiModalNetwork": "gated_bimodal",
    "!MultimodalPooling": "multimodal_pooling",
    "!KineticsSoundsAudioEncoder": "kinetics_sounds_audio_encoder",
    "!KineticsSoundsVideoEncoder": "kinetics_sounds_video_encoder",
    "!AssociationNetwork": "association_network",
    "!InputEncoders": "input_encoders",
    "!FeatureManager": "feature_manager",
    "!CenterManager": "center_manager",
    "!LabelManager": "label_manager",
}


def register_all() -> None:
    global _registered
    if _registered:
        return

    # -- scalar tags -------------------------------------------------------
    def modality_constructor(loader: yaml.SafeLoader, node: yaml.Node):
        return add_modality(loader.construct_scalar(node))

    yaml.SafeLoader.add_constructor("!Modality", modality_constructor)

    # -- config tags -------------------------------------------------------
    _register_config("!DatasetConfig", DatasetConfig)
    _register_config("!DataConfig", DataConfig)
    _register_config("!MetricConfig", MetricConfig)
    _register_config("!Optimizer", OptimizerConfig)
    _register_config("!ParameterGroupConfig", ParameterGroupConfig)
    _register_config("!LossFunctionGroup", LossFunctionGroup)
    _register_config("!ModelConfig", ModelConfig)
    _register_config("!MissingPatternConfig", MissingPatternConfig, from_dict=False)
    _register_config("!ModalityConfig", ModalityConfig, from_dict=False)

    # Assembled in StandardMultimodalConfig.load with run_id context:
    _register_passthrough("!ExperimentConfig")
    _register_passthrough("!LoggingConfig")
    _register_passthrough("!StandardConfig")
    _register_passthrough("!CMAMConfig")

    # -- model tags → ModuleSpec --------------------------------------------
    for tag, name in MODEL_TAGS.items():
        _register_spec(tag, name)

    _registered = True


register_all()
