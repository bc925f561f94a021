from mmtpu.train.losses import (
    LossFunctionGroup,
    WeightedLossTerm,
    register_criterion,
    resolve_criterion,
)

__all__ = [
    "LossFunctionGroup",
    "WeightedLossTerm",
    "register_criterion",
    "resolve_criterion",
]
