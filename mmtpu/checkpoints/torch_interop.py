"""PyTorch `.pth` → Flax pytree reader.

Ingests the reference's shipped encoder checkpoints (wheights/avmnist/*,
and any `encoder_{modality}_best.pth` produced by the reference trainers) so
pretrained-encoder loading (reference train_multimodal.py:156-204)
reproduces the published accuracy deltas from existing weights.

Layout conversions (SURVEY.md §7 hard-part 5):
- Conv2d weight (O,I,kH,kW)  → NHWC kernel (kH,kW,I,O)
- Linear weight (O,I)        → kernel (I,O)
- BatchNorm weight/bias      → scale/bias; running_mean/var → batch_stats

Name translation handles the reference's module layouts (ResNetEncoder,
MNISTAudio/Image Sequential indices, LeNet); unresolved leaves fall back to
unique-shape matching and otherwise keep their initialized values (reported).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from mmtpu.utils.logging import get_logger

logger = get_logger()

_NAME_RULES: List[Tuple[str, str]] = [
    ("downsample_conv", "downsample.0"),
    ("downsample_bn", "downsample.1"),
    ("block_one/conv_1", "net.0.conv_one"),
    ("block_one/conv_2", "net.0.conv_two"),
    ("block_one/bn_1", "net.0.batch_norm_one"),
    ("block_one/bn_2", "net.0.batch_norm_two"),
    ("block_two/conv_1", "net.2.conv_one"),
    ("block_two/conv_2", "net.2.conv_two"),
    ("block_two/bn_1", "net.2.batch_norm_one"),
    ("block_two/bn_2", "net.2.batch_norm_two"),
]

_MNIST_FC = ("fc", "net.5")  # MNISTAudio/Image final Linear in Sequential


def _load_state_dict(path: Path) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    state = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            state[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return state


def _flax_to_torch_key(flax_path: str, leaf: str, collection: str) -> Optional[str]:
    """Translate a flax param path to the reference torch key."""
    path = flax_path
    # layer{S}_{I} → layer{S}.{I}
    import re

    path = re.sub(r"layer(\d+)_(\d+)", r"layer\1.\2", path)
    for ours, theirs in _NAME_RULES:
        path = path.replace(ours, theirs)
    if collection == "params":
        suffix = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf)
    else:  # batch_stats
        suffix = {"mean": "running_mean", "var": "running_var"}.get(leaf)
    if suffix is None:
        return None
    return f"{path.replace('/', '.')}.{suffix}" if path else suffix


def _convert(value: np.ndarray, leaf: str, target_shape: Tuple[int, ...]) -> np.ndarray:
    if leaf == "kernel":
        if value.ndim == 4:  # conv OIHW → HWIO
            value = value.transpose(2, 3, 1, 0)
        elif value.ndim == 2:  # linear OI → IO
            value = value.T
    if value.shape != tuple(target_shape):
        raise ValueError(f"shape mismatch {value.shape} vs {target_shape}")
    return value


def load_torch_checkpoint(
    path: str | Path, target_params: Any, target_batch_stats: Optional[Any] = None
) -> Any:
    """Return params (and optionally batch_stats) filled from a .pth file."""
    state = _load_state_dict(Path(path))
    used: set = set()

    def fill(tree: Any, collection: str, prefix: str = "") -> Any:
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = fill(v, collection, f"{prefix}{k}/")
            else:
                flax_path = prefix.rstrip("/")
                key = _flax_to_torch_key(flax_path, k, collection)
                # MNIST encoders name the flatten Linear `fc` but torch
                # stores it at Sequential slot 5.
                candidates = [key]
                if key and flax_path == "fc":
                    candidates.append(
                        key.replace("fc.", f"{_MNIST_FC[1]}.", 1)
                    )
                hit = next(
                    (c for c in candidates if c and c in state), None
                )
                if hit is not None:
                    out[k] = _convert(state[hit], k, np.shape(v))
                    used.add(hit)
                else:
                    out[k] = _match_by_shape(v, k, state, used)
        return out

    def _match_by_shape(v, leaf, state, used):
        want = np.shape(v)
        matches = []
        for tk, tv in state.items():
            if tk in used:
                continue
            conv = tv
            if leaf == "kernel" and conv.ndim == 4:
                conv = conv.transpose(2, 3, 1, 0)
            elif leaf == "kernel" and conv.ndim == 2:
                conv = conv.T
            if conv.shape == tuple(want):
                matches.append((tk, conv))
        if len(matches) == 1:
            used.add(matches[0][0])
            return matches[0][1]
        logger.warning(
            f"torch-interop: no unique source for leaf {leaf} shape {want} "
            f"({len(matches)} candidates); keeping initialized value"
        )
        return v

    params = fill(dict(target_params), "params")
    if target_batch_stats is not None:
        stats = fill(dict(target_batch_stats), "batch_stats")
        return params, stats
    return params
