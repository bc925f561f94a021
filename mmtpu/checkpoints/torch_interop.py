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
    ("attention_layer", "attention_layer.0"),  # torch Sequential(Linear,Tanh)
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

# Dense-after-conv-flatten layouts (C, H, W) for automatic NCHW→NHWC
# permutation. Keyed by module name with an ALLOWLIST of exact geometries —
# the permutation fires only when C*H*W equals the kernel's input dim, so a
# Dense that merely shares the name (ResNet's pooled `fc` at 512, the LSTM
# classifier's `fc1` at hidden size) is never scrambled by a divisibility
# heuristic. Known flattens: MNIST image 64x7x7, MNIST audio 64x5x15,
# LeNet 16x5x5.
_DEFAULT_FLATTEN_LAYOUTS: Dict[str, Tuple[Tuple[int, int, int], ...]] = {
    "fc": ((64, 7, 7), (64, 5, 15)),
    "fc1": ((16, 5, 5),),
}


def _permute_flatten(w: np.ndarray, chw: Tuple[int, int, int]) -> np.ndarray:
    """(out, C*H*W) torch linear weight → (out, H*W*C) matching NHWC flatten.
    No-op unless the declared geometry matches the input dim exactly."""
    out_dim, in_dim = w.shape
    c, h, wd = chw
    if c * h * wd != in_dim:
        return w
    return (
        w.reshape(out_dim, c, h, wd).transpose(0, 2, 3, 1).reshape(out_dim, in_dim)
    )


def _load_state_dict(path: Path, trusted: bool = True) -> Dict[str, np.ndarray]:
    import torch

    try:
        # Safe path first: weights_only=True restricts unpickling to tensor
        # payloads and covers plain state-dict checkpoints.
        obj = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        if not trusted:
            raise ValueError(
                f"{path} is not a plain-tensor checkpoint and trusted=False. "
                "Full unpickling of arbitrary classes is arbitrary code "
                "execution; pass trusted=True only for files you trust."
            )
        logger.warning(
            f"torch-interop: {path} needs full (unsafe) unpickling — "
            "treating it as trusted because it was named in the experiment "
            "config"
        )
        try:
            obj = torch.load(str(path), map_location="cpu", weights_only=False)
        except ModuleNotFoundError:
            # Reference checkpoints pickle its internal classes (config.*,
            # models.*, ...). Stub those modules so the tensors unpickle; the
            # class instances become inert placeholders we never touch.
            obj = _load_with_stub_modules(path)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    state = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            state[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return state


class _Stub(dict):
    """Inert placeholder for unpicklable reference classes. Subclasses dict
    so dict-based reference types (e.g. LossFunctionGroup) reconstruct."""

    def __init__(self, *a, **k):
        super().__init__()

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)

    def append(self, *a):  # list-like reconstruction
        pass


def _load_with_stub_modules(path: Path):
    import sys
    import types

    import torch

    class StubModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            # Modality instances appear as dict KEYS in reference pickles —
            # map them onto mmtpu's (hashable, str-backed) Modality.
            if name == "Modality":
                from mmtpu.modalities import Modality

                return Modality
            if name == "add_modality":
                from mmtpu.modalities import add_modality

                return add_modality
            return type(name, (_Stub,), {"__module__": self.__name__})

    roots = ("config", "models", "experiment_utils", "data", "modalities",
             "federated", "metrics")
    installed = []
    # checkpoints saved on Windows pickle WindowsPath objects
    import pathlib

    orig_windows_path = pathlib.WindowsPath
    pathlib.WindowsPath = pathlib.PurePosixPath
    try:
        while True:
            try:
                return torch.load(str(path), map_location="cpu", weights_only=False)
            except ModuleNotFoundError as e:
                mod_name = str(e).split("'")[1]
                if mod_name.split(".")[0] not in roots or mod_name in sys.modules:
                    raise
                for i in range(1, len(mod_name.split(".")) + 1):
                    prefix = ".".join(mod_name.split(".")[:i])
                    if prefix not in sys.modules:
                        sys.modules[prefix] = StubModule(prefix)
                        installed.append(prefix)
    finally:
        pathlib.WindowsPath = orig_windows_path
        for name in installed:
            sys.modules.pop(name, None)


def _fused_lstm_lookup(
    state: Dict[str, np.ndarray], prefix: str, flax_path: str, leaf: str
) -> Optional[Tuple[np.ndarray, List[str]]]:
    """Map torch nn.LSTM weights onto the fused LSTMEncoder layout
    (models/lstm.py backend='fused'): wi.kernel=(I,4H) <- weight_ih_l0.T,
    wi.bias <- bias_ih_l0 + bias_hh_l0, wh=(H,4H) <- weight_hh_l0.T.
    Torch gate order [i,f,g,o] equals flax's, so no gate permutation.
    Also maps the attention pooling's raw `attention_vector_weight` param.
    Returns (converted value, consumed torch keys) or None."""
    base = prefix.replace("/", ".")
    if leaf == "wh":
        key = f"{base}rnn.weight_hh_l0"
        if key in state:
            return state[key].T, [key]
    if leaf == "attention_vector_weight":
        key = f"{base}attention_vector_weight"
        if key in state:
            return state[key], [key]
    if flax_path.split("/")[-1] == "wi":
        enc = base.rsplit("wi.", 1)[0]
        if leaf == "kernel":
            key = f"{enc}rnn.weight_ih_l0"
            if key in state:
                return state[key].T, [key]
        if leaf == "bias":
            k_ih, k_hh = f"{enc}rnn.bias_ih_l0", f"{enc}rnn.bias_hh_l0"
            if k_ih in state and k_hh in state:
                return state[k_ih] + state[k_hh], [k_ih, k_hh]
    return None


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
    path: str | Path,
    target_params: Any,
    target_batch_stats: Optional[Any] = None,
    flatten_layouts: Optional[Dict[str, Tuple[int, int, int]]] = None,
    trusted: bool = True,
) -> Any:
    """Return params (and optionally batch_stats) filled from a .pth file.

    flatten_layouts: {flax_module_path: (C, H, W)} for Dense layers that
    consume a flattened conv map — torch flattens NCHW (channel-major),
    flax flattens NHWC, so those kernels are permuted accordingly. The
    MNIST/LeNet encoder layouts are applied automatically.

    trusted: checkpoints that are not plain tensor payloads require full
    pickle deserialization, which can execute arbitrary code. Defaults to
    True because these paths come from user-authored experiment configs;
    pass False to reject such files.
    """
    layouts: Dict[str, Tuple[Tuple[int, int, int], ...]] = dict(
        _DEFAULT_FLATTEN_LAYOUTS
    )
    for k, v in (flatten_layouts or {}).items():
        layouts[k] = (tuple(v),)  # user-declared exact geometry
    state = _load_state_dict(Path(path), trusted=trusted)
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
                lstm_hit = _fused_lstm_lookup(state, prefix, flax_path, k)
                if lstm_hit is not None:
                    value, consumed = lstm_hit
                    if np.shape(value) != np.shape(v):
                        raise ValueError(
                            f"LSTM shape mismatch {np.shape(value)} vs "
                            f"{np.shape(v)} at {flax_path}/{k}"
                        )
                    out[k] = value
                    used.update(consumed)
                    continue
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
                    value = state[hit]
                    if (
                        k == "kernel"
                        and value.ndim == 2
                        and flax_path in layouts
                    ):
                        for chw in layouts[flax_path]:
                            if int(np.prod(chw)) == value.shape[1]:
                                value = _permute_flatten(value, chw)
                                break
                    out[k] = _convert(value, k, np.shape(v))
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
            logger.info(
                f"torch-interop: shape-based fallback mapped torch key "
                f"{matches[0][0]!r} -> leaf {leaf} shape {want} (verify the "
                f"layer is semantically the intended one)"
            )
            return matches[0][1]
        keys = [m[0] for m in matches]
        if len(matches) > 1 and any("_reverse" in k or "_l1" in k for k in keys):
            # bidirectional / multi-layer torch LSTMs produce forward and
            # reverse (or per-layer) weights with identical shapes — a
            # silent keep-random-init here would make a "pretrained" model
            # train from scratch. Fail loudly instead.
            raise ValueError(
                "torch-interop: cannot disambiguate multi-layer/"
                f"bidirectional LSTM weights for leaf {leaf} shape {want}: "
                f"candidates {keys}. Convert this checkpoint explicitly "
                "(the automatic mapping covers unidirectional layer-0 "
                "LSTMs only)."
            )
        logger.warning(
            f"torch-interop: no unique source for leaf {leaf} shape {want} "
            f"({len(matches)} candidates: {keys}); keeping initialized value"
        )
        return v

    params = fill(dict(target_params), "params")
    if target_batch_stats is not None:
        stats = fill(dict(target_batch_stats), "batch_stats")
        return params, stats
    return params
