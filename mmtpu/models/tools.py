"""CycleGAN-style network helpers (reference: models/msa/networks/tools.py
— exported but consumed by nothing in the reference; rebuilt here as
functional JAX equivalents for capability completeness).

torch → JAX mapping:
- get_norm_layer (tools.py:14-35)  → flax norm-module factory
- init_weights / init_net (:69-121) → pure pytree re-initialization
  (normal | xavier | kaiming | orthogonal); init_net's device placement
  is a no-op under jit, so init_net is an alias
- diagnose_network (:124-140)      → mean |grad| over a grads pytree
- Mid/MultiLayerFeatureExtractor (:143-195, forward hooks) →
  extract_mid_features via flax capture_intermediates (functional: no
  hooks, one extra apply)
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return x


def get_norm_layer(norm_type: str = "instance"):
    """Return a flax normalization-module factory (reference tools.py:14-35).

    'batch' tracks running statistics with affine params (pass
    use_running_average=not train at call time); 'instance' is
    non-affine without running stats; 'layer' uses eps=1e-6."""
    if norm_type == "batch":
        return functools.partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5)
    if norm_type == "instance":
        return functools.partial(nn.InstanceNorm, use_bias=False, use_scale=False)
    if norm_type == "layer":
        return functools.partial(nn.LayerNorm, epsilon=1e-6)
    if norm_type == "none":
        return lambda *a, **kw: Identity()
    raise NotImplementedError(
        "normalization layer [%s] is not found" % norm_type
    )


def _fans(shape: Sequence[int]) -> Tuple[int, int]:
    """(fan_in, fan_out) for dense (in, out) and conv (*window, in, out)
    kernels in flax layout."""
    if len(shape) == 2:
        return int(shape[0]), int(shape[1])
    receptive = int(np.prod(shape[:-2]))
    return int(shape[-2]) * receptive, int(shape[-1]) * receptive


def _init_kernel(rng, shape, dtype, init_type: str, init_gain: float):
    if init_type == "normal":
        return init_gain * jax.random.normal(rng, shape, dtype)
    fan_in, fan_out = _fans(shape)
    if init_type == "xavier":
        std = init_gain * np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(rng, shape, dtype)
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in') — tools.py:89
        std = np.sqrt(2.0 / fan_in)
        return std * jax.random.normal(rng, shape, dtype)
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=init_gain)(rng, shape, dtype)
    raise NotImplementedError(
        "initialization method [%s] is not implemented" % init_type
    )


# param paths that belong to recurrences/attention/embeddings — torch's
# init_func touches only modules whose classname contains Conv or Linear
# (tools.py:83), so LSTM/GRU/Embedding weights stay untouched; in mmtpu's
# param tree those live under these names (exact component match, plus the
# directional-RNN suffixes)
_RECURRENT_NAMES = frozenset(
    {"wi", "wh", "cell", "rnn", "attention_vector_weight", "embedding",
     "bert", "OptimizedLSTMCell_0", "GRUCell_0"}
)
_RECURRENT_SUFFIXES = ("_fwd", "_bwd")


def _is_recurrent_path(names: Tuple[str, ...]) -> bool:
    return any(
        n in _RECURRENT_NAMES or n.startswith("rnn")
        or n.endswith(_RECURRENT_SUFFIXES)
        for n in names
    )


def init_weights(
    params: Dict[str, Any],
    init_type: str = "normal",
    init_gain: float = 0.02,
    seed: int = 0,
    batch_stats: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Re-initialize a params pytree (reference init_weights, tools.py:69-103).

    Dense/Conv kernels get the chosen initializer, their biases zero;
    BatchNorm scales ~ N(1, init_gain) with zero bias (identified by their
    path existing in `batch_stats`, the torch BatchNorm2d branch :96-100);
    recurrent/attention/embedding params are untouched (torch's classname
    filter never matches them). Pure: returns a new pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    bn_paths = set()
    if batch_stats:
        for path, _ in jax.tree_util.tree_flatten_with_path(batch_stats)[0]:
            # path of the BN module = everything above the mean/var leaf
            bn_paths.add(tuple(_key_name(k) for k in path[:-1]))

    rng = jax.random.PRNGKey(seed)
    out = {}
    for path, leaf in flat:
        names = tuple(_key_name(k) for k in path)
        parent, leafname = names[:-1], names[-1]
        new = leaf
        if _is_recurrent_path(names):
            pass  # recurrent/embedding param — untouched
        elif parent in bn_paths:
            rng, sub = jax.random.split(rng)
            if leafname == "scale":
                new = 1.0 + init_gain * jax.random.normal(
                    sub, leaf.shape, leaf.dtype
                )
            elif leafname == "bias":
                new = jnp.zeros_like(leaf)
        elif leafname == "kernel" and leaf.ndim in (2, 3, 4):
            rng, sub = jax.random.split(rng)
            new = _init_kernel(sub, leaf.shape, leaf.dtype, init_type, init_gain)
        elif leafname == "bias":
            new = jnp.zeros_like(leaf)
        _set_path(out, names, new)
    return out


def init_net(
    params: Dict[str, Any],
    init_type: str = "normal",
    init_gain: float = 0.02,
    seed: int = 0,
    batch_stats: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Reference init_net (tools.py:106-121) = device placement +
    init_weights; placement is XLA's job here, so this is init_weights."""
    return init_weights(params, init_type, init_gain, seed, batch_stats)


def diagnose_network(grads: Dict[str, Any], name: str = "network") -> float:
    """Mean of per-leaf mean |gradient| (reference tools.py:124-140).
    Returns the scalar (the reference prints it; callers can log)."""
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return 0.0
    means = [float(jnp.mean(jnp.abs(g))) for g in leaves]
    return float(np.mean(means))


def _key_name(k) -> str:
    return getattr(k, "key", getattr(k, "idx", k)).__str__()


def _set_path(tree: Dict[str, Any], names: Tuple[str, ...], value) -> None:
    node = tree
    for n in names[:-1]:
        node = node.setdefault(n, {})
    node[names[-1]] = value


def _parse_layer_path(name: str) -> List[str]:
    """'C.fc[0]' → ['C', 'fc_0'] (torch Sequential indexing maps to flax's
    `name_{i}` child naming; reference str2layer, tools.py:179-191)."""
    parts: List[str] = []
    for module in name.strip().split("."):
        m = re.match(r"^(.*?)\[(\d+)\]$", module)
        if m:
            parts.append(f"{m.group(1)}_{m.group(2)}")
        else:
            parts.append(module)
    return parts


def extract_mid_features(
    model: nn.Module,
    variables: Dict[str, Any],
    inputs: Sequence[Any],
    layers: str,
    **apply_kwargs,
) -> List[jnp.ndarray]:
    """Functional MultiLayerFeatureExtractor (reference tools.py:165-195):
    run one apply with capture_intermediates and return the named
    submodules' outputs, e.g. layers="netA, net.fusion[0]"."""
    _, state = model.apply(
        variables,
        *inputs,
        capture_intermediates=True,
        mutable=["intermediates"],
        **apply_kwargs,
    )
    inter = state["intermediates"]
    results = []
    for name in layers.strip().split(","):
        node: Any = inter
        for part in _parse_layer_path(name):
            if part not in node:
                raise KeyError(
                    f"layer {name!r}: {part!r} not found; available: "
                    f"{sorted(k for k in node if k != '__call__')}"
                )
            node = node[part]
        if "__call__" not in node:
            raise KeyError(f"layer {name!r} captured no __call__ output")
        results.append(node["__call__"][0])
    return results
