"""Parameter serialization for transport (reference: federated/federated_utils.py:7-41).

The reference's federated drivers are empty stubs (SURVEY.md §2.2); only the
base64 state-dict codec survives there. The equivalent here encodes a Flax
param pytree to base64 msgpack bytes and back — usable by any future
transport layer."""

from __future__ import annotations

import base64
from typing import Any

from flax import serialization


def serialize_params(params: Any) -> str:
    """Param pytree → base64 string."""
    return base64.b64encode(serialization.to_bytes(params)).decode("ascii")


def deserialize_params(encoded: str, target: Any) -> Any:
    """base64 string → param pytree (structure from `target`)."""
    return serialization.from_bytes(target, base64.b64decode(encoded))
