from mmtpu.federated.federated_utils import (
    deserialize_params,
    serialize_params,
)

__all__ = ["serialize_params", "deserialize_params"]
