from mmtpu.ops.fused_mlp import fused_mlp

__all__ = ["fused_mlp"]
