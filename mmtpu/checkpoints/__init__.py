from mmtpu.checkpoints.manager import CheckpointManager, load_encoder_checkpoint
from mmtpu.checkpoints.torch_interop import load_torch_checkpoint

__all__ = [
    "CheckpointManager",
    "load_encoder_checkpoint",
    "load_torch_checkpoint",
]
