"""Training runtime: jitted step, epoch loop, checkpointing, TB logging."""

from .checkpoint import save_checkpoint, load_checkpoint, checkpoint_filename
from .loop import Trainer

__all__ = ["Trainer", "save_checkpoint", "load_checkpoint", "checkpoint_filename"]
