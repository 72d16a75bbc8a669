from .engine import Trainer, compute_loss, make_train_step
from .checkpoint import CheckpointManager

__all__ = ["Trainer", "compute_loss", "make_train_step", "CheckpointManager"]
