"""Runtime utilities: criteria, optimizers, checkpointing."""

from .criteria import resolve_criterion
from .optimizers import resolve_optimizer

__all__ = ["resolve_criterion", "resolve_optimizer"]
