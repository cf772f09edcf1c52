"""Utilities: checkpointing (orbax), profiling, observability."""

from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .metrics import psgd_metrics
from .profiling import StepTimer, trace
