"""Utilities: checkpointing (orbax), profiling, observability."""

from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .failsafe import FailsafeLoop, finite_check, make_guarded_step
from .metrics import psgd_metrics, state_memory_report  # noqa: F401
# torch_interop is intentionally NOT imported here: torch is optional
from .profiling import (StepTimer, collective_boundary_bytes,
                        collective_bytes, trace)
