"""Checkpoint / resume for PSGD training state (absent in the reference:
its optimizer state holds live opt_einsum objects and cannot be serialized,
SURVEY.md §5 — here the state is a pure pytree, so orbax handles it).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ckpt():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, step: int, params: Any, opt_state: Any,
                    extra: Optional[dict] = None) -> None:
    """Save params + optimizer state (+ anything else) atomically."""
    ocp = _ckpt()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"step_{step}"),
                   {"step": step, "params": params, "opt_state": opt_state,
                    "extra": extra or {}},
                   force=True)


def latest_step(path: str) -> Optional[int]:
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(path)
             if d.startswith("step_")]
    return max(steps) if steps else None


def restore_checkpoint(path: str, template: Any, step: Optional[int] = None):
    """Restore a checkpoint into the structure of ``template``
    ({"step","params","opt_state","extra"}); returns the restored pytree."""
    ocp = _ckpt()
    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, f"step_{step}"),
                             item=template)
