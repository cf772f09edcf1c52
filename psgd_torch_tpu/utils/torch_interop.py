"""Torch interop for users migrating from the reference implementation.

The reference is a PyTorch library; its users hold ``state_dict``s and
``nn.Module`` parameters.  These helpers move parameter trees across the
torch/JAX boundary so a reference user can (a) port a trained model's
weights into a JAX training loop driven by this framework, or (b) export
PSGD-trained parameters back into a torch module.

Torch is an optional dependency: importing this module without torch
installed raises a clear error at call time, not import time.

    import psgd_torch_tpu.utils.torch_interop as ti
    params = ti.from_torch(model.state_dict())        # -> nested dict of jnp arrays
    ...train with psgd_torch_tpu.optim...
    model.load_state_dict(ti.to_torch(params))        # back to torch
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _require_torch():
    try:
        import torch
        return torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "torch_interop requires PyTorch (pip install torch)") from e


def from_torch(state_dict: Mapping[str, Any], *, nest: bool = True,
               dtype=None) -> Dict[str, jax.Array]:
    """Convert a torch ``state_dict`` (or any {name: tensor} mapping) to a
    pytree of jnp arrays.

    ``nest=True`` splits dotted names into a nested dict
    ('blocks.0.attn.weight' -> params['blocks']['0']['attn']['weight']) —
    the natural JAX pytree shape; ``nest=False`` keeps the flat mapping.
    ``dtype`` optionally casts every leaf (e.g. jnp.bfloat16)."""
    torch = _require_torch()
    out: Dict[str, Any] = {}
    for name, t in state_dict.items():
        if isinstance(t, torch.Tensor):
            arr = jnp.asarray(np.asarray(t.detach().cpu()))
        else:
            arr = jnp.asarray(t)
        if dtype is not None:
            arr = arr.astype(dtype)
        if nest:
            node = out
            parts = name.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
        else:
            out[name] = arr
    return out


def to_torch(params: Any, *, sep: str = ".") -> Dict[str, Any]:
    """Convert a pytree of arrays to a flat {dotted_name: torch.Tensor}
    mapping suitable for ``module.load_state_dict``.

    Dict keys join with ``sep``; list/tuple entries use their index."""
    torch = _require_torch()

    out: Dict[str, Any] = {}

    def walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, f"{prefix}{sep}{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}{sep}{i}" if prefix else str(i))
        else:
            out[prefix] = torch.from_numpy(np.asarray(jax.device_get(node)))

    walk(params, "")
    return out


def grads_from_torch(module) -> Dict[str, jax.Array]:
    """Collect ``.grad`` of a torch module's named parameters as a nested
    jnp pytree (mirrors from_torch's nesting) — useful for driving this
    framework's functional preconditioners from a torch training loop."""
    _require_torch()
    grads = {name: p.grad for name, p in module.named_parameters()
             if p.grad is not None}
    return from_torch(grads)
