"""One declaration → mutually consistent transform kwargs + state placement.

The production sharded layout needs the SAME facts in two places: the
transform takes ``stack_sharding=(mesh, axis)`` / ``factor_sharding=(mesh,
param_specs)`` while ``psgd_state_specs`` takes ``stack_axis=axis`` /
``factor_sharding_params=params, mesh=mesh`` — and the two must agree, or
GSPMD silently resharding the Q state every step eats the sharding win.
``sharding_recipe`` derives both sides from a single declaration, resolves
the stack axis against the actual layer counts, and disables the dim-sharded
embedding path for dQ geometries the transform would not route (so the state
placement never disagrees with the compute layout).

This replaces the reference's per-wrapper configuration split (the DDP
wrapper's rank bookkeeping vs the DTensor wrapper's shard handling,
wrapped_as_torch_optimizer_for_ddp.py:4-62) with one object.

Usage::

    recipe = sharding_recipe(mesh, p_specs, params, scanned_layers=mask)
    opt = optim.kron_whiten(learning_rate=1e-3, **recipe.transform_kwargs)
    state = opt.init(params)
    params, state = recipe.place(params, state)
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass
from typing import Any, Optional, Tuple, Union

import jax
from jax.sharding import Mesh, PartitionSpec as PS

from .mesh import named_shardings, psgd_state_specs

StackAxis = Union[None, str, Tuple[str, ...]]


@dataclass(frozen=True)
class ShardingRecipe:
    """Resolved production layout: feed ``transform_kwargs`` to
    ``kron_whiten`` / ``kron_newton`` and place state with ``state_specs`` /
    ``place`` — consistency between the two sides is guaranteed."""

    mesh: Mesh
    param_specs: Any
    params: Any
    scanned_layers: Any
    stack_axis: StackAxis          # resolved; None = stack sharding off
    factor_sharded: bool           # dim-sharded embedding path on/off
    dq: str
    shared_layers: Any = None      # layer-stack factor pooling mask

    @property
    def transform_kwargs(self) -> dict:
        kw: dict = {"dq": self.dq}
        if self.scanned_layers is not None:
            kw["scanned_layers"] = self.scanned_layers
        if self.shared_layers is not None:
            kw["shared_layers"] = self.shared_layers
        if self.stack_axis is not None:
            kw["stack_sharding"] = (self.mesh, self.stack_axis)
        if self.factor_sharded:
            kw["factor_sharding"] = (self.mesh, self.param_specs)
        return kw

    def state_specs(self, state) -> Any:
        """PartitionSpecs for the optimizer state matching the compute
        layout the transform kwargs select."""
        return psgd_state_specs(
            self.param_specs, state,
            scanned_layers=self.scanned_layers,
            stack_axis=self.stack_axis,
            factor_sharding_params=(self.params if self.factor_sharded
                                    else None),
            mesh=self.mesh,
            shared_layers=self.shared_layers)

    def place(self, params, state) -> Tuple[Any, Any]:
        """device_put params and optimizer state onto their shardings."""
        return (jax.device_put(params,
                               named_shardings(self.mesh, self.param_specs)),
                jax.device_put(state, named_shardings(self.mesh,
                                                      self.state_specs(state))))


def _axis_size(mesh: Mesh, axis: StackAxis) -> int:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    names = (axis,) if isinstance(axis, str) else tuple(axis)
    missing = [a for a in names if a not in sizes]
    if missing:
        raise ValueError(f"stack_axis {missing} not in mesh axes "
                         f"{tuple(mesh.axis_names)}")
    return math.prod(sizes[a] for a in names)


def sharding_recipe(mesh: Mesh, param_specs: Any, params: Any,
                    scanned_layers: Any = None,
                    stack_axis: Union[StackAxis, str] = "auto",
                    dq: str = "Q0.5EQ1.5",
                    shared_layers: Any = None) -> ShardingRecipe:
    """Resolve the production sharded-optimizer layout from one declaration.

    Args:
      mesh: the device mesh.
      param_specs: PartitionSpec pytree for the params (model layout).
      params: the params pytree (leaf shapes drive the layer-count and
        embedding-dim decisions; also the state-spec source).
      scanned_layers: optional bool pytree marking layer-stacked leaves.
      stack_axis: mesh axis (or tuple of axes) to shard the layer stacks
        over; ``"auto"`` picks the largest single axis whose size divides
        every stacked leaf's layer count (ZeRO-style Q partitioning), and
        falls back to replicated Q with a warning when none divides.
        ``None`` disables stack sharding.
      dq: the dQ geometry the transform will be built with.  The dim-sharded
        embedding path only exists for the matmul-only geometries
        (Q0.5EQ1.5 / QUAD / QEQ, kron.DIM_SHARDABLE_DQS) — for other
        geometries the recipe keeps that state replicated, matching what the
        transform actually computes.
      shared_layers: the transform's layer-stack factor-pooling mask (True =
        every scanned leaf).  Shared leaves hold one pooled KronState — the
        recipe excludes them from stack sharding (no per-layer Q to
        partition) and keeps their state replicated.

    Returns a :class:`ShardingRecipe`.
    """
    from ..precond import kron as kron_p

    dq = kron_p.canonical_dq(dq)
    leaves = jax.tree_util.tree_leaves(params)
    spec_leaves = jax.tree_util.tree_leaves(
        param_specs, is_leaf=lambda x: isinstance(x, PS))
    if len(spec_leaves) != len(leaves):
        raise ValueError(
            f"param_specs has {len(spec_leaves)} leaves but params has "
            f"{len(leaves)} — the trees must match leaf-for-leaf")
    if scanned_layers is not None:
        flags = [bool(f) for f in jax.tree_util.tree_leaves(scanned_layers)]
        if len(flags) != len(leaves):
            raise ValueError("scanned_layers does not match params")
    else:
        flags = [False] * len(leaves)
    if shared_layers is True:
        shared = list(flags)
    elif shared_layers is not None:
        shared = [bool(s) for s in jax.tree_util.tree_leaves(shared_layers)]
        if len(shared) != len(leaves):
            raise ValueError("shared_layers does not match params")
    else:
        shared = [False] * len(leaves)

    # shared (pooled) leaves hold one KronState — no per-layer Q to shard
    stack_counts = sorted({int(leaf.shape[0])
                           for leaf, f, sh in zip(leaves, flags, shared)
                           if f and not sh})
    resolved: StackAxis = None
    if stack_counts:
        if stack_axis == "auto":
            best, best_size = None, 1
            for name in mesh.axis_names:
                size = _axis_size(mesh, name)
                if size > best_size and all(c % size == 0
                                            for c in stack_counts):
                    best, best_size = name, size
            resolved = best
            if resolved is None and max(mesh.devices.shape) > 1:
                warnings.warn(
                    f"sharding_recipe: no mesh axis of {dict(zip(mesh.axis_names, mesh.devices.shape))} "
                    f"divides the layer counts {stack_counts}; "
                    "preconditioner stack sharding disabled (Q replicated)",
                    stacklevel=2)
        elif stack_axis is not None:
            size = _axis_size(mesh, stack_axis)
            bad = [c for c in stack_counts if c % size]
            if bad:
                raise ValueError(
                    f"stack_axis {stack_axis!r} (size {size}) does not "
                    f"divide the stacked layer counts {bad}")
            resolved = stack_axis

    factor_sharded = dq in kron_p.DIM_SHARDABLE_DQS and any(
        (not f) and spec is not None and any(a is not None for a in spec)
        for f, spec in zip(flags, spec_leaves))

    return ShardingRecipe(mesh=mesh, param_specs=param_specs, params=params,
                          scanned_layers=scanned_layers, stack_axis=resolved,
                          factor_sharded=factor_sharded, dq=dq,
                          shared_layers=shared_layers)
