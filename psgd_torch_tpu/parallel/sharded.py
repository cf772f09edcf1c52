"""Per-shard Kron whitening: the DTensor/FSDP2 wrapper equivalent.

The reference's DTensor wrapper preconditions **each local shard of a
parameter independently** ("not optimal but acceptable",
/root/reference/wrapped_as_torch_optimizer_for_dtensor.py:9, :123-125): a
(4096, 8192) weight sharded 8 ways gets eight independent (512, 8192)-shaped
Kron preconditioners, with zero communication in the optimizer.

This module is the JAX/TPU re-design: one ``shard_map`` over the mesh runs
the whitening update and apply on every device's local shard view.  State
factors are stored with leading shard axes — a Q factor for a k-way-sharded
dim lives in a (k, m, m) array sharded PS(axis, None, None) so each device
owns exactly its own (m, m) factor.  Consistency across *replicated* mesh
axes comes from identical PRNG keys (same fold_in on every replica), which
replaces the reference's RNG-broadcast machinery (dtensor:89-103).

Communication cost of the optimizer itself: **zero collectives** (like the
reference wrapper); gradients arrive already correctly sharded from the
backward pass.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as PS

from ..utils.compat import shard_map
from ..precond import kron as kron_p
from ..optim.transforms import (
    PSGDState,
    _amp_clip,
    _ema_update,
    _squeezed_shape,
)


def _spec_axes(spec: PS) -> Tuple[Optional[str], ...]:
    """Per-dim mesh axis (single-axis entries only in this version)."""
    out = []
    for entry in tuple(spec):
        if entry is None:
            out.append(None)
        elif isinstance(entry, (tuple, list)):
            raise NotImplementedError(
                "per-shard whitening does not support multi-axis dims yet")
        else:
            out.append(str(entry))
    return tuple(out)


def _local_shape(shape, axes, mesh: Mesh) -> Tuple[int, ...]:
    out = []
    for s, ax in zip(shape, axes + (None,) * (len(shape) - len(axes))):
        k = mesh.shape[ax] if ax else 1
        if s % k:
            raise ValueError(f"dim {s} not divisible by mesh axis {ax}={k}")
        out.append(s // k)
    return tuple(out)


class ShardedKronLeaf(NamedTuple):
    """Kron state for one sharded leaf: every factor carries leading shard
    axes (one per sharded mesh axis of the leaf)."""
    q: Tuple[jax.Array, ...]
    lips: Tuple[jax.Array, ...]


def per_shard_kron_whiten(
    mesh: Mesh,
    param_specs: Any,
    preconditioner_max_size: float = float("inf"),
    preconditioner_max_skew: float = 1.0,
    preconditioner_init_scale: float = 1.0,
    lr_preconditioner: float = 0.1,
    betaL: float = 0.9,
    damping: float = 1e-9,
    momentum: float = 0.0,
    grad_clip_max_amps: Tuple[float, float] = (2.0, 10.0),
    preconditioner_update_probability: float = 1.0,
    dq: str = "Q0.5EQ1.5",
    norm_k: int = 32,
    seed: int = 0,
) -> optax.GradientTransformation:
    """Gradient-whitening Kron transform that preconditions each device-local
    shard independently (zero optimizer collectives).

    ``param_specs`` is a pytree of PartitionSpecs matching the params.
    The emitted updates keep the input sharding.  Set
    ``preconditioner_init_scale`` explicitly (on-the-fly init would need a
    collective to agree on the scale; the reference wrapper also recommends
    setting it, ddp:36-39).
    """
    dq = kron_p.canonical_dq(dq)
    momentum = momentum if 0.0 < momentum < 1.0 else 0.0

    def leaf_meta(leaf, spec):
        axes = _spec_axes(spec)
        # pad axes to leaf rank
        axes = axes + (None,) * (leaf.ndim - len(axes))
        lshape = _local_shape(leaf.shape, axes, mesh)
        shard_axes = tuple(ax for ax in axes if ax)
        plan = kron_p.make_kron_plan(_squeezed_shape(lshape),
                                     preconditioner_max_size,
                                     preconditioner_max_skew, dq)
        return axes, lshape, shard_axes, plan

    def init_fn(params):
        leaves, _ = jax.tree_util.tree_flatten(params)
        specs = jax.tree_util.tree_leaves(
            param_specs, is_leaf=lambda x: isinstance(x, PS))
        states = []
        for leaf, spec in zip(leaves, specs):
            axes, lshape, shard_axes, plan = leaf_meta(leaf, spec)
            st = kron_p.init_kron_from_plan(plan, preconditioner_init_scale,
                                            leaf.dtype)
            lead = tuple(mesh.shape[ax] for ax in shard_axes)

            def stack(x):
                return jnp.tile(x[(None,) * len(lead)], lead + (1,) * x.ndim)

            q = tuple(stack(f) for f in st.q)
            lips = tuple(stack(l) for l in st.lips)
            # place the factors so each device owns its shard's factor
            lead_spec = PS(*shard_axes) if shard_axes else PS()
            q = tuple(jax.device_put(
                f, jax.sharding.NamedSharding(
                    mesh, PS(*(tuple(lead_spec) + (None,) * (f.ndim - len(lead)))))
            ) for f in q)
            states.append(ShardedKronLeaf(q=q, lips=lips))
        mu = jax.tree_util.tree_map(jnp.zeros_like, params) if momentum > 0 else None
        return PSGDState(count=jnp.zeros((), jnp.int32),
                         key=jax.random.PRNGKey(seed), mu=mu,
                         precond=tuple(states))

    def update_fn(updates, state, params=None):
        del params
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        specs = jax.tree_util.tree_leaves(
            param_specs, is_leaf=lambda x: isinstance(x, PS))

        if momentum > 0:
            mu = _ema_update(state.mu, updates, state.count, momentum)
            srcs = jax.tree_util.tree_leaves(mu)
        else:
            mu, srcs = None, leaves

        key, k_gate, k_fit = jax.random.split(state.key, 3)
        do_update = jax.random.uniform(k_gate) < preconditioner_update_probability

        new_states, outs = [], []
        for i, (g, src, spec, st) in enumerate(
                zip(leaves, srcs, specs, state.precond)):
            axes, lshape, shard_axes, plan = leaf_meta(g, spec)
            n_lead = len(shard_axes)
            leaf_spec = PS(*axes)
            lead_spec = tuple(shard_axes)
            state_specs = ShardedKronLeaf(
                q=tuple(PS(*(lead_spec + (None,) * (f.ndim - n_lead)))
                        for f in st.q),
                lips=tuple(PS(*lead_spec) for _ in st.lips),
            )
            k_leaf = jax.random.fold_in(k_fit, i)

            def local_update(g_loc, src_loc, st_loc, do_update):
                # index out this device's factor and fold the shard position
                # into the PRNG key (replicated axes share the same key)
                idx = tuple(jax.lax.axis_index(ax) for ax in shard_axes)
                kk = k_leaf
                for ax_i in idx:
                    kk = jax.random.fold_in(kk, ax_i)
                sq = g_loc.reshape(plan.shape)
                src_sq = src_loc.reshape(plan.shape)
                inner = kron_p.KronState(
                    q=tuple(f[(0,) * n_lead] for f in st_loc.q),
                    lips=tuple(l[(0,) * n_lead] for l in st_loc.lips))

                fit = lambda s: kron_p.update_kron_whiten(
                    s, plan, sq, kk, lr=lr_preconditioner, beta_l=betaL,
                    damping=damping, norm_k=norm_k)
                inner = jax.lax.cond(do_update, fit, lambda s: s, inner)
                pg = kron_p.precond_grad(inner, plan, src_sq)
                pg = _amp_clip(pg, *grad_clip_max_amps).reshape(g_loc.shape)
                st_out = ShardedKronLeaf(
                    q=tuple(f[(None,) * n_lead] for f in inner.q),
                    lips=tuple(l[(None,) * n_lead] for l in inner.lips))
                return pg, st_out

            fn = shard_map(
                local_update, mesh=mesh,
                in_specs=(leaf_spec, leaf_spec, state_specs, PS()),
                out_specs=(leaf_spec, state_specs),
                check_rep=False)
            pg, st_new = fn(g, src, st, do_update)
            outs.append(pg)
            new_states.append(st_new)

        new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                              precond=tuple(new_states))
        return jax.tree_util.tree_unflatten(treedef, outs), new_state

    return optax.GradientTransformation(init_fn, update_fn)
