"""Optax-style PSGD optimizer transforms (the L2 layer, TPU-first).

The reference packages its optimizers as closure-based classes
(/root/reference/psgd.py: KronWhiten:516, KronNewton:832, LRAWhiten:1075,
LRANewton:1201, DenseNewton:1427) whose step() runs autograd internally.  In
JAX the idiomatic equivalent is an ``optax.GradientTransformation``:

    opt = kron_whiten(learning_rate=1e-3, momentum=0.9)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, updates)

Differences by design (not omissions):
  * state is a pure pytree (serializable with orbax; the reference stores
    live opt_einsum objects in optimizer state and cannot be checkpointed,
    SURVEY.md §5);
  * stochastic gates (update probability, factor balancing, U-vs-V choice)
    are lax.cond on PRNG draws threaded through the state — bitwise identical
    across SPMD replicas, which replaces the reference DDP wrapper's
    RNG-state-synchronization machinery (wrapped_as_torch_optimizer_for_ddp.py:88-104);
  * Newton-type transforms take Hessian-vector products through optax
    extra-args (``hvp_fn`` computed with jax.jvp, see optim/hvp.py) instead
    of double-backward closures.

Hyperparameter semantics and defaults follow the reference classes.
"""

from __future__ import annotations

import math
import warnings
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.linalg import real_dtype_of, resolve_norm_k
from ..precond import dense as dense_p
from ..precond import kron as kron_p
from ..precond import lra as lra_p
from .hvp import rand_like_tree


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------



def _static_always(prob) -> bool:
    """True when the update probability is a LITERAL number >= 1.0: the fit
    gate ``uniform([0,1)) < prob`` is then statically true, so the lax.cond
    around the fit can be dropped (a cond is a separate HLO computation —
    a scheduling barrier).  Schedules (even constant ones) stay dynamic."""
    return isinstance(prob, (int, float)) and float(prob) >= 1.0


def _gated_fit(always: bool, gate, fit, s):
    """``fit(s)`` unconditionally when the gate is statically true, else the
    usual ``lax.cond(gate, fit, identity, s)``."""
    return fit(s) if always else jax.lax.cond(gate, fit, lambda x: x, s)


def _lazy_cond_zeros(pred, draw_fn):
    """``lax.cond(pred, draw_fn, <zeros>)`` with the skip branch's avals
    taken from ``draw_fn`` itself (via eval_shape), not from the params
    tree — an hvp_fn is allowed to return Hvps in a dtype different from
    the parameters (e.g. f32 Hvps over bf16 params)."""
    shapes = jax.eval_shape(draw_fn, None)

    def zeros(_):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    return jax.lax.cond(pred, draw_fn, zeros, None)


def _sched(value, count):
    """Resolve a static-or-schedule hyperparameter at the current step.

    The reference exposes these as mutable class attributes annealed by the
    demos (lr_preconditioner 0.5 -> 0.01-0.1, update probability 1.0 -> 0.01;
    SURVEY.md §5); the jit-able equivalent is an optax-style schedule
    ``Callable[[count], value]``."""
    return value(count) if callable(value) else value


def _squeezed_shape(shape) -> Tuple[int, ...]:
    """Drop singleton dims (reference squeezes grads, psgd.py:597)."""
    return tuple(int(s) for s in shape if int(s) != 1)


def _ema_update(mu, g, count, momentum):
    """Bias-warmed EMA: beta = min(count / (count+1), momentum)
    (psgd.py:604-611).  Accumulates in the momentum buffer's dtype (the
    reference wrappers keep momentum in the preconditioner dtype, ddp:139-143)."""
    beta = jnp.minimum(count / (count + 1.0), momentum)

    def upd(m, x):
        b = beta.astype(real_dtype_of(m.dtype))
        return b * m + (1.0 - b) * x.astype(m.dtype)

    return jax.tree_util.tree_map(upd, mu, g)


def _amp_clip(g: jax.Array, max_avg_amp, max_element_amp) -> jax.Array:
    """Per-tensor RMS + elementwise amplitude clipping (psgd.py:642-651).
    The RMS is accumulated in float32 (bf16 would over/underflow); the amps
    may be traced scalars (schedule-resolved)."""
    rdt = real_dtype_of(g.dtype)
    avg_amp = jnp.sqrt(jnp.mean(jnp.real(g * jnp.conj(g)).astype(jnp.float32)))
    g = g * jnp.minimum(1.0, max_avg_amp / jnp.maximum(avg_amp, 1e-30)).astype(rdt)
    max_el = jnp.asarray(max_element_amp, rdt)
    if jnp.issubdtype(g.dtype, jnp.complexfloating):
        g = g / jnp.maximum(jnp.abs(g) / max_el, 1.0)
    else:
        g = jnp.clip(g, -max_el, max_el)
    return g


def _global_norm_scale(tree, max_norm):
    """Trust-region scale min(1, max_norm / ||tree||) (psgd.py:967-971).
    ``max_norm`` may be a traced scalar (schedule-resolved)."""
    if isinstance(max_norm, (int, float)) and math.isinf(max_norm):
        return 1.0
    sq = sum(jnp.sum(jnp.real(x * jnp.conj(x))) for x in jax.tree_util.tree_leaves(tree))
    norm = jnp.sqrt(sq)
    return jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-38))


def _whiten_scale_from_grads(leaves, flags, damping):
    """On-the-fly init scale (mean|g|^4 + damping^4)^(-1/8), max over tensors
    (psgd.py:599-602); layer-stacked leaves count each layer as a tensor."""
    ms = []
    for g, f in zip(leaves, flags):
        g4 = jnp.abs(g.astype(jnp.float32)) ** 4
        if f:
            ms.append(jnp.max(jnp.mean(g4.reshape(g4.shape[0], -1), axis=1)))
        else:
            ms.append(jnp.mean(g4))
    return (jnp.stack(ms).max() + damping ** 4) ** (-1.0 / 8.0)


def _newton_scale_from_vh(v_leaves, h_leaves, damping):
    """(mean|v|^2)^(1/4) * (mean|h|^4 + damping^4)^(-1/8) (psgd.py:940-943)."""
    numel = sum(v.size for v in v_leaves)
    v2 = sum(jnp.sum(jnp.abs(v.astype(jnp.float32)) ** 2) for v in v_leaves) / numel
    h4 = jnp.stack([jnp.mean(jnp.abs(h.astype(jnp.float32)) ** 4) for h in h_leaves]).max()
    return v2 ** 0.25 * (h4 + damping ** 4) ** (-1.0 / 8.0)


def _rescale_kron_if(count0, kron_states, plans, scale):
    """Multiply Q by scale (squared for fit-P geometries) on the first step —
    the functional analogue of on-the-fly init (psgd.py:599-602)."""
    out = []
    for st, plan in zip(kron_states, plans):
        eff = scale * scale if plan.fits_p else scale
        order = max(plan.order, 1)
        mult = jnp.where(count0, eff ** (1.0 / order), 1.0)
        out.append(kron_p.KronState(
            q=tuple(q * mult.astype(real_dtype_of(q.dtype)) for q in st.q),
            lips=st.lips))
    return out


def _scan_flags(scanned_layers, leaves):
    """Normalize the ``scanned_layers`` pytree-of-bools to a per-leaf list.

    Leaves flagged True are stacks of per-layer tensors (leading axis =
    layer, as produced by a lax.scan-over-layers model like models.gpt2);
    the transform keeps one preconditioner per layer and vmaps the update
    over the stack — per-layer Q semantics identical to the reference's
    per-tensor treatment, at one fused XLA kernel for all layers."""
    if scanned_layers is None:
        return [False] * len(leaves)
    flags = jax.tree_util.tree_leaves(scanned_layers)
    if len(flags) != len(leaves):
        raise ValueError(
            f"scanned_layers has {len(flags)} leaves, params have {len(leaves)}")
    return [bool(f) for f in flags]


def _shared_flags(shared_layers, scan_flags, leaves):
    """Normalize ``shared_layers`` (True = every scanned leaf, or a
    pytree-of-bools matching params) to a per-leaf list; every shared leaf
    must also be marked in ``scanned_layers`` (the leading axis is the
    layer stack being pooled)."""
    if shared_layers is None:
        return [False] * len(leaves)
    if shared_layers is True:
        if not any(scan_flags):
            raise ValueError(
                "shared_layers=True pools each scanned layer stack, but no "
                "leaf is marked in scanned_layers — pass scanned_layers "
                "(otherwise the stack would get a dense cross-layer factor, "
                "not pooled per-layer whitening)")
        return list(scan_flags)
    shared = [bool(s) for s in jax.tree_util.tree_leaves(shared_layers)]
    if len(shared) != len(leaves):
        raise ValueError(
            f"shared_layers has {len(shared)} leaves, params have {len(leaves)}")
    bad = [i for i, (s, f) in enumerate(zip(shared, scan_flags)) if s and not f]
    if bad:
        raise ValueError(
            f"shared_layers marks leaves {bad} that are not in scanned_layers "
            "— factor sharing pools over the leading layer-stack axis")
    return shared


def _kron_plans(leaves, flags, shared, max_size, max_skew, dq):
    """Per-leaf KronPlans; shared (pooled) stacks force a diagonal factor on
    the layer axis so the whole stack is one plan (one set of dense factors
    + a per-layer diagonal)."""
    out = []
    for g, f, sh in zip(leaves, flags, shared):
        shape = _squeezed_shape(g.shape[1:] if f else g.shape)
        fd = ((True,) + (False,) * (len(shape) - 1)
              if sh and g.shape[0] > 1 else None)
        out.append(kron_p.make_kron_plan(shape, max_size, max_skew, dq,
                                         force_diag=fd))
    return out


def _scan_shared_flags(scanned_layers, shared_layers, leaves):
    """(vmapped-per-layer flags, shared flags): shared leaves are handled as
    ONE whole tensor (layer axis pooled by the plan's forced-diag factor),
    not vmapped per layer."""
    scan = _scan_flags(scanned_layers, leaves)
    shared = _shared_flags(shared_layers, scan, leaves)
    return [f and not s for f, s in zip(scan, shared)], shared


def _init_kron_leaf(plan, scale0, dtype, scanned, n_stack):
    st = kron_p.init_kron_from_plan(plan, scale0, dtype)
    if scanned:
        st = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (n_stack,) + (1,) * x.ndim), st)
    return st


def _fit_kron_leaf(st, plan, key, scanned, mode, g=None, v=None, h=None,
                   return_pg=False, **kw):
    """One whiten/newton Q update for a leaf; layer-stacked leaves go through
    the batched stacked update (one fused-kernel launch per dense factor).
    ``return_pg`` (whiten only) also returns the fit's internal P(g+damping*v)
    product so callers can reuse it as the apply (see update_kron_whiten)."""
    if return_pg and mode != "whiten":
        raise ValueError("return_pg only applies to whiten fits (the Newton "
                         "fit source is a (v, h) pair, never the apply source)")
    if mode == "whiten":
        if scanned:
            n = g.shape[0]
            gs = g.reshape((n,) + plan.shape)
            return kron_p.update_kron_whiten_stacked(
                st, plan, gs, jax.random.split(key, n),
                return_pg=return_pg, **kw)
        return kron_p.update_kron_whiten(st, plan, g.reshape(plan.shape),
                                         key, return_pg=return_pg, **kw)
    if scanned:
        n = v.shape[0]
        vs = v.reshape((n,) + plan.shape)
        hs = h.reshape((n,) + plan.shape)
        return kron_p.update_kron_newton_stacked(
            st, plan, vs, hs, jax.random.split(key, n), **kw)
    return kron_p.update_kron_newton(st, plan, v.reshape(plan.shape),
                                     h.reshape(plan.shape), key, **kw)


def _apply_kron_leaf(st, plan, g, scanned):
    if scanned:
        n = g.shape[0]
        gs = g.reshape((n,) + plan.shape)
        return jax.vmap(lambda s, gg: kron_p.precond_grad(s, plan, gg))(st, gs)
    return kron_p.precond_grad(st, plan, g.reshape(plan.shape))


def _cache_kron_leaf(st, plan, scanned):
    """Per-factor P_i = Q_i^H Q_i for one leaf (vmapped over a layer stack)."""
    if scanned:
        return jax.vmap(lambda s: kron_p.compute_p_factors(s, plan))(st)
    return kron_p.compute_p_factors(st, plan)


def _apply_kron_leaf_cached(pc, plan, g, scanned):
    if scanned:
        n = g.shape[0]
        gs = g.reshape((n,) + plan.shape)
        return jax.vmap(
            lambda p, gg: kron_p.precond_grad_cached(p, plan, gg))(pc, gs)
    return kron_p.precond_grad_cached(pc, plan, g.reshape(plan.shape))


def _stacked_specs(st: "kron_p.KronState", axis):
    from jax.sharding import PartitionSpec as PS
    return kron_p.KronState(
        q=tuple(PS(axis, *([None] * (f.ndim - 1))) for f in st.q),
        lips=tuple(PS(axis, *([None] * (l.ndim - 1))) for l in st.lips))


def _fit_apply_kron_leaf_layer_sharded(
        st, plan, key, mesh, axis, do_update, fit_src, apply_src,
        out_dtype, clip_amps=None, fit_first=True, share=False,
        pcache=None, always_fit=False, always_select=False, **fit_kw):
    """Fit (gated on do_update) + apply (+ optional per-layer clip) for one
    stacked leaf, shard_mapped over the layer axis: each device runs the
    vmapped update for exactly n_layer/k layers — compute scales 1/k by
    construction instead of relying on GSPMD's partitioning choices.
    Per-layer PRNG keys are the same split as the unsharded path, sliced by
    shard position, so results are bitwise-independent of k.

    ``fit_src`` is the stacked gradient (whiten mode) or a ``(v, h)`` pair
    (Newton mode; reference KronNewton applies post-fit and clips by global
    norm at tree level, psgd.py:945-971 — pass clip_amps=None there).

    ``pcache`` (cache_p) is the leaf's stacked cached-P factors, sharded
    like Q; returns ``(st_new, pcache_new, pg)`` then, refreshing the cache
    inside the shard_map on fit steps and applying through it otherwise."""
    from jax.sharding import PartitionSpec as PS
    newton = isinstance(fit_src, tuple)
    srcs = fit_src if newton else (fit_src,)
    n_total = srcs[0].shape[0]
    cached = pcache is not None

    def local(st_loc, *rest):
        if cached:
            pc_loc, *rest = rest
        *fit_loc, apply_loc, do_update = rest
        n_loc = fit_loc[0].shape[0]
        idx = jax.lax.axis_index(tuple(axis) if isinstance(axis, (tuple, list))
                                 else axis)
        keys = jax.lax.dynamic_slice_in_dim(
            jax.random.split(key, n_total), idx * n_loc, n_loc)

        def fit(s, return_pg=False):
            shaped = [x.reshape((n_loc,) + plan.shape) for x in fit_loc]
            if newton:
                return kron_p.update_kron_newton_stacked(
                    s, plan, shaped[0], shaped[1], keys, **fit_kw)
            return kron_p.update_kron_whiten_stacked(
                s, plan, shaped[0], keys, return_pg=return_pg, **fit_kw)

        def refresh(s):
            return jax.vmap(lambda x: kron_p.compute_p_factors(x, plan))(s)

        def apply(s, pc=None):
            shaped = apply_loc.reshape((n_loc,) + plan.shape)
            if pc is not None:
                return jax.vmap(
                    lambda p, gg: kron_p.precond_grad_cached(p, plan, gg))(
                        pc, shaped)
            return jax.vmap(lambda x, gg: kron_p.precond_grad(x, plan, gg))(
                s, shaped)

        def sel(a, b):
            # always_fit with a residual dynamic gate (pipelined_fit's
            # count>0): fit unconditionally, discard by select — cond-free
            if not always_select:
                return a
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(do_update, x, y), a, b)

        pc_new = None
        if share and not newton:
            # fit and apply sources coincide (validated by the transform):
            # reuse the fit's internal Pg on fit steps, apply with the
            # pre-update Q otherwise — one exprP chain either way.  share
            # excludes pipelined_fit, so always_fit means a static gate.
            if cached:
                def fit_branch(s):
                    ns, pg = fit(s, return_pg=True)
                    return ns, refresh(ns), pg
                if always_fit:  # static gate: see _static_always
                    st_new, pc_new, pg = fit_branch(st_loc)
                else:
                    st_new, pc_new, pg = jax.lax.cond(
                        do_update, fit_branch,
                        lambda s: (s, pc_loc, apply(s, pc_loc)), st_loc)
            elif always_fit:
                st_new, pg = fit(st_loc, return_pg=True)
            else:
                st_new, pg = jax.lax.cond(
                    do_update, lambda s: fit(s, return_pg=True),
                    lambda s: (s, apply(s)), st_loc)
        elif cached:
            if always_fit:
                fitted = fit(st_loc)
                st_new = sel(fitted, st_loc)
                pc_new = sel(refresh(fitted), pc_loc)
            else:
                st_new, pc_new = jax.lax.cond(
                    do_update,
                    lambda s: (lambda ns: (ns, refresh(ns)))(fit(s)),
                    lambda s: (s, pc_loc), st_loc)
            pg = apply(None, pc_new if fit_first else pc_loc)
        else:
            if always_fit:
                st_new = sel(fit(st_loc), st_loc)
            else:
                st_new = jax.lax.cond(do_update, fit, lambda s: s, st_loc)
            st_used = st_new if fit_first else st_loc
            pg = apply(st_used)
        pg = pg.astype(out_dtype)
        if clip_amps is not None:
            pg = jax.vmap(lambda x: _amp_clip(x, *clip_amps))(pg)
        return (st_new, pc_new, pg) if cached else (st_new, pg)

    from ..utils.compat import shard_map
    st_specs = _stacked_specs(st, axis)
    lead = lambda x: PS(axis, *([None] * (x.ndim - 1)))
    pc_specs = (tuple(lead(f) for f in pcache) if cached else None)
    if cached:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(st_specs, pc_specs,
                                 *[lead(s) for s in srcs],
                                 lead(apply_src), PS()),
                       out_specs=(st_specs, pc_specs, lead(apply_src)))
        return fn(st, pcache, *srcs, apply_src, do_update)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(st_specs, *[lead(s) for s in srcs],
                             lead(apply_src), PS()),
                   out_specs=(st_specs, lead(apply_src)))
    return fn(st, *srcs, apply_src, do_update)


def _squeeze_spec(shape, spec) -> Tuple[Tuple[str, ...], ...]:
    """Per-squeezed-dim tuple of mesh axes from a PartitionSpec (singleton
    dims dropped, like _squeezed_shape; sharding a singleton dim is a
    no-op so its entry is discarded)."""
    entries = tuple(spec) + (None,) * (len(shape) - len(tuple(spec)))
    out = []
    for s, e in zip(shape, entries):
        if int(s) == 1:
            continue
        if e is None:
            out.append(())
        elif isinstance(e, (tuple, list)):
            out.append(tuple(str(a) for a in e))
        else:
            out.append((str(e),))
    return tuple(out)


def _sharded_amp_clip(pg, clip_amps, psum_axes, total_numel):
    """_amp_clip with the RMS taken over the GLOBAL leaf (local sum + psum
    over the leaf's sharded axes)."""
    max_avg_amp, max_element_amp = clip_amps
    rdt = real_dtype_of(pg.dtype)
    ss = jnp.sum(jnp.real(pg * jnp.conj(pg)).astype(jnp.float32))
    if psum_axes:
        ss = jax.lax.psum(ss, psum_axes)
    avg_amp = jnp.sqrt(ss / total_numel)
    pg = pg * jnp.minimum(1.0, max_avg_amp / jnp.maximum(avg_amp, 1e-30)).astype(rdt)
    max_el = jnp.asarray(max_element_amp, rdt)
    if jnp.issubdtype(pg.dtype, jnp.complexfloating):
        return pg / jnp.maximum(jnp.abs(pg) / max_el, 1.0)
    return jnp.clip(pg, -max_el, max_el)


def _dim_sharded_state_specs(plan, eff_axes):
    """Specs for a dim-sharded leaf's KronState in the compute layout:
    diag factors sharded by their effective axes, dense replicated."""
    from jax.sharding import PartitionSpec as PS
    q_specs = []
    for i, diag in enumerate(plan.is_diag):
        if diag:
            q_specs.append(PS(eff_axes[i] if eff_axes[i] else None))
        else:
            q_specs.append(PS(None, None))
    return kron_p.KronState(q=tuple(q_specs),
                            lips=tuple(PS() for _ in plan.is_diag))


def _fit_apply_kron_leaf_dim_sharded(
        st, plan, key, mesh, dim_axes, do_update, fit_src, apply_src,
        out_dtype, clip_amps, fit_first=True, mode="whiten", share=False,
        pcache=None, always_fit=False, always_select=False, **fit_kw):
    """Fit + apply for a dim-sharded non-stacked leaf under shard_map: one
    GLOBAL preconditioner, local contractions + psum, with mesh axes on
    dense dims re-sharded onto a diag dim by all_to_all (see
    kron.update_kron_whiten_dim_sharded).  ``mode="newton"`` fits from a
    (v, h) pair passed as ``fit_src`` and skips the amp clip (the Newton
    transform clips by global norm at tree level).

    ``pcache`` (cache_p) is the leaf's cached-P factors stored in the same
    compute layout as the Q state (dense replicated, diag sharded by the
    reshard plan's effective axes); returns ``(st_new, pcache_new, pg)``
    then — the refresh is factor-local, so caching adds zero collectives."""
    from jax.sharding import PartitionSpec as PS
    from ..utils.compat import shard_map

    axis_sizes = dict(zip(mesh.axis_names,
                          (int(s) for s in mesh.devices.shape)))
    rplan = kron_p.dim_shard_reshard_plan(plan, dim_axes, axis_sizes)
    eff_axes = rplan[0]
    leaf_spec = PS(*[axes if axes else None for axes in dim_axes])
    state_specs = _dim_sharded_state_specs(plan, eff_axes)
    all_axes = tuple(ax for axes in dim_axes for ax in axes)
    cached = pcache is not None
    # cached-P factors mirror the Q layout: P_i has q_i's rank
    pc_specs = tuple(state_specs.q) if cached else None

    if mode == "newton":
        def local(st_loc, *rest):
            if cached:
                pc_loc, *rest = rest
            v_loc, h_loc, apply_loc, do_update = rest
            res = kron_p.update_kron_newton_dim_sharded(
                st_loc, plan, v_loc, h_loc, key, dim_axes, rplan, apply_loc,
                do_update, fit_first=fit_first,
                pcache=pc_loc if cached else None,
                always_fit=always_fit, **fit_kw)
            return res[:-1] + (res[-1].astype(out_dtype),)

        v_src, h_src = fit_src
        if cached:
            fn = shard_map(local, mesh=mesh,
                           in_specs=(state_specs, pc_specs, leaf_spec,
                                     leaf_spec, leaf_spec, PS()),
                           out_specs=(state_specs, pc_specs, leaf_spec),
                           check_rep=False)
            return fn(st, pcache, v_src, h_src, apply_src, do_update)
        fn = shard_map(local, mesh=mesh,
                       in_specs=(state_specs, leaf_spec, leaf_spec,
                                 leaf_spec, PS()),
                       out_specs=(state_specs, leaf_spec), check_rep=False)
        return fn(st, v_src, h_src, apply_src, do_update)

    def local(st_loc, *rest):
        if cached:
            pc_loc, *rest = rest
        fit_loc, apply_loc, do_update = rest
        res = kron_p.update_kron_whiten_dim_sharded(
            st_loc, plan, fit_loc, key, dim_axes, rplan, apply_loc,
            do_update, fit_first=fit_first, share=share,
            pcache=pc_loc if cached else None,
            always_fit=always_fit, always_select=always_select, **fit_kw)
        pg = _sharded_amp_clip(res[-1].astype(out_dtype), clip_amps,
                               all_axes, plan.numel)
        return res[:-1] + (pg,)

    if cached:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(state_specs, pc_specs, leaf_spec,
                                 leaf_spec, PS()),
                       out_specs=(state_specs, pc_specs, leaf_spec),
                       check_rep=False)
        return fn(st, pcache, fit_src, apply_src, do_update)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(state_specs, leaf_spec, leaf_spec, PS()),
                   out_specs=(state_specs, leaf_spec), check_rep=False)
    return fn(st, fit_src, apply_src, do_update)


class PSGDState(NamedTuple):
    """Common optimizer state: step count, PRNG key, momentum, preconditioner.

    ``pcache`` (None unless ``cache_p=True`` on the Kron transforms) holds
    per-leaf tuples of cached P_i = Q_i^H Q_i factors, refreshed on fit steps
    (kron.compute_p_factors)."""
    count: jax.Array
    key: jax.Array
    mu: Any
    precond: Any
    pcache: Any = None


def _advisories(init_scale, whiten_grad, momentum, dq, q_dtype):
    """The reference classes' stdout advisories (psgd.py:557, 564, 568),
    surfaced as Python warnings at transform construction."""
    if init_scale is None:
        warnings.warn(
            "Preconditioner initial scale will be set on the fly from the "
            "first step's statistics; recommend setting "
            "preconditioner_init_scale manually.", stacklevel=3)
    if not whiten_grad and momentum > 0:
        factor = ((1 + momentum) / (1 - momentum)) ** 0.5
        warnings.warn(
            f"Momentum whitening: recommend dividing the gradient-whitening "
            f"learning rate by {factor:.2f} for this setting.", stacklevel=3)
    if dq in kron_p._FIT_P and q_dtype is not None and \
            jnp.finfo(jnp.dtype(q_dtype)).eps > 1e-6:
        warnings.warn(
            "Fitting P directly (QUAD4P/PRO4P) in half precision is risky; "
            "prefer float32 preconditioner_dtype for the *4P geometries.",
            stacklevel=3)


# ---------------------------------------------------------------------------
# Kron whitening (flagship; reference class KronWhiten, psgd.py:516-654)
# ---------------------------------------------------------------------------


def scale_by_kron_whiten(
    preconditioner_max_size: float = float("inf"),
    preconditioner_max_skew: float = 1.0,
    preconditioner_init_scale: Optional[float] = None,
    lr_preconditioner: float | Callable = 0.1,
    betaL: float | Callable = 0.9,
    damping: float | Callable = 1e-9,
    momentum: float = 0.0,
    momentum_dtype: Any = None,
    grad_clip_max_amps: Tuple[float | Callable, float | Callable] = (2.0, 10.0),
    preconditioner_update_probability: float | Callable = 1.0,
    update_preconditioner_first: bool = True,
    whiten_grad: bool = True,
    dq: str = "Q0.5EQ1.5",
    preconditioner_dtype: Any = None,
    norm_k: Optional[int] = None,
    seed: int = 0,
    scanned_layers: Any = None,
    shared_layers: Any = None,
    stack_sharding: Optional[Tuple[Any, str]] = None,
    factor_sharding: Optional[Tuple[Any, Any]] = None,
    pipelined_fit: bool = False,
    share_fit_apply: bool = False,
    cache_p: bool = False,
) -> optax.GradientTransformation:
    """Kronecker-factored gradient/momentum whitening preconditioner.

    Emits the clipped preconditioned gradient (chain with
    ``optax.scale_by_learning_rate``).  Hyperparameters follow the reference
    KronWhiten class; ``whiten_grad=False`` whitens the momentum instead and
    requires ``momentum > 0`` (psgd.py:561-564).  ``scanned_layers`` is an
    optional pytree of bools (matching params) marking layer-stacked leaves:
    those get one preconditioner per layer, vmapped over the stack.

    ``stack_sharding=(mesh, axis)`` runs each stacked leaf's fit + apply
    under an explicit shard_map over the layer axis (ZeRO-style): each
    device computes exactly n_layer/k layers' Q work, instead of relying on
    GSPMD partitioning choices.  Pair with
    ``parallel.psgd_state_specs(..., stack_axis=axis)`` so the Q/L state
    lives layer-sharded; n_layer must divide by the mesh axis size.

    ``factor_sharding=(mesh, param_specs)`` covers the NON-stacked leaves
    whose dims are sharded (embeddings under fsdp/tp): their fit + apply run
    under shard_map with local contractions + one psum per dense factor
    (SURVEY.md §7 "Sharded factor updates"), keeping one GLOBAL Q per leaf —
    same math as replicated, ~1/k compute per device.  Pair with
    ``psgd_state_specs(..., factor_sharding_params=params)`` so diag factors
    live sharded along their dims.  Matmul-only geometries (Q0.5EQ1.5,
    QUAD, QEQ).

    ``shared_layers`` (True, or a pytree-of-bools ⊆ ``scanned_layers``)
    pools the whitening statistics of a layer stack into ONE set of Kron
    factors shared by all L layers, plus a per-layer diagonal factor that
    keeps layer-wise scale adaptive.  Q-update FLOPs and factor memory drop
    L-fold versus per-layer factors (the fit contracts over the layer axis
    as extra samples); the whitening target becomes the POOLED per-layer
    covariance — a deliberate statistical trade the reference cannot
    express (its state is strictly per-tensor, psgd.py:161-263).  Shared
    leaves are not routed through stack/factor sharding (there is no
    per-layer Q to partition; GSPMD shards the pooled contractions).

    ``pipelined_fit=True`` fits Q on the PREVIOUS step's momentum (the
    buffer before this step's EMA update) instead of the current one.  The
    fit then reads only optimizer state — zero data dependency on this
    step's gradients (jvp exactly 0, tests/test_pipelined_fit.py) — so
    inside a jitted train step XLA's scheduler is free to place the whole
    Q fit, including the stack/factor sharding collectives, anywhere
    relative to the model's forward/backward (at a LITERAL update
    probability 1.0 the fit is also cond-free — see `always_fit` below —
    which is what makes that freedom real: a lax.cond is a separate HLO
    computation, i.e. a scheduling barrier).  Measured on one v5e chip the
    flag is free (+0.05 ms at GPT-2 124M, results/pipelined_fit_overlap
    .json), but a single serial core has no idle unit to hide the fit in;
    the intended payoff — fit collectives riding under bwd compute on a
    sharded mesh (SURVEY.md §7) — is EXPERIMENTAL: structurally enabled
    and single-chip-validated, not yet profiled on multi-chip hardware.
    One-step-delayed stochastic fitting has the same whitening fixed point;
    the first fit happens at step 1 (step 0's buffer is zeros).  Requires
    momentum whitening (``whiten_grad=False``, the production GPT-2 recipe,
    misc/gpt2.py:400-413) so the stale source is the momentum buffer itself
    (no extra state), and an explicit ``preconditioner_init_scale`` (the
    on-the-fly scale would re-introduce a gradient dependency).

    ``share_fit_apply=True`` reuses the P(src + damping*v) product the Q fit
    already computes as the step's preconditioned update, skipping the
    separate exprP apply chain on fit steps (~the single largest einsum in
    the optimizer at update_probability 1.0; the reference always pays both,
    psgd.py:402 + :628-631).  The shared product differs from P(src) by
    O(damping + eps(dtype)|src|) white noise — below bf16 quantization noise
    at the default damping.  Requires the fit and apply sources to coincide
    (``whiten_grad=True`` with ``momentum == 0``, or momentum whitening
    ``whiten_grad=False``), ``update_preconditioner_first=False`` (the apply
    must use the pre-update Q the fit's product was computed with), no
    ``pipelined_fit`` (its fit source is the stale momentum), and a dQ that
    evaluates the full apply product during the fit (every geometry except
    EQ).  Applies on every routing: plain leaves, ``scanned_layers`` stacks,
    ``stack_sharding`` (shared inside the layer shard_map), and
    ``factor_sharding`` (shared inside the dim-sharded shard_map, in the
    compute layout).

    ``cache_p=True`` caches P_i = Q_i^H Q_i per factor after every Q fit, so
    the apply on NON-fit steps is a single factor pass (the *4P apply cost,
    psgd.py:573) instead of the two-sided exprP chain — it removes the
    Q_i^H Q_i recomputation, leaving only the irreducible P_i*G
    contractions: 2x fewer apply matmul FLOPs on square dense-dense leaves,
    a (m+n)/n factor on dense(m) x diag(n) leaves.  The payoff regime is
    FLOP-bound applies at the production operating point (update
    probability annealed to 0.01-0.1, where the apply chain dominates
    optimizer cost): measured optimizer step 0.94x (width 128) / 0.87x
    (width 512 — the saving grows with width) at p = 0.03 in f32
    (results/cache_p_cpu.json).  Know the limits: XLA's einsum already
    contracts Q^H Q first where that is cheaper, so what caching removes is
    the per-step n^3 recompute — on a BANDWIDTH-bound step (bf16 state on
    one TPU chip at GPT-2 124M) that saving is offset by the extra cached
    state's traffic and the full train step measured ~neutral-to-slightly-
    slower (bench.py psgd_p0.1_cached_ratio 1.0122 vs plain 1.0031); the
    claimed FLOP-bound regime was also measured ON-CHIP and still does not
    win there (f32 state p=0.03/0.1: 1.008-1.009x, exact-Hvp Newton p=0.1:
    1.001x, at +23% optimizer state — results/cache_p_tpu.json), so on a
    v5e prefer the plain apply; the knob's measured payoff is CPU /
    genuinely FLOP-bound deployments.  At p = 1.0 it always loses slightly
    (every fit pays the refresh).  Donate
    the optimizer state into the jitted step (standard practice): on
    non-fit steps the unchanged cache rides through a lax.cond, which
    costs a copy without donation.  Same trajectory to float rounding (the
    cached product reassociates the einsum).  Costs one extra set of dense
    factors of state.  Composes with ``share_fit_apply`` (fit steps reuse
    the fit's Pg, non-fit steps apply through the cache) and
    ``pipelined_fit`` (the refresh reads only post-fit state, so it
    overlaps too).  ``stack_sharding`` leaves refresh and apply the cache
    inside the layer shard_map (cache sharded like Q; specs via
    ``psgd_state_specs``), and ``factor_sharding`` leaves store the cache
    in the same compute layout as their Q (dense P replicated, diag P
    sharded — the refresh is factor-local, zero extra collectives).  Not
    meaningful for the fit-P geometries (their apply is already one pass).

    `always_fit` (automatic, not a kwarg): when
    ``preconditioner_update_probability`` is a LITERAL number >= 1.0, the
    fit gate ``uniform([0,1)) < p`` is statically true and the lax.cond
    around the Q fit is dropped entirely — the fit ops join the entry
    computation where XLA can schedule them against the rest of the step
    (a cond lowers to a separate HLO computation: a scheduling barrier).
    Exactly the same math (the cond was always taken); under
    ``pipelined_fit`` the remaining count>0 gate becomes a select and step
    0's dead fit on the zeros buffer is discarded.  A schedule (even a
    constant one) keeps the cond path.  tests/test_always_fit.py pins the
    two paths to each other.
    """
    dq = kron_p.canonical_dq(dq)
    momentum = momentum if 0.0 < momentum < 1.0 else 0.0
    if not whiten_grad and momentum == 0.0:
        raise ValueError("Cannot whiten momentum with momentum == 0")
    if pipelined_fit:
        if whiten_grad:
            raise ValueError(
                "pipelined_fit requires momentum whitening "
                "(whiten_grad=False, momentum > 0): the previous step's "
                "fit source must already live in the optimizer state")
        if preconditioner_init_scale is None:
            raise ValueError(
                "pipelined_fit requires an explicit preconditioner_init_scale "
                "(the on-the-fly scale reads the current gradients, which "
                "would re-couple the fit to the backward pass)")
    if share_fit_apply:
        if update_preconditioner_first:
            raise ValueError(
                "share_fit_apply requires update_preconditioner_first=False: "
                "the shared product is computed with the pre-update Q")
        if pipelined_fit:
            raise ValueError(
                "share_fit_apply is incompatible with pipelined_fit (the "
                "pipelined fit source is the previous step's momentum, not "
                "this step's apply source)")
        if momentum > 0 and whiten_grad:
            raise ValueError(
                "share_fit_apply requires the fit and apply sources to "
                "coincide: use whiten_grad=False (momentum whitening) or "
                "momentum=0")
        if dq == kron_p.DQ_EQ:
            raise ValueError("share_fit_apply is unsupported for dq='EQ' "
                             "(the EQ fit never forms the full Pg product)")
    if cache_p and dq in kron_p._FIT_P:
        raise ValueError(
            "cache_p is a no-op for the fit-P geometries (QUAD4P/PRO4P): "
            "their apply is already a single factor pass — drop cache_p")
    _advisories(preconditioner_init_scale, whiten_grad, momentum, dq,
                preconditioner_dtype)

    def _plans(leaves, flags, shared):
        return _kron_plans(leaves, flags, shared, preconditioner_max_size,
                           preconditioner_max_skew, dq)

    def _flags_shared(leaves):
        return _scan_shared_flags(scanned_layers, shared_layers, leaves)

    def _qdtype(leaf):
        return preconditioner_dtype if preconditioner_dtype is not None else leaf.dtype

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        flags, shared = _flags_shared(leaves)
        plans = _plans(leaves, flags, shared)
        scale0 = 1.0 if preconditioner_init_scale is None else preconditioner_init_scale
        kron_states = [
            _init_kron_leaf(p, scale0, _qdtype(l), f, l.shape[0] if f else 1)
            for p, l, f in zip(plans, leaves, flags)]
        mu = (jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, momentum_dtype or x.dtype), params)
            if momentum > 0 else None)
        pcache0 = (tuple(_cache_kron_leaf(st, p, f) for st, p, f
                         in zip(kron_states, plans, flags))
                   if cache_p else None)
        return PSGDState(count=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(seed),
                         mu=mu, precond=tuple(kron_states), pcache=pcache0)

    def update_fn(updates, state, params=None):
        del params
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        flags, shared = _flags_shared(leaves)
        plans = _plans(leaves, flags, shared)

        def leaf_view(x, f, plan):
            return x.reshape(((x.shape[0],) if f else ()) + plan.shape)

        sq = [leaf_view(g, f, p) for g, f, p in zip(leaves, flags, plans)]

        def _cache_all(states):
            return tuple(_cache_kron_leaf(st, p, f)
                         for st, p, f in zip(states, plans, flags))

        kron_states = list(state.precond)
        pcache_t = state.pcache
        if preconditioner_init_scale is None:
            # the |g|^4 sweep over every leaf is only needed once; gate it
            # under lax.cond so step 1+ never executes it (it costs ~one HBM
            # pass over the gradients per step otherwise)
            scale = jax.lax.cond(
                state.count == 0,
                lambda: _whiten_scale_from_grads(
                    leaves, flags, _sched(damping, state.count)),
                lambda: jnp.ones((), jnp.float32))
            kron_states = _rescale_kron_if(state.count == 0, kron_states, plans, scale)
            if cache_p:
                # Q changed on step 0 (on-the-fly rescale): refresh the cache
                pcache_t = jax.lax.cond(
                    state.count == 0,
                    lambda: _cache_all(tuple(kron_states)),
                    lambda: state.pcache)

        # momentum EMA (bias-warmed)
        if momentum > 0:
            mu = _ema_update(state.mu, updates, state.count, momentum)
            mu_leaves = jax.tree_util.tree_leaves(mu)
        else:
            mu, mu_leaves = None, None

        key, k_gate, k_fit = jax.random.split(state.key, 3)
        do_update = (jax.random.uniform(k_gate)
                     < _sched(preconditioner_update_probability, state.count))
        # static p >= 1.0: uniform() draws from [0, 1), so the gate is
        # statically true — drop the lax.cond around the fit entirely.  A
        # cond lowers to a separate HLO computation, i.e. a scheduling
        # barrier; without it the fit ops live in the entry computation
        # where XLA's latency-hiding scheduler can interleave them with the
        # model's forward/backward (the pipelined_fit contract; measured
        # schedule: tools/pipelined_fit_overlap.py).  Under pipelined_fit
        # the remaining count>0 gate becomes a cheap select on the fitted
        # state (step 0's dead fit on the zeros buffer is discarded).
        always_fit = _static_always(preconditioner_update_probability)

        if pipelined_fit:
            # fit on the PRE-update momentum: the fit subgraph reads only
            # optimizer state, so XLA can overlap it (and its sharding
            # collectives) with the model's forward/backward pass.  Step 0's
            # buffer is zeros — first fit at step 1.
            do_update = jnp.logical_and(do_update, state.count > 0)
            fit_sources = [leaf_view(m, f, p) for m, f, p in
                           zip(jax.tree_util.tree_leaves(state.mu),
                               flags, plans)]
        elif whiten_grad:
            fit_sources = sq
        else:
            fit_sources = [leaf_view(m, f, p)
                           for m, f, p in zip(mu_leaves, flags, plans)]
        apply_sources = ([leaf_view(m, f, p)
                          for m, f, p in zip(mu_leaves, flags, plans)]
                         if momentum > 0 else sq)
        # schedule-resolved hyperparameters (the reference's "everything
        # mutable on the fly" contract, SURVEY.md §5 — here as schedules)
        lr_q = _sched(lr_preconditioner, state.count)
        beta_l_t = _sched(betaL, state.count)
        damping_t = _sched(damping, state.count)
        clip_amps = tuple(_sched(a, state.count) for a in grad_clip_max_amps)
        # leaves routed through the explicit layer-axis shard_map: only
        # those with at least one dense factor — all-diagonal leaves (biases,
        # layernorms) have elementwise-small Q work, and resharding their
        # grads to layer shards costs more than it saves
        layer_sharded = [
            f and stack_sharding is not None and not all(p.is_diag)
            for f, p in zip(flags, plans)]
        # non-stacked leaves with sharded dims -> the dim-sharded shard_map
        # path (local contractions + psum; embeddings)
        dim_sharded = [None] * len(leaves)
        if factor_sharding is not None:
            fs_mesh, fs_specs = factor_sharding
            from jax.sharding import PartitionSpec as _PS
            spec_leaves = jax.tree_util.tree_leaves(
                fs_specs, is_leaf=lambda x: isinstance(x, _PS))
            if len(spec_leaves) != len(leaves):
                raise ValueError("factor_sharding specs do not match params")
            for i, (g, f, p, spec) in enumerate(
                    zip(leaves, flags, plans, spec_leaves)):
                if f or shared[i] or p.dq not in kron_p.DIM_SHARDABLE_DQS:
                    continue
                axes = _squeeze_spec(g.shape, spec)
                if any(axes):
                    dim_sharded[i] = axes
        routed = [ls or (ds is not None)
                  for ls, ds in zip(layer_sharded, dim_sharded)]

        def fit_all(states, return_pg=False):
            out, pgs = [], []
            with jax.named_scope("psgd_q_fit"):
                for i, (st, plan, f, ls, src) in enumerate(
                        zip(states, plans, flags, routed, fit_sources)):
                    if ls:
                        out.append(st)  # handled by a fused sharded path
                        pgs.append(None)
                        continue
                    qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
                    res = _fit_kron_leaf(
                        st, plan, jax.random.fold_in(k_fit, i), f, "whiten",
                        g=src.astype(qdt), lr=lr_q, beta_l=beta_l_t,
                        damping=damping_t, norm_k=resolve_norm_k(norm_k, qdt),
                        return_pg=return_pg)
                    if return_pg:
                        res, pg = res
                        pgs.append(pg)
                    out.append(res)
            return (tuple(out), pgs) if return_pg else tuple(out)

        def fit_now(states):
            # the cond-free fit (always_fit): under pipelined_fit, step 0's
            # fit read the all-zeros momentum buffer — discard it with a
            # select (values only; both sides are the same pytree)
            fitted = fit_all(states)
            if pipelined_fit:
                keep = state.count > 0
                fitted = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(keep, a, b), fitted, states)
            return fitted

        def apply_all_raw(states, pcs=None):
            # raw P·src per leaf in the Q dtype (None for routed leaves);
            # ``pcs`` (cache_p) applies through the cached P_i factors
            out = []
            with jax.named_scope("psgd_p_apply"):
                for i, (st, plan, f, ls, src) in enumerate(
                        zip(states, plans, flags, routed, apply_sources)):
                    if ls:
                        out.append(None)  # handled by a fused sharded path
                        continue
                    qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
                    if pcs is not None:
                        out.append(_apply_kron_leaf_cached(
                            pcs[i], plan, src.astype(qdt), f))
                    else:
                        out.append(_apply_kron_leaf(st, plan,
                                                    src.astype(qdt), f))
            return out

        def _finish(raw):
            # cast + per-tensor amp clip + reshape (psgd.py:642-651)
            out = []
            for pg, f, g in zip(raw, flags, leaves):
                if pg is None:
                    out.append(None)
                    continue
                pg = pg.astype(g.dtype)
                if f:  # per-layer clipping, like per-tensor in the reference
                    pg = jax.vmap(lambda x: _amp_clip(x, *clip_amps))(pg)
                else:
                    pg = _amp_clip(pg, *clip_amps)
                out.append(pg.reshape(g.shape))
            return out

        def apply_all(states):
            # precondition the momentum if enabled, else the gradient
            # (psgd.py:628-631) — independent of what Q is fitted on.
            return _finish(apply_all_raw(states))

        def _cache_unrouted(states):
            # routed leaves refresh their cache INSIDE the sharded fit+apply
            # paths (in the sharded layout); pass their entries through here
            return tuple(
                pcache_t[i] if routed[i] else _cache_kron_leaf(st, p, f)
                for i, (st, p, f) in enumerate(zip(states, plans, flags)))

        def fit_and_cache(s):
            ns = fit_all(s)
            return ns, _cache_unrouted(ns)

        states_t = tuple(kron_states)
        if share_fit_apply:
            # one exprP chain per leaf per step: on fit steps the fit's
            # internal P(src + damping*v) IS the preconditioned update (the
            # sources coincide and the fit uses the pre-update Q, both
            # validated above); otherwise apply as usual.
            if always_fit:  # static gate (pipelined_fit excluded here):
                states_t, raw = fit_all(states_t, return_pg=True)
                if cache_p:
                    pcache_t = _cache_unrouted(states_t)
            elif cache_p:
                def fit_branch(s):
                    ns, pgs = fit_all(s, return_pg=True)
                    return ns, _cache_unrouted(ns), pgs
                states_t, pcache_t, raw = jax.lax.cond(
                    do_update, fit_branch,
                    lambda s: (s, pcache_t, apply_all_raw(s, pcache_t)),
                    states_t)
            else:
                states_t, raw = jax.lax.cond(
                    do_update, lambda s: fit_all(s, return_pg=True),
                    lambda s: (s, apply_all_raw(s)), states_t)
            pre = _finish(raw)
        elif update_preconditioner_first:  # biased update (psgd.py:615-618)
            if always_fit:
                states_t = fit_now(states_t)
                if cache_p:
                    # every step is a fit step: refresh unconditionally (at
                    # a discarded pipelined step 0 this recomputes the same
                    # cache from the unchanged Q)
                    pcache_t = _cache_unrouted(states_t)
                    pre = _finish(apply_all_raw(states_t, pcache_t))
                else:
                    pre = apply_all(states_t)
            elif cache_p:
                states_t, pcache_t = jax.lax.cond(
                    do_update, fit_and_cache, lambda s: (s, pcache_t),
                    states_t)
                pre = _finish(apply_all_raw(states_t, pcache_t))
            else:
                states_t = jax.lax.cond(do_update, fit_all, lambda s: s,
                                        states_t)
                pre = apply_all(states_t)
        else:  # unbiased: precondition with the pre-update Q
            if always_fit:
                pre = (_finish(apply_all_raw(states_t, pcache_t))
                       if cache_p else apply_all(states_t))
                states_t = fit_now(states_t)
                if cache_p:
                    pcache_t = _cache_unrouted(states_t)
            elif cache_p:
                pre = _finish(apply_all_raw(states_t, pcache_t))
                states_t, pcache_t = jax.lax.cond(
                    do_update, fit_and_cache, lambda s: (s, pcache_t),
                    states_t)
            else:
                pre = apply_all(states_t)
                states_t = jax.lax.cond(do_update, fit_all, lambda s: s,
                                        states_t)

        if stack_sharding is not None and any(layer_sharded):
            mesh_, axis_ = stack_sharding
            states_t = list(states_t)
            pcache_t = list(pcache_t) if cache_p else pcache_t
            for i, (st, plan, ls, fsrc, asrc, g) in enumerate(
                    zip(states_t, plans, layer_sharded, fit_sources,
                        apply_sources, leaves)):
                if not ls:
                    continue
                qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
                res = _fit_apply_kron_leaf_layer_sharded(
                    st, plan, jax.random.fold_in(k_fit, i), mesh_, axis_,
                    do_update, fsrc.astype(qdt), asrc.astype(qdt),
                    g.dtype, clip_amps,
                    fit_first=update_preconditioner_first,
                    share=share_fit_apply,
                    pcache=pcache_t[i] if cache_p else None,
                    always_fit=always_fit, always_select=pipelined_fit,
                    lr=lr_q, beta_l=beta_l_t, damping=damping_t,
                    norm_k=resolve_norm_k(norm_k, qdt))
                if cache_p:
                    st_new, pcache_t[i], pg = res
                else:
                    st_new, pg = res
                states_t[i] = st_new
                pre[i] = pg.reshape(g.shape)
            states_t = tuple(states_t)
            pcache_t = tuple(pcache_t) if cache_p else pcache_t

        if factor_sharding is not None and any(ds is not None
                                               for ds in dim_sharded):
            fs_mesh, _ = factor_sharding
            states_t = list(states_t)
            pcache_t = list(pcache_t) if cache_p else pcache_t
            for i, (st, plan, ds, fsrc, asrc, g) in enumerate(
                    zip(states_t, plans, dim_sharded, fit_sources,
                        apply_sources, leaves)):
                if ds is None:
                    continue
                qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
                res = _fit_apply_kron_leaf_dim_sharded(
                    st, plan, jax.random.fold_in(k_fit, i), fs_mesh, ds,
                    do_update, fsrc.astype(qdt), asrc.astype(qdt),
                    g.dtype, clip_amps,
                    fit_first=update_preconditioner_first,
                    share=share_fit_apply,
                    pcache=pcache_t[i] if cache_p else None,
                    always_fit=always_fit, always_select=pipelined_fit,
                    lr=lr_q, beta_l=beta_l_t, damping=damping_t,
                    norm_k=resolve_norm_k(norm_k, qdt))
                if cache_p:
                    st_new, pcache_t[i], pg = res
                else:
                    st_new, pg = res
                states_t[i] = st_new
                pre[i] = pg.reshape(g.shape)
            states_t = tuple(states_t)
            pcache_t = tuple(pcache_t) if cache_p else pcache_t

        new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                              precond=states_t, pcache=pcache_t)
        return jax.tree_util.tree_unflatten(treedef, pre), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _with_weight_decay(core, learning_rate, weight_decay, weight_decay_mode):
    """Chain a scale_by_* core with weight decay and -lr scaling.

    'decoupled': wd added to the post-preconditioner update (AdamW-style,
    the reference wrapper's `p *= 1 - wd*lr`, ddp:118-119); 'classic': wd
    added to the raw gradient before preconditioning (`g += wd*p`,
    ddp:121-122)."""
    if weight_decay_mode not in ("decoupled", "classic"):
        raise ValueError(f"unknown weight_decay_mode {weight_decay_mode!r}")
    txs = []
    if weight_decay and weight_decay_mode == "classic":
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(core)
    if weight_decay and weight_decay_mode == "decoupled":
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)


def kron_whiten(learning_rate: float | Callable = 1e-3,
                weight_decay: float = 0.0,
                weight_decay_mode: str = "decoupled",
                **kwargs) -> optax.GradientTransformation:
    """KronWhiten optimizer: whitening transform + weight decay + -lr
    scaling.  Matches reference defaults (lr_params=1e-3)."""
    return _with_weight_decay(scale_by_kron_whiten(**kwargs), learning_rate,
                              weight_decay, weight_decay_mode)


# ---------------------------------------------------------------------------
# Kron Newton (reference class KronNewton, psgd.py:832-978)
# ---------------------------------------------------------------------------


def scale_by_kron_newton(
    preconditioner_max_size: float = float("inf"),
    preconditioner_max_skew: float = 1.0,
    preconditioner_init_scale: Optional[float] = None,
    lr_preconditioner: float | Callable = 0.1,
    betaL: float | Callable = 0.9,
    damping: float | Callable = 1e-9,
    momentum: float = 0.0,
    momentum_dtype: Any = None,
    grad_clip_max_norm: float | Callable = float("inf"),
    preconditioner_update_probability: float | Callable = 1.0,
    dq: str = "Q0.5EQ1.5",
    preconditioner_dtype: Any = None,
    norm_k: Optional[int] = None,
    seed: int = 0,
    scanned_layers: Any = None,
    shared_layers: Any = None,
    stack_sharding: Optional[Tuple[Any, str]] = None,
    factor_sharding: Optional[Tuple[Any, Any]] = None,
    cache_p: bool = False,
) -> optax.GradientTransformationExtraArgs:
    """Kron Newton-type preconditioner fed by Hessian-vector products.

    ``update`` takes either ``hvp_fn(params, vs) -> (grads, hvs)`` (the
    preconditioner draws vs and evaluates the Hvp only on update steps, under
    lax.cond — mirroring the update-probability gating of the reference,
    psgd.py:914) or explicit ``vs``/``hvs`` pytrees.  ``scanned_layers``
    marks layer-stacked leaves (see scale_by_kron_whiten).

    ``stack_sharding=(mesh, axis)`` and ``factor_sharding=(mesh, specs)``
    mirror scale_by_kron_whiten: stacked leaves fit + apply under an
    explicit layer-axis shard_map (ZeRO-style Q partitioning), and
    dim-sharded non-stacked leaves (embeddings) fit with local contractions
    + psum on one global Q (Q0.5EQ1.5, QUAD, QEQ).  The fit source here is the
    (v, Hvp) pair instead of the gradient.  ``shared_layers`` pools a layer
    stack's curvature into ONE shared set of Kron factors plus a per-layer
    diagonal (see scale_by_kron_whiten).

    ``cache_p=True`` caches P_i = Q_i^H Q_i after each fit so the apply on
    non-fit steps is a single factor pass — see scale_by_kron_whiten; the
    payoff regime here is ``preconditioner_update_probability`` well below 1
    (Hvp steps are the expensive ones anyway).
    """
    dq = kron_p.canonical_dq(dq)
    momentum = momentum if 0.0 < momentum < 1.0 else 0.0
    if cache_p and dq in kron_p._FIT_P:
        raise ValueError(
            "cache_p is a no-op for the fit-P geometries (QUAD4P/PRO4P): "
            "their apply is already a single factor pass — drop cache_p")
    _advisories(preconditioner_init_scale, True, 0.0, dq,
                preconditioner_dtype)

    def _plans(leaves, flags, shared):
        return _kron_plans(leaves, flags, shared, preconditioner_max_size,
                           preconditioner_max_skew, dq)

    def _flags_shared(leaves):
        return _scan_shared_flags(scanned_layers, shared_layers, leaves)

    def _qdtype(leaf):
        return preconditioner_dtype if preconditioner_dtype is not None else leaf.dtype

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        flags, shared = _flags_shared(leaves)
        plans = _plans(leaves, flags, shared)
        scale0 = 1.0 if preconditioner_init_scale is None else preconditioner_init_scale
        kron_states = [
            _init_kron_leaf(p, scale0, _qdtype(l), f, l.shape[0] if f else 1)
            for p, l, f in zip(plans, leaves, flags)]
        mu = (jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, momentum_dtype or x.dtype), params)
            if momentum > 0 else None)
        pcache0 = (tuple(_cache_kron_leaf(st, p, f) for st, p, f
                         in zip(kron_states, plans, flags))
                   if cache_p else None)
        return PSGDState(count=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(seed),
                         mu=mu, precond=tuple(kron_states), pcache=pcache0)

    def update_fn(updates, state, params=None, *, hvp_fn=None, vs=None,
                  hvs=None, **extra):
        del extra
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        flags, shared = _flags_shared(leaves)
        plans = _plans(leaves, flags, shared)

        key, k_gate, k_v, k_fit = jax.random.split(state.key, 4)
        lr_q = _sched(lr_preconditioner, state.count)
        beta_l_t = _sched(betaL, state.count)
        damping_t = _sched(damping, state.count)

        # leaves routed through explicit shard_map paths (see whiten)
        layer_sharded = [
            f and stack_sharding is not None and not all(p.is_diag)
            for f, p in zip(flags, plans)]
        dim_sharded = [None] * len(leaves)
        if factor_sharding is not None:
            fs_mesh, fs_specs = factor_sharding
            from jax.sharding import PartitionSpec as _PS
            spec_leaves = jax.tree_util.tree_leaves(
                fs_specs, is_leaf=lambda x: isinstance(x, _PS))
            if len(spec_leaves) != len(leaves):
                raise ValueError("factor_sharding specs do not match params")
            for i, (g, f, p, spec) in enumerate(
                    zip(leaves, flags, plans, spec_leaves)):
                if f or shared[i] or p.dq not in kron_p.DIM_SHARDABLE_DQS:
                    continue
                axes = _squeeze_spec(g.shape, spec)
                if any(axes):
                    dim_sharded[i] = axes
        routed = [ls or (ds is not None)
                  for ls, ds in zip(layer_sharded, dim_sharded)]

        # (v, h) pair: lazily drawn + evaluated under the update gate when
        # hvp_fn drives it; explicit (vs, hvs) fit unconditionally
        # static gate (see `always_fit` in kron_whiten): a LITERAL update
        # probability >= 1.0 (or an explicit (vs, hvs) pair, which fits
        # unconditionally by contract) drops the lax.cond around the fit
        always_fit = _static_always(preconditioner_update_probability)
        if hvp_fn is not None:
            if params is None:
                raise ValueError("kron_newton with hvp_fn requires params")

            def draw_vh(_):
                vs_ = rand_like_tree(k_v, params)
                _, hvs_ = hvp_fn(params, vs_)
                return vs_, hvs_

            if always_fit:
                pred = jnp.asarray(True)   # for the sharded paths
                vs, hvs = draw_vh(None)
            else:
                pred = jnp.logical_or(
                    jax.random.uniform(k_gate)
                    < _sched(preconditioner_update_probability, state.count),
                    state.count == 0)
                vs, hvs = _lazy_cond_zeros(pred, draw_vh)
        elif vs is not None and hvs is not None:
            pred = jnp.asarray(True)
            always_fit = True
        else:
            raise ValueError("kron_newton requires hvp_fn or explicit (vs, hvs)")
        v_leaves = jax.tree_util.tree_leaves(vs)
        h_leaves = jax.tree_util.tree_leaves(hvs)

        kron_states = list(state.precond)
        if preconditioner_init_scale is None:
            # count == 0 forces pred True, so (v, h) are real on step 0;
            # gated like the whiten transform so step 1+ skips the sweep
            scale = jax.lax.cond(
                state.count == 0,
                lambda: _newton_scale_from_vh(v_leaves, h_leaves, damping_t),
                lambda: jnp.ones((), jnp.float32))
            kron_states = _rescale_kron_if(state.count == 0, kron_states,
                                           plans, scale)

        def fit_unrouted(states):
            out = []
            for i, (st, plan, f, r, v, h) in enumerate(
                    zip(states, plans, flags, routed, v_leaves, h_leaves)):
                if r:
                    out.append(st)  # handled by a fused sharded path
                    continue
                qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
                out.append(_fit_kron_leaf(
                    st, plan, jax.random.fold_in(k_fit, i), f, "newton",
                    v=v.astype(qdt), h=h.astype(qdt),
                    lr=lr_q, beta_l=beta_l_t, damping=damping_t,
                    norm_k=resolve_norm_k(norm_k, qdt)))
            return tuple(out)

        pcache_t = state.pcache
        if cache_p:
            def fit_and_cache(s):
                ns = fit_unrouted(s)
                # routed leaves refresh inside the sharded path below
                return ns, tuple(
                    pcache_t[i] if routed[i] else _cache_kron_leaf(st, p, f)
                    for i, (st, p, f) in enumerate(zip(ns, plans, flags)))
            if always_fit:
                states_t, pcache_t = fit_and_cache(tuple(kron_states))
            else:
                states_t, pcache_t = jax.lax.cond(
                    pred, fit_and_cache, lambda s: (s, pcache_t),
                    tuple(kron_states))
        elif always_fit:
            states_t = fit_unrouted(tuple(kron_states))
        else:
            states_t = jax.lax.cond(pred, fit_unrouted, lambda s: s,
                                    tuple(kron_states))

        if momentum > 0:
            mu = _ema_update(state.mu, updates, state.count, momentum)
            srcs = jax.tree_util.tree_leaves(mu)
        else:
            mu, srcs = None, leaves

        pre = []
        for i, (st, plan, f, r, src, g) in enumerate(
                zip(states_t, plans, flags, routed, srcs, leaves)):
            if r:
                pre.append(None)  # filled by the sharded pass below
                continue
            qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
            view = src.reshape(((src.shape[0],) if f else ()) + plan.shape)
            if cache_p:
                pg = _apply_kron_leaf_cached(pcache_t[i], plan,
                                             view.astype(qdt), f)
            else:
                pg = _apply_kron_leaf(st, plan, view.astype(qdt), f)
            pre.append(pg.astype(g.dtype).reshape(g.shape))

        if stack_sharding is not None and any(layer_sharded):
            mesh_, axis_ = stack_sharding
            states_t = list(states_t)
            pcache_t = list(pcache_t) if cache_p else pcache_t
            for i, (st, plan, ls, v, h, src, g) in enumerate(
                    zip(states_t, plans, layer_sharded, v_leaves, h_leaves,
                        srcs, leaves)):
                if not ls:
                    continue
                qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
                res = _fit_apply_kron_leaf_layer_sharded(
                    st, plan, jax.random.fold_in(k_fit, i), mesh_, axis_,
                    pred, (v.astype(qdt), h.astype(qdt)), src.astype(qdt),
                    g.dtype, pcache=pcache_t[i] if cache_p else None,
                    always_fit=always_fit,
                    lr=lr_q, beta_l=beta_l_t, damping=damping_t,
                    norm_k=resolve_norm_k(norm_k, qdt))
                if cache_p:
                    st_new, pcache_t[i], pg = res
                else:
                    st_new, pg = res
                states_t[i] = st_new
                pre[i] = pg.reshape(g.shape)
            states_t = tuple(states_t)
            pcache_t = tuple(pcache_t) if cache_p else pcache_t

        if factor_sharding is not None and any(ds is not None
                                               for ds in dim_sharded):
            fs_mesh, _ = factor_sharding
            states_t = list(states_t)
            pcache_t = list(pcache_t) if cache_p else pcache_t
            for i, (st, plan, ds, v, h, src, g) in enumerate(
                    zip(states_t, plans, dim_sharded, v_leaves, h_leaves,
                        srcs, leaves)):
                if ds is None:
                    continue
                qdt = jax.tree_util.tree_leaves(st.q)[0].dtype
                res = _fit_apply_kron_leaf_dim_sharded(
                    st, plan, jax.random.fold_in(k_fit, i), fs_mesh, ds,
                    pred, (v.astype(qdt), h.astype(qdt)), src.astype(qdt),
                    g.dtype, None, mode="newton",
                    pcache=pcache_t[i] if cache_p else None,
                    always_fit=always_fit,
                    lr=lr_q, beta_l=beta_l_t, damping=damping_t,
                    norm_k=resolve_norm_k(norm_k, qdt))
                if cache_p:
                    st_new, pcache_t[i], pg = res
                else:
                    st_new, pg = res
                states_t[i] = st_new
                pre[i] = pg.reshape(g.shape)
            states_t = tuple(states_t)
            pcache_t = tuple(pcache_t) if cache_p else pcache_t

        scale = _global_norm_scale(pre, _sched(grad_clip_max_norm,
                                               state.count))
        pre = [p * scale for p in pre]

        new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                              precond=states_t, pcache=pcache_t)
        return jax.tree_util.tree_unflatten(treedef, pre), new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def kron_newton(learning_rate: float | Callable = 0.01,
                weight_decay: float = 0.0,
                weight_decay_mode: str = "decoupled", **kwargs):
    return _with_weight_decay(scale_by_kron_newton(**kwargs), learning_rate,
                              weight_decay, weight_decay_mode)


# ---------------------------------------------------------------------------
# LRA whitening / Newton (reference classes LRAWhiten/LRANewton,
# psgd.py:1075-1330): all parameters concatenated into one column vector.
# ---------------------------------------------------------------------------


def _ravel(tree):
    import jax.flatten_util
    return jax.flatten_util.ravel_pytree(tree)


def _lra_padded_n(n: int, vector_sharding) -> int:
    """Padded vector length: n rounded up to the sharding axis size."""
    mesh_, ax_ = vector_sharding
    k = int(mesh_.shape[ax_])
    return -(-n // k) * k


def _lra_vector_specs(mesh_, ax_, with_mu):
    """shard_map specs for (LRAState, mu): rows on ``ax_``, scalars
    replicated."""
    from jax.sharding import PartitionSpec as PS
    st = lra_p.LRAState(u=PS(ax_, None), v=PS(ax_, None), d=PS(ax_, None),
                        lu=PS(), lv=PS(), ld=PS())
    return st, (PS(ax_) if with_mu else None)


def scale_by_lra_whiten(
    rank_of_approximation: int = 10,
    preconditioner_init_scale: Optional[float] = None,
    lr_preconditioner: float | Callable = 0.1,
    betaL: float | Callable = 0.9,
    damping: float | Callable = 1e-9,
    momentum: float = 0.0,
    momentum_dtype: Any = None,
    grad_clip_max_amps: Tuple[float | Callable, float | Callable] = (2.0, 10.0),
    preconditioner_update_probability: float | Callable = 1.0,
    update_preconditioner_first: bool = True,
    whiten_grad: bool = True,
    preconditioner_dtype: Any = None,
    vector_sharding: Optional[Tuple[Any, str]] = None,
    seed: int = 0,
) -> optax.GradientTransformation:
    """``vector_sharding=(mesh, axis)`` runs the global LRA preconditioner
    ZeRO-style: U/V/d (and momentum) are row-sharded over ``axis``, the
    concat gradient vector is consumed shard-local, and the whole fit +
    apply runs under shard_map with only r-sized psum/pmax collectives
    (precond/lra.py module docstring).  State memory and update FLOPs scale
    1/k with k devices; the vector is zero-padded to a multiple of k (exact
    no-op rows).  The probe stream is drawn per shard, so trajectories
    differ from the replicated transform by probe realization only."""
    momentum = momentum if 0.0 < momentum < 1.0 else 0.0
    if not whiten_grad and momentum == 0.0:
        raise ValueError("Cannot whiten momentum with momentum == 0")

    def init_fn(params):
        vec, _ = _ravel(params)
        n = vec.size
        dt = preconditioner_dtype if preconditioner_dtype is not None else vec.dtype
        scale0 = 1.0 if preconditioner_init_scale is None else preconditioner_init_scale
        st = lra_p.init_lra(n, rank_of_approximation, jax.random.key(seed + 1),
                            scale0, dt)
        n_state = n
        if vector_sharding is not None:
            n_state = _lra_padded_n(n, vector_sharding)
            st = lra_p.pad_lra_state(st, n_state - n)
        mu = (jnp.zeros((n_state,), momentum_dtype or vec.dtype)
              if momentum > 0 else None)
        return PSGDState(count=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(seed),
                         mu=mu, precond=st)

    def update_fn(updates, state, params=None):
        del params
        g_vec, unravel = _ravel(updates)
        st = state.precond
        qdt = st.d.dtype

        key, k_gate, k_fit = jax.random.split(state.key, 3)
        do_update = (jax.random.uniform(k_gate)
                     < _sched(preconditioner_update_probability, state.count))
        always_fit = _static_always(preconditioner_update_probability)
        lr_q = _sched(lr_preconditioner, state.count)
        beta_l_t = _sched(betaL, state.count)
        damping_t = _sched(damping, state.count)
        amps = tuple(_sched(a, state.count) for a in grad_clip_max_amps)

        if vector_sharding is not None:
            pre, st, mu = _lra_whiten_sharded(
                g_vec, st, state.mu, state.count, k_fit, do_update,
                lr_q, beta_l_t, damping_t, amps,
                vector_sharding, momentum, whiten_grad,
                preconditioner_init_scale, update_preconditioner_first,
                always_fit)
            new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                                  precond=st)
            return unravel(pre[:g_vec.size]), new_state

        if preconditioner_init_scale is None:
            scale = (jnp.mean(g_vec.astype(jnp.float32) ** 4)
                     + damping_t ** 4) ** (-1 / 8)
            mult = jnp.where(state.count == 0, scale, 1.0).astype(qdt)
            st = st._replace(d=st.d * mult)

        if momentum > 0:
            mu = _ema_update(state.mu, g_vec, state.count, momentum)
        else:
            mu = None

        fit_src = (g_vec if whiten_grad else mu).astype(qdt)

        def fit(s):
            return lra_p.update_lra_whiten(
                s, fit_src, k_fit, lr=lr_q, beta_l=beta_l_t,
                damping=damping_t)

        def apply(s):
            src = (mu if momentum > 0 else g_vec).astype(qdt)
            pg = lra_p.precond_grad(s, src).astype(g_vec.dtype)
            return _amp_clip(pg, *amps)

        if update_preconditioner_first:
            st = _gated_fit(always_fit, do_update, fit, st)
            pre = apply(st)
        else:
            pre = apply(st)
            st = _gated_fit(always_fit, do_update, fit, st)

        new_state = PSGDState(count=state.count + 1, key=key, mu=mu, precond=st)
        return unravel(pre), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _lra_whiten_sharded(g_vec, st, mu0, count, k_fit, do_update, lr_q,
                        beta_l_t, damping_t, amps, vector_sharding, momentum,
                        whiten_grad, init_scale, update_first,
                        always_fit=False):
    """One sharded LRA-whiten step: pad the gradient vector, shard rows over
    the mesh axis, and run init-scale + EMA + fit + apply entirely inside
    shard_map (all cross-shard traffic is r-sized — precond/lra.py)."""
    from jax.sharding import PartitionSpec as PS
    from ..utils.compat import shard_map

    mesh_, ax_ = vector_sharding
    n_true = g_vec.size
    n_pad = _lra_padded_n(n_true, vector_sharding)
    g_p = jnp.pad(g_vec, (0, n_pad - n_true))
    st_specs, mu_spec = _lra_vector_specs(mesh_, ax_, momentum > 0)
    scalars = [jnp.asarray(x) for x in
               (count, do_update, lr_q, beta_l_t, damping_t, *amps)]

    def local(g_loc, s, mu, k_fit, count, gate, lr_q, beta_l_t, damping_t,
              amp_avg, amp_el):
        qdt = s.d.dtype
        n_loc = g_loc.shape[0]
        rows = jax.lax.axis_index(ax_) * n_loc + jnp.arange(n_loc)
        mask = (rows < n_true)[:, None]

        if init_scale is None:
            g4 = jax.lax.psum(
                jnp.sum(jnp.abs(g_loc.astype(jnp.float32)) ** 4), ax_)
            scale = (g4 / n_true + damping_t ** 4) ** (-1 / 8)
            mult = jnp.where(count == 0, scale, 1.0).astype(qdt)
            s = s._replace(d=jnp.where(mask, s.d * mult, s.d))

        if momentum > 0:
            mu = _ema_update(mu, g_loc, count, momentum)
        else:
            mu = None

        fit_src = (g_loc if whiten_grad else mu).astype(qdt)

        def fit(x):
            return lra_p.update_lra_whiten(
                x, fit_src, k_fit, lr=lr_q, beta_l=beta_l_t,
                damping=damping_t, axis_name=ax_, pad_mask=mask)

        def apply(x):
            src = (mu if momentum > 0 else g_loc).astype(qdt)
            pg = lra_p.precond_grad(x, src, axis_name=ax_).astype(g_loc.dtype)
            return _sharded_amp_clip(pg, (amp_avg, amp_el), ax_, n_true)

        if update_first:
            s = _gated_fit(always_fit, gate, fit, s)
            pre = apply(s)
        else:
            pre = apply(s)
            s = _gated_fit(always_fit, gate, fit, s)
        return pre, s, mu

    fn = shard_map(local, mesh=mesh_,
                   in_specs=(PS(ax_), st_specs, mu_spec, PS(),
                             *([PS()] * len(scalars))),
                   out_specs=(PS(ax_), st_specs, mu_spec))
    return fn(g_p, st, mu0, k_fit, *scalars)


def lra_whiten(learning_rate: float | Callable = 1e-3,
               weight_decay: float = 0.0,
               weight_decay_mode: str = "decoupled", **kwargs):
    return _with_weight_decay(scale_by_lra_whiten(**kwargs), learning_rate,
                              weight_decay, weight_decay_mode)


def scale_by_lra_newton(
    rank_of_approximation: int = 10,
    preconditioner_init_scale: Optional[float] = None,
    lr_preconditioner: float | Callable = 0.1,
    betaL: float | Callable = 0.9,
    damping: float | Callable = 1e-9,
    momentum: float = 0.0,
    momentum_dtype: Any = None,
    grad_clip_max_norm: float | Callable = float("inf"),
    preconditioner_update_probability: float | Callable = 1.0,
    preconditioner_dtype: Any = None,
    vector_sharding: Optional[Tuple[Any, str]] = None,
    seed: int = 0,
) -> optax.GradientTransformationExtraArgs:
    """``vector_sharding=(mesh, axis)``: ZeRO-style row sharding of the
    global LRA state and update, as in :func:`scale_by_lra_whiten`.  The
    Hessian-vector product itself is tree-level (the model's own sharding
    applies); only the raveled (v, h) vectors enter the shard_map."""
    momentum = momentum if 0.0 < momentum < 1.0 else 0.0

    def init_fn(params):
        vec, _ = _ravel(params)
        n_state = vec.size
        dt = preconditioner_dtype if preconditioner_dtype is not None else vec.dtype
        scale0 = 1.0 if preconditioner_init_scale is None else preconditioner_init_scale
        st = lra_p.init_lra(vec.size, rank_of_approximation,
                            jax.random.key(seed + 1), scale0, dt)
        if vector_sharding is not None:
            n_state = _lra_padded_n(vec.size, vector_sharding)
            st = lra_p.pad_lra_state(st, n_state - vec.size)
        mu = (jnp.zeros((n_state,), momentum_dtype or vec.dtype)
              if momentum > 0 else None)
        return PSGDState(count=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(seed),
                         mu=mu, precond=st)

    def update_fn(updates, state, params=None, *, hvp_fn=None, vs=None,
                  hvs=None, **extra):
        del extra
        g_vec, unravel = _ravel(updates)
        st = state.precond
        qdt = st.d.dtype

        key, k_gate, k_v, k_fit = jax.random.split(state.key, 4)
        lr_q = _sched(lr_preconditioner, state.count)
        beta_l_t = _sched(betaL, state.count)
        damping_t = _sched(damping, state.count)
        max_norm = _sched(grad_clip_max_norm, state.count)

        always_fit = _static_always(preconditioner_update_probability)
        if vector_sharding is not None:
            pred = (jnp.asarray(True) if always_fit else jnp.logical_or(
                jax.random.uniform(k_gate)
                < _sched(preconditioner_update_probability, state.count),
                state.count == 0))
            if hvp_fn is not None:
                if params is None:
                    raise ValueError("lra_newton with hvp_fn requires params")

                # Hvp stays lazy: the cond is at tree level, outside the
                # shard_map; the skip branch only writes zeros.
                def mk_vh(_):
                    vs_ = rand_like_tree(k_v, params)
                    _, hvs_ = hvp_fn(params, vs_)
                    return _ravel(vs_)[0], _ravel(hvs_)[0]

                v_vec, h_vec = (mk_vh(None) if always_fit
                                else _lazy_cond_zeros(pred, mk_vh))
            elif vs is not None and hvs is not None:
                pred, always_fit = jnp.asarray(True), True
                v_vec, h_vec = _ravel(vs)[0], _ravel(hvs)[0]
            else:
                raise ValueError(
                    "lra_newton requires hvp_fn or explicit (vs, hvs)")
            pre, st, mu = _lra_newton_sharded(
                g_vec, v_vec, h_vec, st, state.mu, state.count, k_fit, pred,
                lr_q, beta_l_t, damping_t, max_norm, vector_sharding,
                momentum, preconditioner_init_scale, always_fit)
            new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                                  precond=st)
            return unravel(pre[:g_vec.size]), new_state

        def fit(s, v_vec, h_vec):
            if preconditioner_init_scale is None:
                scale = (jnp.mean(v_vec.astype(jnp.float32) ** 2) ** 0.25 *
                         (jnp.mean(h_vec.astype(jnp.float32) ** 4)
                          + damping_t ** 4) ** (-1 / 8))
                mult = jnp.where(state.count == 0, scale, 1.0).astype(qdt)
                s = s._replace(d=s.d * mult)
            return lra_p.update_lra_newton(
                s, v_vec.astype(qdt), h_vec.astype(qdt), k_fit,
                lr=lr_q, beta_l=beta_l_t, damping=damping_t)

        if hvp_fn is not None:
            if params is None:
                raise ValueError("lra_newton with hvp_fn requires params")

            def fit_branch(s):
                vs_ = rand_like_tree(k_v, params)
                _, hvs_ = hvp_fn(params, vs_)
                return fit(s, _ravel(vs_)[0], _ravel(hvs_)[0])

            if always_fit:
                st = fit_branch(st)
            else:
                pred = jnp.logical_or(
                    jax.random.uniform(k_gate)
                    < _sched(preconditioner_update_probability, state.count),
                    state.count == 0)
                st = jax.lax.cond(pred, fit_branch, lambda s: s, st)
        elif vs is not None and hvs is not None:
            st = fit(st, _ravel(vs)[0], _ravel(hvs)[0])
        else:
            raise ValueError("lra_newton requires hvp_fn or explicit (vs, hvs)")

        if momentum > 0:
            mu = _ema_update(state.mu, g_vec, state.count, momentum)
            src = mu
        else:
            mu, src = None, g_vec

        pre = lra_p.precond_grad(st, src.astype(qdt)).astype(g_vec.dtype)
        pre = pre * _global_norm_scale(pre, max_norm)
        new_state = PSGDState(count=state.count + 1, key=key, mu=mu, precond=st)
        return unravel(pre), new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def _lra_newton_sharded(g_vec, v_vec, h_vec, st, mu0, count, k_fit, pred,
                        lr_q, beta_l_t, damping_t, max_norm, vector_sharding,
                        momentum, init_scale, always_fit=False):
    """One sharded LRA-Newton step (see _lra_whiten_sharded)."""
    from jax.sharding import PartitionSpec as PS
    from ..utils.compat import shard_map

    mesh_, ax_ = vector_sharding
    n_true = g_vec.size
    n_pad = _lra_padded_n(n_true, vector_sharding)
    pad = (0, n_pad - n_true)
    g_p, v_p, h_p = (jnp.pad(x, pad) for x in (g_vec, v_vec, h_vec))
    st_specs, mu_spec = _lra_vector_specs(mesh_, ax_, momentum > 0)
    inf_norm = isinstance(max_norm, (int, float)) and math.isinf(max_norm)
    scalars = [jnp.asarray(x) for x in
               (count, pred, lr_q, beta_l_t, damping_t)
               + (() if inf_norm else (max_norm,))]

    def local(g_loc, v_loc, h_loc, s, mu, k_fit, count, pred, lr_q,
              beta_l_t, damping_t, *rest):
        qdt = s.d.dtype
        n_loc = g_loc.shape[0]
        rows = jax.lax.axis_index(ax_) * n_loc + jnp.arange(n_loc)
        mask = (rows < n_true)[:, None]

        def fit(x):
            if init_scale is None:
                v2 = jax.lax.psum(
                    jnp.sum(jnp.abs(v_loc.astype(jnp.float32)) ** 2), ax_)
                h4 = jax.lax.psum(
                    jnp.sum(jnp.abs(h_loc.astype(jnp.float32)) ** 4), ax_)
                scale = ((v2 / n_true) ** 0.25 *
                         (h4 / n_true + damping_t ** 4) ** (-1 / 8))
                mult = jnp.where(count == 0, scale, 1.0).astype(qdt)
                x = x._replace(d=jnp.where(mask, x.d * mult, x.d))
            return lra_p.update_lra_newton(
                x, v_loc.astype(qdt), h_loc.astype(qdt), k_fit,
                lr=lr_q, beta_l=beta_l_t, damping=damping_t,
                axis_name=ax_, pad_mask=mask)

        s = _gated_fit(always_fit, pred, fit, s)

        if momentum > 0:
            mu = _ema_update(mu, g_loc, count, momentum)
            src = mu
        else:
            mu, src = None, g_loc

        pre = lra_p.precond_grad(s, src.astype(qdt),
                                 axis_name=ax_).astype(g_loc.dtype)
        if not inf_norm:
            # accumulate the trust-region norm in f32 (bf16 would
            # over/underflow over millions of squares, like _amp_clip)
            sq = jax.lax.psum(
                jnp.sum(jnp.real(pre * jnp.conj(pre)).astype(jnp.float32)),
                ax_)
            pre = pre * jnp.minimum(
                1.0, rest[0] / jnp.maximum(jnp.sqrt(sq), 1e-38)).astype(
                    real_dtype_of(pre.dtype))
        return pre, s, mu

    fn = shard_map(local, mesh=mesh_,
                   in_specs=(PS(ax_), PS(ax_), PS(ax_), st_specs, mu_spec,
                             PS(), *([PS()] * len(scalars))),
                   out_specs=(PS(ax_), st_specs, mu_spec))
    return fn(g_p, v_p, h_p, st, mu0, k_fit, *scalars)


def lra_newton(learning_rate: float | Callable = 0.01,
               weight_decay: float = 0.0,
               weight_decay_mode: str = "decoupled", **kwargs):
    return _with_weight_decay(scale_by_lra_newton(**kwargs), learning_rate,
                              weight_decay, weight_decay_mode)


# ---------------------------------------------------------------------------
# Dense Newton (reference class DenseNewton, psgd.py:1427-1563)
# ---------------------------------------------------------------------------


def scale_by_dense_newton(
    preconditioner_init_scale: Optional[float] = None,
    lr_preconditioner: float | Callable = 0.1,
    betaL: float | Callable = 0.9,
    damping: float | Callable = 1e-9,
    momentum: float = 0.0,
    momentum_dtype: Any = None,
    grad_clip_max_norm: float | Callable = float("inf"),
    preconditioner_update_probability: float | Callable = 1.0,
    dq: str = "Q0.5EQ1.5",
    preconditioner_dtype: Any = None,
    norm_k: Optional[int] = None,
    vector_sharding: Optional[Tuple[Any, str]] = None,
    seed: int = 0,
) -> optax.GradientTransformationExtraArgs:
    """``vector_sharding=(mesh, axis)``: ZeRO-style row sharding of the
    full (n, n) dense Q over ``axis`` — state memory and fit/apply FLOPs
    scale 1/k with k devices, with only (n,)-sized psums as collectives
    (precond/dense.py row-sharded section).  Requires ``dq="QEQ"``, the
    geometry whose dense update is transpose-free; the concat vector is
    zero-padded to a multiple of k (exact no-op rows)."""
    dq = kron_p.canonical_dq(dq)
    momentum = momentum if 0.0 < momentum < 1.0 else 0.0
    if vector_sharding is not None and dq != kron_p.DQ_QEQ:
        raise ValueError(
            "dense_newton vector_sharding supports dq='QEQ' only (the "
            "transpose-free dense geometry); got dq=%r" % dq)
    _advisories(preconditioner_init_scale, True, 0.0, dq,
                preconditioner_dtype)

    def init_fn(params):
        vec, _ = _ravel(params)
        dt = preconditioner_dtype if preconditioner_dtype is not None else vec.dtype
        scale0 = 1.0 if preconditioner_init_scale is None else preconditioner_init_scale
        n_state = vec.size
        if vector_sharding is not None:
            n_state = _lra_padded_n(vec.size, vector_sharding)
        st = dense_p.init_dense(n_state, scale0, dq, dt)
        mu = (jnp.zeros((n_state,), momentum_dtype or vec.dtype)
              if momentum > 0 else None)
        return PSGDState(count=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(seed),
                         mu=mu, precond=st)

    def update_fn(updates, state, params=None, *, hvp_fn=None, vs=None,
                  hvs=None, **extra):
        del extra
        g_vec, unravel = _ravel(updates)
        st = state.precond
        qdt = st.q.dtype

        key, k_gate, k_v, k_fit = jax.random.split(state.key, 4)

        def fit(s, v_vec, h_vec):
            if preconditioner_init_scale is None:
                scale = (jnp.mean(v_vec.astype(jnp.float32) ** 2) ** 0.25 *
                         (jnp.mean(h_vec.astype(jnp.float32) ** 4) + damping ** 4) ** (-1 / 8))
                if dq in kron_p._FIT_P:
                    scale = scale * scale
                mult = jnp.where(state.count == 0, scale, 1.0).astype(real_dtype_of(qdt))
                s = s._replace(q=s.q * mult)
            return dense_p.update_dense(
                s, v_vec.astype(qdt), h_vec.astype(qdt), k_fit, dq,
                lr=_sched(lr_preconditioner, state.count),
                beta_l=_sched(betaL, state.count),
                damping=_sched(damping, state.count),
                norm_k=resolve_norm_k(norm_k, qdt))

        always_fit = _static_always(preconditioner_update_probability)
        if vector_sharding is not None:
            if hvp_fn is not None:
                if params is None:
                    raise ValueError("dense_newton with hvp_fn requires params")
                pred = (jnp.asarray(True) if always_fit else jnp.logical_or(
                    jax.random.uniform(k_gate)
                    < _sched(preconditioner_update_probability, state.count),
                    state.count == 0))

                def mk_vh(_):
                    vs_ = rand_like_tree(k_v, params)
                    _, hvs_ = hvp_fn(params, vs_)
                    return _ravel(vs_)[0], _ravel(hvs_)[0]

                v_vec, h_vec = (mk_vh(None) if always_fit
                                else _lazy_cond_zeros(pred, mk_vh))
            elif vs is not None and hvs is not None:
                pred, always_fit = jnp.asarray(True), True
                v_vec, h_vec = _ravel(vs)[0], _ravel(hvs)[0]
            else:
                raise ValueError(
                    "dense_newton requires hvp_fn or explicit (vs, hvs)")
            pre, st, mu = _dense_qeq_sharded(
                g_vec, v_vec, h_vec, st, state.mu, state.count, k_fit, pred,
                _sched(lr_preconditioner, state.count),
                _sched(betaL, state.count), _sched(damping, state.count),
                _sched(grad_clip_max_norm, state.count), vector_sharding,
                momentum, preconditioner_init_scale, always_fit)
            new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                                  precond=st)
            return unravel(pre[:g_vec.size]), new_state

        if hvp_fn is not None:
            if params is None:
                raise ValueError("dense_newton with hvp_fn requires params")

            def fit_branch(s):
                vs_ = rand_like_tree(k_v, params)
                _, hvs_ = hvp_fn(params, vs_)
                return fit(s, _ravel(vs_)[0], _ravel(hvs_)[0])

            if always_fit:
                st = fit_branch(st)
            else:
                pred = jnp.logical_or(
                    jax.random.uniform(k_gate)
                    < _sched(preconditioner_update_probability, state.count),
                    state.count == 0)
                st = jax.lax.cond(pred, fit_branch, lambda s: s, st)
        elif vs is not None and hvs is not None:
            st = fit(st, _ravel(vs)[0], _ravel(hvs)[0])
        else:
            raise ValueError("dense_newton requires hvp_fn or explicit (vs, hvs)")

        if momentum > 0:
            mu = _ema_update(state.mu, g_vec, state.count, momentum)
            src = mu
        else:
            mu, src = None, g_vec

        pre = dense_p.precond_grad(st, src.astype(qdt), dq).astype(g_vec.dtype)
        pre = pre * _global_norm_scale(
            pre, _sched(grad_clip_max_norm, state.count))
        new_state = PSGDState(count=state.count + 1, key=key, mu=mu, precond=st)
        return unravel(pre), new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def _dense_qeq_sharded(g_vec, v_vec, h_vec, st, mu0, count, k_fit, pred,
                       lr_q, beta_l_t, damping_t, max_norm, vector_sharding,
                       momentum, init_scale, always_fit=False):
    """One row-sharded dense-QEQ Newton step: pad the concat vectors, keep
    them (and momentum) replicated — they are O(n) — and run the gated fit
    + apply under shard_map with Q's rows sharded (precond/dense.py
    row-sharded section; all collectives are (n,)-sized psums)."""
    from jax.sharding import PartitionSpec as PS
    from ..utils.compat import shard_map

    mesh_, ax_ = vector_sharding
    n_true = g_vec.size
    n_pad = st.q.shape[0]
    qdt = st.q.dtype
    rdt = real_dtype_of(qdt)
    pad = (0, n_pad - n_true)
    g_p = jnp.pad(g_vec, pad)
    v_p = jnp.pad(v_vec, pad).astype(qdt)
    h_p = jnp.pad(h_vec, pad).astype(qdt)

    if init_scale is None:
        # same (v, h) statistics as the unsharded on-the-fly init
        # (psgd.py:1523-1527; QEQ is not a fit-P geometry, no squaring)
        scale = (jnp.mean(v_vec.astype(jnp.float32) ** 2) ** 0.25 *
                 (jnp.mean(h_vec.astype(jnp.float32) ** 4)
                  + damping_t ** 4) ** (-1 / 8))
        mult = jnp.where(count == 0, scale, 1.0).astype(rdt)
    else:
        mult = jnp.ones((), rdt)

    if momentum > 0:
        mu = _ema_update(mu0, g_p, count, momentum)
        src = mu
    else:
        mu, src = None, g_p

    def local(q_loc, lips, v, h, src, k_fit, pred, lr_q, beta_l_t,
              damping_t, mult):
        n_loc = q_loc.shape[0]
        rows = jax.lax.axis_index(ax_) * n_loc + jnp.arange(n_loc)
        rmask = (rows < n_true)[:, None]
        # on-the-fly init scale: true rows only (padded rows stay e_i)
        q_loc = jnp.where(rmask, q_loc * mult, q_loc)

        def fit(args):
            ql, lp = args
            return dense_p.update_dense_qeq_row_sharded(
                ql, lp, v, h, k_fit, ax_, n_true, lr=lr_q,
                beta_l=beta_l_t, damping=damping_t)

        q_loc, lips = _gated_fit(always_fit, pred, fit, (q_loc, lips))
        pg = dense_p.precond_grad_qeq_row_sharded(
            q_loc, src.astype(q_loc.dtype), ax_)
        return q_loc, lips, pg

    scalars = [jnp.asarray(x) for x in
               (pred, lr_q, beta_l_t, damping_t, mult)]
    fn = shard_map(local, mesh=mesh_,
                   in_specs=(PS(ax_, None), PS(), PS(), PS(), PS(), PS(),
                             *([PS()] * len(scalars))),
                   out_specs=(PS(ax_, None), PS(), PS()))
    q_loc, lips, pg = fn(st.q, st.lips, v_p, h_p, src, k_fit, *scalars)
    st = dense_p.DenseState(q=q_loc, lips=lips)
    pre = pg.astype(g_vec.dtype)
    pre = pre * _global_norm_scale(pre, max_norm)
    return pre, st, mu


def dense_newton(learning_rate: float | Callable = 0.01,
                 weight_decay: float = 0.0,
                 weight_decay_mode: str = "decoupled", **kwargs):
    return _with_weight_decay(scale_by_dense_newton(**kwargs), learning_rate,
                              weight_decay, weight_decay_mode)
