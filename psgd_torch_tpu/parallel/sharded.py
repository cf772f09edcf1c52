"""Per-shard Kron preconditioning: the DTensor/FSDP2 wrapper equivalent.

The reference's DTensor wrapper preconditions **each local shard of a
parameter independently** ("not optimal but acceptable",
/root/reference/wrapped_as_torch_optimizer_for_dtensor.py:9, :123-125): a
(4096, 8192) weight sharded 8 ways gets eight independent (512, 8192)-shaped
Kron preconditioners, with zero communication in the optimizer.

This module is the JAX/TPU re-design: one ``shard_map`` over the mesh runs
the update and apply on every device's local shard view.  State factors are
stored with one leading shard axis per *sharded tensor dim* — a Q factor for
a dim sharded k ways (possibly over several mesh axes) lives in a
(k, m, m) array sharded PS(axes, None, None), so each device owns exactly
its own (m, m) factor.  Consistency across *replicated* mesh axes comes from
identical PRNG keys (same fold_in on every replica), which replaces the
reference's RNG-broadcast machinery (dtensor:89-103).

Feature parity with the reference wrappers
(wrapped_as_torch_optimizer_for_ddp.py:25-62, ..._for_dtensor.py:104-184):
momentum EMA in the preconditioner dtype with bias-corrected warmup,
``whiten_grad`` choice (fit on grad vs momentum), biased/unbiased update
ordering, schedules for lr_preconditioner / update probability, decoupled or
classic weight decay (via the ``per_shard_kron_whiten`` optimizer wrapper),
``preconditioner_dtype`` (bf16 default in the reference), per-tensor amp
clipping, on-the-fly init scale (one ``pmean`` per leaf — the only
collective, and only on step 0), plus a **Newton-type variant** the
reference wrapper lacks.

Communication cost of the optimizer itself: zero collectives after step 0
(like the reference wrapper); gradients arrive already correctly sharded
from the backward pass.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as PS

from ..utils.compat import shard_map
from ..ops.linalg import resolve_norm_k
from ..precond import kron as kron_p
from ..optim.hvp import rand_like_tree
from ..optim.transforms import (
    PSGDState,
    _amp_clip,
    _ema_update,
    _global_norm_scale,
    _lazy_cond_zeros,
    _sched,
    _squeezed_shape,
    _with_weight_decay,
)


def _spec_axes(spec: PS, ndim: int) -> Tuple[Tuple[str, ...], ...]:
    """Per-dim tuple of mesh axes (multi-axis dims supported: an entry like
    ("dp", "fsdp") shards that dim over both axes, dp-major)."""
    entries = tuple(spec) + (None,) * (ndim - len(tuple(spec)))
    out = []
    for e in entries:
        if e is None:
            out.append(())
        elif isinstance(e, (tuple, list)):
            out.append(tuple(str(a) for a in e))
        else:
            out.append((str(e),))
    return tuple(out)


def _dim_shards(axes: Tuple[str, ...], mesh: Mesh) -> int:
    k = 1
    for ax in axes:
        k *= mesh.shape[ax]
    return k


def _local_shape(shape, axes, mesh: Mesh) -> Tuple[int, ...]:
    out = []
    for s, ax in zip(shape, axes):
        k = _dim_shards(ax, mesh)
        if s % k:
            raise ValueError(f"dim {s} not divisible by its {k}-way sharding")
        out.append(s // k)
    return tuple(out)


def _linear_index(axes: Tuple[str, ...]) -> jax.Array:
    """Linearized shard position of this device along a multi-axis dim
    (major-to-minor = the PartitionSpec order)."""
    idx = jnp.zeros((), jnp.int32)
    for ax in axes:
        idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return idx


class ShardedKronLeaf(NamedTuple):
    """Kron state for one sharded leaf: every factor carries one leading
    shard axis per sharded tensor dim."""
    q: Tuple[jax.Array, ...]
    lips: Tuple[jax.Array, ...]


class _LeafMeta(NamedTuple):
    axes: Tuple[Tuple[str, ...], ...]   # per-dim mesh axes
    lshape: Tuple[int, ...]             # device-local leaf shape
    shard_dims: Tuple[int, ...]         # dims with nonempty axes
    plan: Any                           # KronPlan of the squeezed local shape


def _per_shard_core(
    mesh: Mesh,
    param_specs: Any,
    mode: str,  # "whiten" | "newton"
    preconditioner_max_size: float,
    preconditioner_max_skew: float,
    preconditioner_init_scale: Optional[float],
    lr_preconditioner: float | Callable,
    betaL: float | Callable,
    damping: float | Callable,
    momentum: float,
    grad_clip_max_amps: Tuple[float | Callable, float | Callable],
    grad_clip_max_norm: float | Callable,
    preconditioner_update_probability: float | Callable,
    update_preconditioner_first: bool,
    whiten_grad: bool,
    dq: str,
    preconditioner_dtype: Any,
    momentum_dtype: Any,
    norm_k: Optional[int],
    seed: int,
    share_fit_apply: bool = False,
    cache_p: bool = False,
):
    dq = kron_p.canonical_dq(dq)
    momentum = momentum if 0.0 < momentum < 1.0 else 0.0
    if mode == "whiten" and not whiten_grad and momentum == 0.0:
        raise ValueError("Cannot whiten momentum with momentum == 0")
    if cache_p and dq in kron_p._FIT_P:
        raise ValueError(
            "cache_p is a no-op for the fit-P geometries (QUAD4P/PRO4P): "
            "their apply is already a single factor pass — drop cache_p")
    if share_fit_apply:
        # same preconditions as scale_by_kron_whiten(share_fit_apply=True)
        if mode != "whiten":
            raise ValueError("share_fit_apply applies to whitening only "
                             "(the Newton fit source is a (v, h) pair)")
        if update_preconditioner_first:
            raise ValueError(
                "share_fit_apply requires update_preconditioner_first=False: "
                "the shared product is computed with the pre-update Q")
        if momentum > 0 and whiten_grad:
            raise ValueError(
                "share_fit_apply requires the fit and apply sources to "
                "coincide: use whiten_grad=False (momentum whitening) or "
                "momentum=0")
        if dq == kron_p.DQ_EQ:
            raise ValueError("share_fit_apply is unsupported for dq='EQ'")

    def _qdtype(leaf):
        return (preconditioner_dtype if preconditioner_dtype is not None
                else leaf.dtype)

    def leaf_meta(leaf, spec) -> _LeafMeta:
        axes = _spec_axes(spec, leaf.ndim)
        lshape = _local_shape(leaf.shape, axes, mesh)
        shard_dims = tuple(d for d, ax in enumerate(axes) if ax)
        plan = kron_p.make_kron_plan(_squeezed_shape(lshape),
                                     preconditioner_max_size,
                                     preconditioner_max_skew, dq)
        return _LeafMeta(axes, lshape, shard_dims, plan)

    def _all_metas(leaves):
        specs = jax.tree_util.tree_leaves(
            param_specs, is_leaf=lambda x: isinstance(x, PS))
        if len(specs) != len(leaves):
            raise ValueError("param_specs does not match the param tree")
        return [leaf_meta(l, s) for l, s in zip(leaves, specs)]

    def _state_specs(meta: _LeafMeta, st: ShardedKronLeaf) -> ShardedKronLeaf:
        lead = tuple(meta.axes[d] for d in meta.shard_dims)
        n_lead = len(lead)
        return ShardedKronLeaf(
            q=tuple(PS(*(lead + (None,) * (f.ndim - n_lead))) for f in st.q),
            lips=tuple(PS(*lead) for _ in st.lips))

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        metas = _all_metas(leaves)
        states = []
        for leaf, meta in zip(leaves, metas):
            scale0 = (1.0 if preconditioner_init_scale is None
                      else preconditioner_init_scale)
            st = kron_p.init_kron_from_plan(meta.plan, scale0, _qdtype(leaf))
            lead = tuple(_dim_shards(meta.axes[d], mesh)
                         for d in meta.shard_dims)

            def stack(x):
                return jnp.tile(x[(None,) * len(lead)],
                                lead + (1,) * x.ndim)

            sharded = ShardedKronLeaf(q=tuple(stack(f) for f in st.q),
                                      lips=tuple(stack(l) for l in st.lips))
            specs = _state_specs(meta, sharded)
            sharded = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(
                    x, jax.sharding.NamedSharding(mesh, s)), sharded, specs)
            states.append(sharded)
        pcache0 = None
        if cache_p:
            pcache0 = []
            for leaf, meta, sh in zip(leaves, metas, states):
                p0 = kron_p.compute_p_factors(
                    kron_p.init_kron_from_plan(meta.plan, (
                        1.0 if preconditioner_init_scale is None
                        else preconditioner_init_scale), _qdtype(leaf)),
                    meta.plan)
                n_lead = len(meta.shard_dims)
                lead = tuple(_dim_shards(meta.axes[d], mesh)
                             for d in meta.shard_dims)
                pc = tuple(jnp.tile(x[(None,) * n_lead],
                                    lead + (1,) * x.ndim) for x in p0)
                pc_specs = tuple(
                    PS(*(tuple(meta.axes[d] for d in meta.shard_dims)
                         + (None,) * (x.ndim - n_lead))) for x in pc)
                pcache0.append(tuple(
                    jax.device_put(x, jax.sharding.NamedSharding(mesh, s))
                    for x, s in zip(pc, pc_specs)))
            pcache0 = tuple(pcache0)
        mu = (jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, momentum_dtype or _qdtype(x)),
            params) if momentum > 0 else None)
        return PSGDState(count=jnp.zeros((), jnp.int32),
                         key=jax.random.PRNGKey(seed), mu=mu,
                         precond=tuple(states), pcache=pcache0)

    def update_fn(updates, state, params=None, *, hvp_fn=None, vs=None,
                  hvs=None, **extra):
        del extra
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        metas = _all_metas(leaves)

        if momentum > 0:
            mu = _ema_update(state.mu, updates, state.count, momentum)
            mu_leaves = jax.tree_util.tree_leaves(mu)
        else:
            mu, mu_leaves = None, leaves

        key, k_gate, k_v, k_fit = jax.random.split(state.key, 4)
        do_update = jnp.logical_or(
            jax.random.uniform(k_gate)
            < _sched(preconditioner_update_probability, state.count),
            # step-0 update is mandatory when the init scale is on the fly
            jnp.logical_and(state.count == 0,
                            preconditioner_init_scale is None))
        lr_q = _sched(lr_preconditioner, state.count)
        beta_l_t = _sched(betaL, state.count)
        damping_t = _sched(damping, state.count)
        clip_amps_t = tuple(_sched(a, state.count)
                            for a in grad_clip_max_amps)

        # Newton mode: draw sharded probes and evaluate the Hvp globally
        # (the model forward needs the whole parameter tree); the per-shard
        # fit then consumes the local shard views of (v, h).  Evaluated
        # lazily under the update-probability gate — an Hvp costs ~2x a
        # gradient and the production recipe anneals the probability to
        # ~0.01, so off-steps must not pay it (matches scale_by_kron_newton).
        if mode == "newton":
            if hvp_fn is not None:
                if params is None:
                    raise ValueError("per-shard newton with hvp_fn needs params")

                def draw_vh(_):
                    vs_ = rand_like_tree(k_v, params)
                    _, hvs_ = hvp_fn(params, vs_)
                    return vs_, hvs_

                vs, hvs = _lazy_cond_zeros(do_update, draw_vh)
            elif vs is None or hvs is None:
                raise ValueError(
                    "per-shard newton requires hvp_fn or explicit (vs, hvs)")
            v_leaves = jax.tree_util.tree_leaves(vs)
            h_leaves = jax.tree_util.tree_leaves(hvs)
        else:
            v_leaves = h_leaves = [None] * len(leaves)

        new_states, new_pcache, outs = [], [], []
        for i, (g, meta, st) in enumerate(zip(leaves, metas, state.precond)):
            lead_axes = tuple(meta.axes[d] for d in meta.shard_dims)
            n_lead = len(lead_axes)
            leaf_spec = PS(*(ax if ax else None for ax in meta.axes))
            state_specs = _state_specs(meta, st)
            k_leaf = jax.random.fold_in(k_fit, i)
            plan = meta.plan
            qdt = _qdtype(g)
            all_axes = tuple(ax for dim_axes in lead_axes for ax in dim_axes)

            fit_src = (g if (mode == "newton" or whiten_grad)
                       else mu_leaves[i])
            apply_src = mu_leaves[i] if momentum > 0 else g
            v_leaf = v_leaves[i]
            h_leaf = h_leaves[i]
            pc_leaf = state.pcache[i] if cache_p else None
            pc_specs = (tuple(
                PS(*(lead_axes + (None,) * (x.ndim - n_lead)))
                for x in pc_leaf) if cache_p else None)

            def local_update(g_loc, fit_loc, apply_loc, st_loc, do_update,
                             count, v_loc=None, h_loc=None, pc_loc=None,
                             meta=meta, plan=plan, k_leaf=k_leaf, qdt=qdt,
                             lead_axes=lead_axes, n_lead=n_lead,
                             all_axes=all_axes):
                # this device's factor + a key folded with its shard position
                # (replicated axes share keys -> replicated state stays
                # bitwise identical with zero communication)
                kk = k_leaf
                for dim_axes in lead_axes:
                    kk = jax.random.fold_in(kk, _linear_index(dim_axes))
                inner = kron_p.KronState(
                    q=tuple(f[(0,) * n_lead] for f in st_loc.q),
                    lips=tuple(l[(0,) * n_lead] for l in st_loc.lips))
                pc_in = (tuple(x[(0,) * n_lead] for x in pc_loc)
                         if cache_p else None)

                if preconditioner_init_scale is None:
                    # on-the-fly init: per-leaf global scale, one pmean over
                    # the leaf's sharded axes (reference class recipe,
                    # psgd.py:599-602 / :940-943 per tensor).  Gated on
                    # count == 0 so the collective only runs at step 0
                    # (count is replicated -> all devices take one branch).
                    def rescale(s):
                        if mode == "newton":
                            v2 = jnp.mean(jnp.abs(
                                v_loc.astype(jnp.float32)) ** 2)
                            h4 = jnp.mean(jnp.abs(
                                h_loc.astype(jnp.float32)) ** 4)
                            if all_axes:
                                v2 = jax.lax.pmean(v2, all_axes)
                                h4 = jax.lax.pmean(h4, all_axes)
                            scale = v2 ** 0.25 * (h4 + damping_t ** 4) ** (-1 / 8)
                        else:
                            m4 = jnp.mean(jnp.abs(
                                fit_loc.astype(jnp.float32)) ** 4)
                            if all_axes:
                                m4 = jax.lax.pmean(m4, all_axes)
                            scale = (m4 + damping_t ** 4) ** (-1 / 8)
                        eff = scale * scale if plan.fits_p else scale
                        order = max(plan.order, 1)
                        mult = eff ** (1.0 / order)
                        return kron_p.KronState(
                            q=tuple(f * mult.astype(
                                jnp.real(f).dtype) for f in s.q),
                            lips=s.lips)

                    inner = jax.lax.cond(count == 0, rescale, lambda s: s,
                                         inner)
                    if cache_p:
                        # Q rescaled on step 0: the cache must follow
                        pc_in = jax.lax.cond(
                            count == 0,
                            lambda: kron_p.compute_p_factors(inner, plan),
                            lambda: pc_in)

                def fit(s, return_pg=False):
                    if mode == "newton":
                        return kron_p.update_kron_newton(
                            s, plan, v_loc.reshape(plan.shape).astype(qdt),
                            h_loc.reshape(plan.shape).astype(qdt), kk,
                            lr=lr_q, beta_l=beta_l_t,
                            damping=damping_t,
                            norm_k=resolve_norm_k(norm_k, qdt))
                    return kron_p.update_kron_whiten(
                        s, plan, fit_loc.reshape(plan.shape).astype(qdt), kk,
                        lr=lr_q, beta_l=beta_l_t, damping=damping_t,
                        norm_k=resolve_norm_k(norm_k, qdt),
                        return_pg=return_pg)

                apply_shaped = apply_loc.reshape(plan.shape).astype(qdt)

                def apply_with(s, pc):
                    if cache_p:
                        return kron_p.precond_grad_cached(pc, plan,
                                                          apply_shaped)
                    return kron_p.precond_grad(s, plan, apply_shaped)

                def refresh(s):
                    return (kron_p.compute_p_factors(s, plan) if cache_p
                            else pc_in)

                if share_fit_apply and mode == "whiten":
                    # fit and apply sources coincide (validated above):
                    # reuse the fit's internal P(src + damping*v) as the
                    # update on fit steps — one exprP chain per step
                    if cache_p:
                        def fit_branch(s):
                            ns, pg = fit(s, return_pg=True)
                            return ns, refresh(ns), pg
                        inner, pc_in, pg = jax.lax.cond(
                            do_update, fit_branch,
                            lambda s: (s, pc_in, apply_with(s, pc_in)),
                            inner)
                    else:
                        def no_fit(s):
                            return s, apply_with(s, None)
                        inner, pg = jax.lax.cond(
                            do_update, lambda s: fit(s, return_pg=True),
                            no_fit, inner)
                elif cache_p:
                    def fit_and_refresh(s):
                        ns = fit(s)
                        return ns, refresh(ns)
                    if update_preconditioner_first:  # biased (ddp:109-110)
                        inner, pc_in = jax.lax.cond(
                            do_update, fit_and_refresh,
                            lambda s: (s, pc_in), inner)
                        pg = apply_with(inner, pc_in)
                    else:
                        pg = apply_with(inner, pc_in)
                        inner, pc_in = jax.lax.cond(
                            do_update, fit_and_refresh,
                            lambda s: (s, pc_in), inner)
                else:
                    if update_preconditioner_first:  # biased (ddp:109-110)
                        inner = jax.lax.cond(do_update, fit, lambda s: s,
                                             inner)
                        used = inner
                    else:
                        used = inner
                        inner = jax.lax.cond(do_update, fit, lambda s: s,
                                             inner)
                    pg = kron_p.precond_grad(used, plan, apply_shaped)
                pg = pg.astype(g_loc.dtype)
                if mode == "whiten":
                    pg = _amp_clip(pg, *clip_amps_t)
                pg = pg.reshape(g_loc.shape)
                st_out = ShardedKronLeaf(
                    q=tuple(f[(None,) * n_lead] for f in inner.q),
                    lips=tuple(l[(None,) * n_lead] for l in inner.lips))
                if cache_p:
                    pc_out = tuple(x[(None,) * n_lead] for x in pc_in)
                    return pg, st_out, pc_out
                return pg, st_out

            in_specs = (leaf_spec, leaf_spec, leaf_spec, state_specs,
                        PS(), PS())
            args = [g, fit_src, apply_src, st, do_update, state.count]
            if mode == "newton":
                in_specs = in_specs + (leaf_spec, leaf_spec)
                args += [v_leaf, h_leaf]
            out_specs = (leaf_spec, state_specs)
            if cache_p:
                if mode != "newton":
                    # keep local_update's positional signature aligned
                    in_specs = in_specs + (PS(), PS())
                    args += [jnp.zeros(()), jnp.zeros(())]
                in_specs = in_specs + (pc_specs,)
                args += [pc_leaf]
                out_specs = out_specs + (pc_specs,)
            fn = shard_map(local_update, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_rep=False)
            res = fn(*args)
            if cache_p:
                pg, st_new, pc_new = res
                new_pcache.append(pc_new)
            else:
                pg, st_new = res
            outs.append(pg)
            new_states.append(st_new)

        if mode == "newton":
            # schedule-resolved; _global_norm_scale short-circuits static inf
            scale = _global_norm_scale(
                outs, _sched(grad_clip_max_norm, state.count))
            outs = [p * scale for p in outs]

        new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                              precond=tuple(new_states),
                              pcache=tuple(new_pcache) if cache_p else None)
        return jax.tree_util.tree_unflatten(treedef, outs), new_state

    if mode == "newton":
        return optax.GradientTransformationExtraArgs(init_fn, update_fn)
    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_per_shard_kron_whiten(
    mesh: Mesh,
    param_specs: Any,
    preconditioner_max_size: float = float("inf"),
    preconditioner_max_skew: float = 1.0,
    preconditioner_init_scale: Optional[float] = 1.0,
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
    share_fit_apply: bool = False,
    cache_p: bool = False,
) -> optax.GradientTransformation:
    """Per-shard gradient/momentum whitening (zero optimizer collectives).

    ``param_specs``: pytree of PartitionSpecs matching the params (multi-axis
    entries supported).  ``preconditioner_init_scale=None`` sets the scale on
    the fly (one pmean per leaf on step 0); the reference wrapper recommends
    setting it explicitly (ddp:36-39), and so does this one.
    ``share_fit_apply``: see scale_by_kron_whiten — reuse the fit's internal
    Pg as the update on fit steps (same preconditions).
    ``cache_p``: see scale_by_kron_whiten — cache P_i = Q_i^H Q_i per local
    shard at each fit; non-fit applies are a single factor pass (the cache
    is shard-local state, zero extra collectives).
    """
    return _per_shard_core(
        mesh, param_specs, "whiten", preconditioner_max_size,
        preconditioner_max_skew, preconditioner_init_scale,
        lr_preconditioner, betaL, damping, momentum, grad_clip_max_amps,
        float("inf"), preconditioner_update_probability,
        update_preconditioner_first, whiten_grad, dq, preconditioner_dtype,
        momentum_dtype, norm_k, seed, share_fit_apply=share_fit_apply,
        cache_p=cache_p)


def scale_by_per_shard_kron_newton(
    mesh: Mesh,
    param_specs: Any,
    preconditioner_max_size: float = float("inf"),
    preconditioner_max_skew: float = 1.0,
    preconditioner_init_scale: Optional[float] = 1.0,
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
    cache_p: bool = False,
) -> optax.GradientTransformationExtraArgs:
    """Per-shard Newton-type preconditioning (beyond the reference wrapper,
    which only ships whitening): each local shard gets an independent Kron
    preconditioner fitted on local (v, Hv) shard views; the Hvp itself is
    evaluated globally through ``hvp_fn`` (jax.jvp over the sharded loss).
    ``cache_p``: see scale_by_kron_whiten (shard-local cached P_i)."""
    return _per_shard_core(
        mesh, param_specs, "newton", preconditioner_max_size,
        preconditioner_max_skew, preconditioner_init_scale,
        lr_preconditioner, betaL, damping, momentum, (2.0, 10.0),
        grad_clip_max_norm, preconditioner_update_probability,
        True, True, dq, preconditioner_dtype, momentum_dtype, norm_k, seed,
        cache_p=cache_p)


def per_shard_kron_whiten(mesh: Mesh, param_specs: Any,
                          learning_rate: float | Callable = 1e-3,
                          weight_decay: float = 0.0,
                          weight_decay_mode: str = "decoupled",
                          **kwargs) -> optax.GradientTransformation:
    """Full per-shard whitening optimizer: whitening + weight decay (both
    reference modes, ddp:117-122) + -lr scaling."""
    return _with_weight_decay(
        scale_by_per_shard_kron_whiten(mesh, param_specs, **kwargs),
        learning_rate, weight_decay, weight_decay_mode)


def per_shard_kron_newton(mesh: Mesh, param_specs: Any,
                          learning_rate: float | Callable = 0.01,
                          weight_decay: float = 0.0,
                          weight_decay_mode: str = "decoupled",
                          **kwargs) -> optax.GradientTransformationExtraArgs:
    return _with_weight_decay(
        scale_by_per_shard_kron_newton(mesh, param_specs, **kwargs),
        learning_rate, weight_decay, weight_decay_mode)
