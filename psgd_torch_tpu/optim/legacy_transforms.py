"""Optax-style transforms for the legacy preconditioner families.

The reference's deprecated module packages each family as a closure class
with ``preconditioner_type="Newton"|"whitening"``
(/root/reference/preconditioned_stochastic_gradient_descent.py: class
LRA/UVd:756, XMat:993, Newton:1216, Affine:1723).  These transforms are the
idiomatic JAX equivalents, one per family:

  * ``scale_by_xmat``        — X-matrix Q = diag(a) + adiag(b)  (:947-1161)
  * ``scale_by_splu``        — sparse LU with rank-r corners    (:481-617)
  * ``scale_by_newton_inv``  — dense GL(n,R) with a Woodbury-maintained
                               inverse (keep_invQ=True path, :1171-1213)
  * ``scale_by_uvd``         — legacy LRA with '1st'/'2nd' step
                               normalizers (:635-942)
  * ``scale_by_affine``      — per-matrix kron(Q2, Q1) with matrixizer;
                               whitening uses the drop-v update where cheap
                               (:1404-1899)

Whitening mode feeds the update the classic damped pair
``(v, g + damp*mean|g|*v)`` (damped_pair_vg, :50-67); Newton mode draws v and
evaluates an exact Hvp through the optax extra-arg ``hvp_fn`` (see
optim.hvp.make_hvp_fn) under the update-probability gate.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.linalg import damped_pair_vg
from ..precond import affine as affine_p
from ..precond import legacy as legacy_p
from ..precond import splu as splu_p
from ..precond import xmat as xmat_p
from .hvp import rand_like_tree
from .transforms import (PSGDState, _ema_update, _global_norm_scale,
                         _ravel, _sched)


def _default_lr_precond(lr, step_normalizer):
    """Reference legacy classes default lr_preconditioner conditionally on
    the step normalizer: 0.1 for '2nd', 0.01 for '1st'
    (preconditioned...py:803-808, 1032-1037, 1260-1265)."""
    if lr is not None:
        return lr
    return 0.1 if step_normalizer == "2nd" else 0.01


def _vector_family(name: str, init_state: Callable, update_fn: Callable,
                   apply_fn: Callable, rescale_state: Optional[Callable] = None):
    """Build a scale_by_* transform for a family that preconditions the
    concatenated parameter vector.

    init_state(n, dtype, key) -> precond state
    update_fn(state, v, h, key) -> state
    apply_fn(state, g) -> Pg
    rescale_state(state, mult) -> state scaled so that Q -> mult * Q
      (enables the reference's on-the-fly preconditioner_init_scale,
      preconditioned...py:879-881, 903-905, 1099-1101, 1332-1335)
    """

    def scale_by(
        preconditioner_type: str = "whitening",
        preconditioner_init_scale: Optional[float] = None,
        lr_preconditioner: Optional[float | Callable] = None,
        step_normalizer: str = "2nd",
        momentum: float = 0.0,
        momentum_dtype: Any = None,
        grad_clip_max_norm: float = float("inf"),
        preconditioner_update_probability: float | Callable = 1.0,
        damping: float = 2.0 ** -13,
        preconditioner_dtype: Any = None,
        seed: int = 0,
        **family_kwargs,
    ) -> optax.GradientTransformationExtraArgs:
        if preconditioner_type not in ("whitening", "Newton"):
            raise ValueError(f"unknown preconditioner_type {preconditioner_type!r}")
        mom = momentum if 0.0 < momentum < 1.0 else 0.0
        lr_precond = _default_lr_precond(lr_preconditioner, step_normalizer)

        def init_fn(params):
            vec, _ = _ravel(params)
            dt = preconditioner_dtype if preconditioner_dtype is not None else vec.dtype
            st = init_state(vec.size, dt, jax.random.key(seed + 1), **family_kwargs)
            if preconditioner_init_scale is not None and rescale_state is not None:
                st = rescale_state(st, jnp.asarray(preconditioner_init_scale,
                                                   jnp.float32))
            mu = (jnp.zeros(vec.shape, momentum_dtype or vec.dtype)
                  if mom > 0 else None)
            return PSGDState(count=jnp.zeros((), jnp.int32),
                             key=jax.random.PRNGKey(seed), mu=mu, precond=st)

        def update_fn_(updates, state, params=None, *, hvp_fn=None, vs=None,
                       hvs=None, **extra):
            del extra
            g_vec, unravel = _ravel(updates)
            st = state.precond
            qdt = jax.tree_util.tree_leaves(st)[0].dtype
            key, k_gate, k_v, k_fit = jax.random.split(state.key, 4)
            pred = jnp.logical_or(
                jax.random.uniform(k_gate)
                < _sched(preconditioner_update_probability, state.count),
                state.count == 0)

            def maybe_rescale(s, scale):
                # on-the-fly init: Q <- scale * Q on the first step only
                # (reference preconditioned...py:879-881, 903-905)
                if preconditioner_init_scale is not None or rescale_state is None:
                    return s
                mult = jnp.where(state.count == 0, scale, 1.0)
                return rescale_state(s, mult)

            if preconditioner_type == "whitening":
                def fit(s):
                    s = maybe_rescale(
                        s, jnp.mean(g_vec.astype(jnp.float32) ** 4) ** (-1 / 8))
                    v, h = damped_pair_vg(g_vec.astype(qdt), k_v, damping)
                    return update_fn(s, v, h, k_fit, lr=_sched(lr_precond, state.count),
                                     step_normalizer=step_normalizer)

                st = jax.lax.cond(pred, fit, lambda s: s, st)
            elif hvp_fn is not None:
                if params is None:
                    raise ValueError(f"{name} Newton with hvp_fn requires params")

                def fit(s):
                    vt = rand_like_tree(k_v, params)
                    _, ht = hvp_fn(params, vt)
                    v_vec, h_vec = _ravel(vt)[0], _ravel(ht)[0]
                    s = maybe_rescale(
                        s, jnp.mean(v_vec.astype(jnp.float32) ** 2) ** 0.25
                        * jnp.mean(h_vec.astype(jnp.float32) ** 4) ** (-1 / 8))
                    return update_fn(s, v_vec.astype(qdt), h_vec.astype(qdt),
                                     k_fit, lr=_sched(lr_precond, state.count),
                                     step_normalizer=step_normalizer)

                st = jax.lax.cond(pred, fit, lambda s: s, st)
            elif vs is not None and hvs is not None:
                v_vec, h_vec = _ravel(vs)[0], _ravel(hvs)[0]
                st = maybe_rescale(
                    st, jnp.mean(v_vec.astype(jnp.float32) ** 2) ** 0.25
                    * jnp.mean(h_vec.astype(jnp.float32) ** 4) ** (-1 / 8))
                st = update_fn(st, v_vec.astype(qdt), h_vec.astype(qdt), k_fit,
                               lr=_sched(lr_precond, state.count),
                               step_normalizer=step_normalizer)
            else:
                raise ValueError(
                    f"{name} Newton requires hvp_fn or explicit (vs, hvs)")

            if mom > 0:
                mu = _ema_update(state.mu, g_vec, state.count, mom)
                src = mu
            else:
                mu, src = None, g_vec

            pre = apply_fn(st, src.astype(qdt)).astype(g_vec.dtype)
            pre = pre * _global_norm_scale(pre, grad_clip_max_norm)
            new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                                  precond=st)
            return unravel(pre), new_state

        return optax.GradientTransformationExtraArgs(init_fn, update_fn_)

    scale_by.__name__ = f"scale_by_{name}"
    return scale_by


def _cast_mult(mult, x):
    return mult.astype(x.dtype) if hasattr(mult, "astype") else mult


scale_by_xmat = _vector_family(
    "xmat",
    init_state=lambda n, dt, key: xmat_p.init_xmat(n, 1.0, dt),
    update_fn=lambda s, v, h, key, **kw: xmat_p.update_xmat(s, v, h, **kw),
    apply_fn=xmat_p.precond_grad_xmat,
    # Q = diag(a) + adiag(b) is linear in (a, b)
    rescale_state=lambda s, m: xmat_p.XMatState(
        a=s.a * _cast_mult(m, s.a), b=s.b * _cast_mult(m, s.b)),
)

scale_by_splu = _vector_family(
    "splu",
    init_state=lambda n, dt, key, rank=10: splu_p.init_splu(
        n, max(1, min(rank, n - 1)), 1.0, dt),
    # SPLU has no step-normalizer choice in the reference (:481-572)
    update_fn=lambda s, v, h, key, lr, step_normalizer:
        splu_p.update_splu(s, v, h, lr=lr),
    apply_fn=splu_p.precond_grad_splu,
    # Q = L U: split the scale multiplicatively between the factors
    rescale_state=lambda s, m: splu_p.SPLUState(
        l12=s.l12 * _cast_mult(jnp.sqrt(m), s.l12),
        l3=s.l3 * _cast_mult(jnp.sqrt(m), s.l3),
        u12=s.u12 * _cast_mult(jnp.sqrt(m), s.u12),
        u3=s.u3 * _cast_mult(jnp.sqrt(m), s.u3)),
)

scale_by_newton_inv = _vector_family(
    "newton_inv",
    init_state=lambda n, dt, key: legacy_p.init_newton_inv(n, 1.0, dt),
    update_fn=lambda s, v, h, key, lr, step_normalizer:
        legacy_p.update_newton_inv(s, v, h, lr=lr,
                                   step_normalizer=step_normalizer),
    apply_fn=legacy_p.precond_grad_newton_inv,
    rescale_state=lambda s, m: legacy_p.NewtonInvState(
        q=s.q * _cast_mult(m, s.q), inv_q=s.inv_q / _cast_mult(m, s.inv_q)),
)

scale_by_uvd = _vector_family(
    "uvd",
    init_state=lambda n, dt, key, rank=10: legacy_p.init_uvd(
        n, rank, key, 1.0, dt),
    update_fn=lambda s, v, h, key, lr, step_normalizer:
        legacy_p.update_uvd(s, v, h, key, lr=lr,
                            step_normalizer=step_normalizer),
    apply_fn=legacy_p.precond_grad_uvd,
    # reference scales only d (preconditioned...py:879-881)
    rescale_state=lambda s, m: legacy_p.UVdState(
        u=s.u, v=s.v, d=s.d * _cast_mult(m, s.d)),
)


def scale_by_affine(
    preconditioner_type: str = "whitening",
    preconditioner_init_scale: Optional[float] = None,
    lr_preconditioner: Optional[float | Callable] = None,
    step_normalizer: str = "2nd",
    momentum: float = 0.0,
    momentum_dtype: Any = None,
    grad_clip_max_norm: float = float("inf"),
    preconditioner_update_probability: float | Callable = 1.0,
    preconditioner_max_size: float = float("inf"),
    preconditioner_max_skew: float = float("inf"),
    preconditioner_dtype: Any = None,
    seed: int = 0,
) -> optax.GradientTransformationExtraArgs:
    """Per-matrix affine preconditioner Q = kron(Q2, Q1) with matrixizer.

    Each parameter leaf is viewed as a matrix via its own ``matrixizer`` plan
    (dim-permutation search, reference :1414-1472); whitening mode uses the
    drop-v update (v analytically integrated out) where the factor shapes
    allow (reference :1614-1700)."""
    if preconditioner_type not in ("whitening", "Newton"):
        raise ValueError(f"unknown preconditioner_type {preconditioner_type!r}")
    mom = momentum if 0.0 < momentum < 1.0 else 0.0
    lr_precond = _default_lr_precond(lr_preconditioner, step_normalizer)

    def _plans(leaves):
        return [affine_p.matrixizer(g.shape) for g in leaves]

    def _rescale_affine(states, leaves, count, newton_vh=None):
        """On-the-fly init: ql, qr *= sqrt(scale) on the first step, scale
        from the leaves' statistics (whitening: (mean g^4)^(-1/8) max over
        tensors; Newton: (mean v^2)^(1/4) (mean h^4)^(-1/8))."""
        if preconditioner_init_scale is not None:
            return states
        if newton_vh is None:
            m4 = jnp.stack([jnp.mean(jnp.abs(g.astype(jnp.float32)) ** 4)
                            for g in leaves]).max()
            scale = m4 ** (-1 / 8)
        else:
            v_leaves, h_leaves = newton_vh
            numel = sum(v.size for v in v_leaves)
            v2 = sum(jnp.sum(jnp.abs(v.astype(jnp.float32)) ** 2)
                     for v in v_leaves) / numel
            h4 = jnp.stack([jnp.mean(jnp.abs(h.astype(jnp.float32)) ** 4)
                            for h in h_leaves]).max()
            scale = v2 ** 0.25 * h4 ** (-1 / 8)
        root = jnp.sqrt(jnp.where(count == 0, scale, 1.0))
        return tuple(
            st._replace(ql=st.ql * root.astype(st.ql.dtype),
                        qr=st.qr * root.astype(st.qr.dtype))
            for st in states)

    def init_fn(params):
        leaves = jax.tree_util.tree_leaves(params)
        states = []
        for leaf, plan in zip(leaves, _plans(leaves)):
            dt = preconditioner_dtype if preconditioner_dtype is not None else leaf.dtype
            states.append(affine_p.init_affine(
                plan.matrix_shape,
                1.0 if preconditioner_init_scale is None
                else preconditioner_init_scale,
                preconditioner_max_size, preconditioner_max_skew, dt))
        mu = (jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, momentum_dtype or x.dtype), params)
            if mom > 0 else None)
        return PSGDState(count=jnp.zeros((), jnp.int32),
                         key=jax.random.PRNGKey(seed), mu=mu,
                         precond=tuple(states))

    def update_fn(updates, state, params=None, *, hvp_fn=None, vs=None,
                  hvs=None, **extra):
        del extra
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        plans = _plans(leaves)
        key, k_gate, k_v, k_fit = jax.random.split(state.key, 4)
        pred = jnp.logical_or(
            jax.random.uniform(k_gate)
                < _sched(preconditioner_update_probability, state.count),
            state.count == 0)

        def fit_whiten(states):
            states = _rescale_affine(states, leaves, state.count)
            out = []
            for i, (st, plan, g) in enumerate(zip(states, plans, leaves)):
                qdt = st.ql.dtype
                gm = affine_p.to_matrix(plan, g).astype(qdt)
                out.append(affine_p.update_affine_dropv(
                    st, gm, jax.random.fold_in(k_fit, i),
                    lr=_sched(lr_precond, state.count), step_normalizer=step_normalizer))
            return tuple(out)

        def fit_newton(states, v_leaves, h_leaves):
            states = _rescale_affine(states, leaves, state.count,
                                     newton_vh=(v_leaves, h_leaves))
            out = []
            for i, (st, plan, v, h) in enumerate(
                    zip(states, plans, v_leaves, h_leaves)):
                qdt = st.ql.dtype
                vm = affine_p.to_matrix(plan, v).astype(qdt)
                hm = affine_p.to_matrix(plan, h).astype(qdt)
                out.append(affine_p.update_affine(
                    st, vm, hm, jax.random.fold_in(k_fit, i),
                    lr=_sched(lr_precond, state.count), step_normalizer=step_normalizer))
            return tuple(out)

        states_t = tuple(state.precond)
        if preconditioner_type == "whitening":
            states_t = jax.lax.cond(pred, fit_whiten, lambda s: s, states_t)
        elif hvp_fn is not None:
            if params is None:
                raise ValueError("affine Newton with hvp_fn requires params")

            def fit_branch(states):
                vt = rand_like_tree(k_v, params)
                _, ht = hvp_fn(params, vt)
                return fit_newton(states, jax.tree_util.tree_leaves(vt),
                                  jax.tree_util.tree_leaves(ht))

            states_t = jax.lax.cond(pred, fit_branch, lambda s: s, states_t)
        elif vs is not None and hvs is not None:
            states_t = fit_newton(states_t, jax.tree_util.tree_leaves(vs),
                                  jax.tree_util.tree_leaves(hvs))
        else:
            raise ValueError("affine Newton requires hvp_fn or (vs, hvs)")

        if mom > 0:
            mu = _ema_update(state.mu, updates, state.count, mom)
            srcs = jax.tree_util.tree_leaves(mu)
        else:
            mu, srcs = None, leaves

        pre = []
        for st, plan, src, g in zip(states_t, plans, srcs, leaves):
            qdt = st.ql.dtype
            gm = affine_p.to_matrix(plan, src).astype(qdt)
            pg = affine_p.precond_grad_affine(st, gm)
            pre.append(affine_p.from_matrix(plan, pg).astype(g.dtype).reshape(g.shape))
        scale = _global_norm_scale(pre, grad_clip_max_norm)
        pre = [p * scale for p in pre]
        new_state = PSGDState(count=state.count + 1, key=key, mu=mu,
                              precond=states_t)
        return jax.tree_util.tree_unflatten(treedef, pre), new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def _optimizer(scale_by, default_lr):
    def opt(learning_rate=default_lr, weight_decay: float = 0.0,
            weight_decay_mode: str = "decoupled", **kwargs):
        from .transforms import _with_weight_decay
        return _with_weight_decay(scale_by(**kwargs), learning_rate,
                                  weight_decay, weight_decay_mode)
    return opt


xmat = _optimizer(scale_by_xmat, 0.01)
splu = _optimizer(scale_by_splu, 0.01)
newton_inv = _optimizer(scale_by_newton_inv, 0.01)
uvd = _optimizer(scale_by_uvd, 0.01)
affine = _optimizer(scale_by_affine, 0.01)
