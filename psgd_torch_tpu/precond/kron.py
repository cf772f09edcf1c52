"""Kronecker-factored PSGD preconditioners (L1 functional kernels), TPU-first.

Functional JAX re-design of the reference's Kron family
(/root/reference/psgd.py:161-513 for whitening, :657-829 for Newton-type).
Capabilities covered:

  * ``init_kron``     — per-tensor state (one factor per dim, dense matrix or
    diagonal chosen by max_size / max_skew) plus a *static, hashable* plan of
    einsum subscripts (reference builds live opt_einsum expressions at
    psgd.py:161-263; here plans are plain strings derived from shapes so the
    state is a pure, serializable pytree and everything jit-caches cleanly).
  * one update function per local-coordinate geometry dQ:
    EQ, QEP, QEQ, Q0.5EQ1.5 (default), QUAD, and the fit-P-directly QUAD4P and
    PRO4P, each in gradient/momentum-whitening and Newton (V, Hvp) flavors.
  * ``precond_grad``  — apply P = Q^H Q (or P itself for *4P) to a gradient.

Design notes (TPU):
  - All control flow is static (factor structure known from shapes) or
    ``lax.cond`` on PRNG draws (the prob-0.01 factor balancing), so one XLA
    program covers the whole update.
  - The matmul-only geometries (QEQ / Q0.5EQ1.5 / QUAD / *4P) map directly to
    the MXU; EQ's triangular solves go through lax.linalg in float32
    (lift2single policy) and are kept for parity, not speed.
  - L (Lipschitz-constant estimates) always lives in >= float32.
  - State updates are pure: every function returns a new ``KronState``.
"""

from __future__ import annotations

import string
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import opt_einsum

from ..ops.linalg import (
    lift2single,
    lifted_real_dtype,
    norm_lower_bound_spd,
    procrustes_step2,
    procrustes_loop3,
    real_dtype_of,
)

# Canonical dQ geometry names.
DQ_EQ = "EQ"
DQ_QEP = "QEP"
DQ_QEQ = "QEQ"
DQ_QUAD = "QUAD"
DQ_Q05EQ15 = "Q0.5EQ1.5"
DQ_QUAD4P = "QUAD4P"
DQ_PRO4P = "PRO4P"
ALL_DQ = (DQ_EQ, DQ_QEP, DQ_QEQ, DQ_QUAD, DQ_Q05EQ15, DQ_QUAD4P, DQ_PRO4P)
_FIT_P = frozenset({DQ_QUAD4P, DQ_PRO4P})
# geometries the dim-sharded (factor_sharding) update implements
DIM_SHARDABLE_DQS = frozenset({DQ_Q05EQ15, DQ_QUAD, DQ_QEQ})


def canonical_dq(dq: str) -> str:
    dq = {"Q0p5EQ1p5": DQ_Q05EQ15}.get(dq, dq)
    if dq not in ALL_DQ:
        raise ValueError(f"Invalid dQ {dq!r}; valid choices: {ALL_DQ}")
    return dq


# Fused Pallas NS-update kernel gate: None = auto (on TPU backends, for
# supported factor shapes/dtypes), True/False = force.
_USE_FUSED_NS: bool | None = None


def set_fused_ns(enabled: bool | None) -> None:
    """Override the fused-Pallas-kernel policy for the Q0.5EQ1.5 updates."""
    global _USE_FUSED_NS
    _USE_FUSED_NS = enabled


def _fused_ns_enabled(n: int, dtype) -> bool:
    if _USE_FUSED_NS is False:
        return False
    from ..ops.pallas_kernels import ns_update_supported
    if not ns_update_supported(n, dtype):
        return False
    if _USE_FUSED_NS is True:
        return True
    return jax.default_backend() == "tpu"


def _fused_ns_step(f, term1, lip, term2_scalar, key, lr, beta_l, norm_k,
                   step_mat=None):
    """Single-factor fused NS update (term1 bound + L + step + Procrustes)
    through the Pallas kernel (ops.pallas_kernels.fused_ns_update)."""
    from ..ops.pallas_kernels import fused_ns_update, key_seed_words
    seed = key_seed_words(key)[None]
    t2 = jnp.asarray([term2_scalar], jnp.float32)
    sm = None if step_mat is None else step_mat[None]
    fq, new_l = fused_ns_update(term1[None], f[None], lip[None].astype(jnp.float32),
                                t2, seed, lr, beta_l, k=norm_k, step_mat=sm)
    return fq[0], new_l[0].astype(lip.dtype)


class KronPlan(NamedTuple):
    """Static (hashable) contraction plan for one tensor's Kron preconditioner.

    Subscript semantics (reference psgd.py:172-184):
      subs_p : apply P = Q^H Q to a tensor, e.g. 'aA,bB,aα,bβ,αβ->AB'
      subs_a : apply all Q factors once, e.g. 'aA,bB,AB->ab'
      subs_gs[i] : contract two tensors over all dims but i
      subs_qs[i] : apply factor i alone
    """
    shape: Tuple[int, ...]
    is_diag: Tuple[bool, ...]
    dq: str
    subs_p: str
    subs_a: str
    subs_gs: Tuple[str, ...]
    subs_qs: Tuple[str, ...]
    numel: int

    @property
    def order(self) -> int:
        return len(self.shape)

    @property
    def fits_p(self) -> bool:
        return self.dq in _FIT_P


class KronState(NamedTuple):
    """Per-tensor Kron preconditioner state: factors Q and L-constants.

    ``q`` is a tuple of arrays — a (n, n) matrix or an (n,) diagonal per dim
    (scalar tensors get a single () factor).  ``lips`` is a tuple of scalar
    Lipschitz-smoothness estimates in >= float32 (reference psgd.py:202-207).
    A pure pytree: orbax-serializable, unlike the reference's live opt_einsum
    expressions stored in optimizer state (SURVEY.md §5).
    """
    q: Tuple[jax.Array, ...]
    lips: Tuple[jax.Array, ...]


def _sym(i: int) -> str:
    return opt_einsum.get_symbol(i)


def make_kron_plan(shape: Tuple[int, ...], max_size: float = float("inf"),
                   max_skew: float = 1.0, dq: str = DQ_Q05EQ15,
                   force_diag: Optional[Tuple[bool, ...]] = None) -> KronPlan:
    """Build the static contraction plan for a tensor shape.

    Dim i gets a dense matrix factor unless ``size <= 1 or size > max_size or
    size**2 > max_skew * numel`` (diagonal then) — reference psgd.py:208-210.
    ``force_diag`` (per-dim bools) additionally forces listed dims diagonal
    regardless of the size rule — used by the layer-stack factor sharing,
    where the layer axis keeps a per-layer scale but never a dense
    cross-layer factor.
    """
    dq = canonical_dq(dq)
    shape = tuple(int(s) for s in shape)
    if force_diag is not None and len(force_diag) != len(shape):
        raise ValueError(f"force_diag {force_diag} does not match {shape}")
    numel = 1
    for s in shape:
        numel *= s

    if len(shape) == 0:  # scalar tensor: one scalar factor (psgd.py:189-195)
        return KronPlan(shape=(), is_diag=(True,), dq=dq, subs_p=",,->",
                        subs_a=",->", subs_gs=(",->",), subs_qs=(",->",), numel=1)

    if len(shape) > 26:
        raise ValueError(f"Tensors of order {len(shape)} > 26 are not supported")

    # Three disjoint symbol sets per dim: row (output of Q), col, and a second
    # col set for the P = Q^H Q chain.
    row = [_sym(i) for i in range(len(shape))]
    col = [_sym(i + 26) for i in range(len(shape))]
    col2 = [_sym(i + 52) for i in range(len(shape))]

    is_diag = tuple(
        (s <= 1) or (s > max_size) or (s * s > max_skew * numel)
        or (force_diag is not None and force_diag[i])
        for i, s in enumerate(shape)
    )

    # exprA: out[row...] = prod_i Q_i[row_i, col_i] * T[col...]
    fac_a, in_a, out_a = [], [], []
    # exprP: out[col...] = prod_i conj(Q_i)[row_i, col_i] Q_i[row_i, col2_i] T[col2...]
    fac_p1, fac_p2, in_p, out_p = [], [], [], []
    subs_gs, subs_qs = [], []
    for i, diag in enumerate(is_diag):
        if diag:
            fac_a.append(row[i]); in_a.append(row[i]); out_a.append(row[i])
            fac_p1.append(row[i]); fac_p2.append(row[i])
            in_p.append(row[i]); out_p.append(row[i])
        else:
            fac_a.append(row[i] + col[i]); in_a.append(col[i]); out_a.append(row[i])
            fac_p1.append(row[i] + col[i]); fac_p2.append(row[i] + col2[i])
            in_p.append(col2[i]); out_p.append(col[i])

        # exprGs[i]: contract X (with col[i] at dim i) against Y (col2[i] at
        # dim i) over all other dims; diagonal dims keep a vector.
        x_sub = "".join(col[i] if j == i else row[j] for j in range(len(shape)))
        if diag:
            subs_gs.append(f"{x_sub},{x_sub}->{col[i]}")
            subs_qs.append(f"{col[i]},{x_sub}->{x_sub}")
        else:
            y_sub = "".join(col2[i] if j == i else row[j] for j in range(len(shape)))
            subs_gs.append(f"{x_sub},{y_sub}->{col[i]}{col2[i]}")
            subs_qs.append(f"{col[i]}{col2[i]},{y_sub}->{x_sub}")

    subs_a = ",".join(fac_a) + "," + "".join(in_a) + "->" + "".join(out_a)
    subs_p = (",".join(fac_p1) + "," + ",".join(fac_p2) + ","
              + "".join(in_p) + "->" + "".join(out_p))
    return KronPlan(shape=shape, is_diag=is_diag, dq=dq, subs_p=subs_p,
                    subs_a=subs_a, subs_gs=tuple(subs_gs), subs_qs=tuple(subs_qs),
                    numel=numel)


def init_kron(shape: Tuple[int, ...], scale: float | jax.Array = 1.0,
              max_size: float = float("inf"), max_skew: float = 1.0,
              dq: str = DQ_Q05EQ15, dtype=jnp.float32) -> tuple[KronState, KronPlan]:
    """Initialize Q = scale * I (factored) and L = 0 for a tensor shape.

    For the fit-P-directly geometries the scale is squared (psgd.py:186-187).
    ``scale`` may be a traced scalar (on-the-fly init support).
    """
    plan = make_kron_plan(shape, max_size=max_size, max_skew=max_skew, dq=dq)
    state = init_kron_from_plan(plan, scale, dtype)
    return state, plan


def init_kron_from_plan(plan: KronPlan, scale: float | jax.Array = 1.0,
                        dtype=jnp.float32) -> KronState:
    scale = jnp.asarray(scale, real_dtype_of(dtype))
    if plan.fits_p:
        scale = scale * scale
    l_dtype = lifted_real_dtype(dtype)
    if plan.order == 0:
        return KronState(q=(scale.astype(dtype) * jnp.ones((), dtype),),
                         lips=(jnp.zeros((), l_dtype),))
    factor_scale = (scale ** (1.0 / plan.order)).astype(dtype)
    qs, lips = [], []
    for size, diag in zip(plan.shape, plan.is_diag):
        if diag:
            qs.append(factor_scale * jnp.ones((size,), dtype))
        else:
            qs.append(factor_scale * jnp.eye(size, dtype=dtype))
        lips.append(jnp.zeros((), l_dtype))
    return KronState(q=tuple(qs), lips=tuple(lips))


def balance_kron(q: Tuple[jax.Array, ...]) -> Tuple[jax.Array, ...]:
    """Rescale factors to a common max-abs (geometric mean), preventing
    over/underflow.  Reference parity: psgd.py:266-275."""
    if len(q) <= 1:
        return q
    acc = lifted_real_dtype(q[0].dtype)
    norms = [jnp.max(jnp.abs(f)).astype(acc) for f in q]
    gmean = jnp.prod(jnp.stack(norms)) ** (1.0 / len(q))
    return tuple(f * (gmean / n).astype(real_dtype_of(f.dtype))
                 for f, n in zip(q, norms))


def _maybe_balance(q, key, prob: float = 0.01):
    """Balance factors with probability ``prob`` (lax.cond on a PRNG draw —
    the jit-able analogue of the reference's torch.rand gate, psgd.py:318)."""
    if len(q) <= 1:
        return q
    u = jax.random.uniform(key)
    return jax.lax.cond(u < prob, balance_kron, lambda t: t, q)


def _update_lips(lip: jax.Array, ell: jax.Array, beta_l: float) -> jax.Array:
    """L <- max(betaL * L + (1 - betaL) * ell, ell), in L's (>=fp32) dtype."""
    ell = jnp.real(ell).astype(lip.dtype)
    return jnp.maximum(beta_l * lip + (1.0 - beta_l) * ell, ell)


def _coeff(lr: float, lip: jax.Array, dtype) -> jax.Array:
    """lr / L as a scalar castable onto factors of ``dtype``."""
    return (lr / lip).astype(real_dtype_of(dtype))


def precond_grad(state: KronState, plan: KronPlan, g: jax.Array) -> jax.Array:
    """Pg: apply P = Q^H Q (or P itself for *4P geometries) to a tensor.

    Reference parity: psgd.py:322-327 and the *4P apply at psgd.py:573."""
    if plan.fits_p:
        return jnp.einsum(plan.subs_a, *state.q, g)
    return jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in state.q], *state.q, g)


def apply_all_factors(state: KronState, plan: KronPlan, g: jax.Array) -> jax.Array:
    """A = Q g (apply every factor once)."""
    return jnp.einsum(plan.subs_a, *state.q, g)


def compute_p_factors(state: KronState, plan: KronPlan) -> Tuple[jax.Array, ...]:
    """Per-factor P_i = Q_i^H Q_i (|q_i|^2 for diagonals): the cached form of
    P = Q^H Q.  Between Q fits the preconditioner is constant, so caching
    these after each fit lets the apply run as a SINGLE factor pass
    (``precond_grad_cached``), removing the Q_i^H Q_i recomputation the
    reference's exprP pays every step (psgd.py:402, 628-631): per dense
    factor the apply drops from min(n_i^3, numel*n_i) + numel*n_i FLOPs to
    the irreducible numel*n_i — 2x on square dense-dense leaves, a
    (m+n)/n factor on dense(m) x diag(n) leaves.  Undefined for the fit-P
    geometries (Q already is P; their apply is one pass anyway)."""
    if plan.fits_p:
        raise ValueError("compute_p_factors: the *4P geometries fit P "
                         "directly — their apply is already a single pass")
    out = []
    for q in state.q:
        if q.ndim == 2:
            out.append(jnp.conj(q).T @ q)
        else:  # diagonal (or scalar) factor
            out.append(jnp.conj(q) * q)
    return tuple(out)


def precond_grad_cached(p_factors: Tuple[jax.Array, ...], plan: KronPlan,
                        g: jax.Array) -> jax.Array:
    """Pg from cached per-factor P_i (see ``compute_p_factors``): one
    contraction per dim — the *4P apply cost for every geometry."""
    return jnp.einsum(plan.subs_a, *p_factors, g)


def _damped(g: jax.Array, key: jax.Array, damping: float) -> jax.Array:
    """g + (damping + eps(dtype)|g|) * v — the whitening/Newton damping that
    upper-bounds P as P < I/damping (psgd.py:334-336).  v is white
    unit-variance noise (hardware-PRNG uniform on TPU, threefry normal
    elsewhere; see ops.fastrand for why that is sound)."""
    from ..ops.fastrand import unit_noise
    rdt = real_dtype_of(g.dtype)
    eps = jnp.finfo(rdt).eps
    d = jnp.asarray(damping, rdt) + eps * jnp.abs(g)
    return g + d * unit_noise(key, g.shape, g.dtype)


def _damped_stacked(g: jax.Array, keys: jax.Array, damping: float) -> jax.Array:
    """Batched `_damped` for a layer stack: layer i's noise is a pure
    function of keys[i] (shard-composition independent)."""
    from ..ops.fastrand import unit_noise_stacked
    rdt = real_dtype_of(g.dtype)
    eps = jnp.finfo(rdt).eps
    d = jnp.asarray(damping, rdt) + eps * jnp.abs(g)
    return g + d * unit_noise_stacked(keys, g.shape[1:], g.dtype)


# ---------------------------------------------------------------------------
# Whitening updates: fit Q from the gradient/momentum G only (v integrated out
# analytically: term2 = numel/q.numel() for diag or numel/q.shape[0] * I for
# matrix factors — reference psgd.py:379-385).
# ---------------------------------------------------------------------------


def update_kron_whiten(state: KronState, plan: KronPlan, g: jax.Array,
                       key: jax.Array, lr: float = 0.1, beta_l: float = 0.9,
                       damping: float = 1e-9, norm_k: int = 32,
                       return_pg: bool = False) -> KronState:
    """Dispatch one whitening update for the plan's dQ geometry.

    With ``return_pg=True`` also returns the P(g + damping*v) product the fit
    computed internally (pre-update Q) — every geometry except EQ evaluates
    the full apply product as its first step, so callers whose apply source
    equals the fit source can reuse it and skip one exprP chain per fit step
    (the apply differs from P(g) by O(damping + eps(dtype)|g|) noise only).

    Reference parity: update_precond_kron_whiten_* (psgd.py:330-513)."""
    if return_pg and plan.dq == DQ_EQ:
        raise ValueError("EQ geometry does not compute Pg during the fit; "
                         "share_fit_apply is unsupported for dq='EQ'")
    fn = _WHITEN_UPDATES[plan.dq]
    st, pg = fn(state, plan, g, key, lr, beta_l, damping, norm_k)
    return (st, pg) if return_pg else st


def _whiten_eq(state, plan, g, key, lr, beta_l, damping, norm_k):
    """dQ = E*Q (triangular Q, needs right triangular solves) — psgd.py:330-336."""
    kv, kd, krest = jax.random.split(key, 3)
    v = jax.random.normal(kv, g.shape, g.dtype)
    eps = jnp.finfo(real_dtype_of(g.dtype)).eps
    h = g + (damping + eps * jnp.abs(g)) * v
    return _update_eq_core(state, plan, v, h, krest, lr, beta_l, norm_k), None


def _update_eq_core(state, plan, v, h, key, lr, beta_l, norm_k):
    """Raw EQ-geometry update with a (V, Hvp) pair — psgd.py:278-319.

    conjB = V^H Q^-1 computed per-factor with the dim-rotation trick:
    after the initial [1..n-1, 0] permute, factor i's axis sits last when it
    is processed; a swap with the last axis restores natural order at the end.
    """
    q, lips = list(state.q), list(state.lips)
    order = max(plan.order, 1)

    a = jnp.einsum(plan.subs_a, *q, h)

    if plan.order == 0:
        conj_b = jnp.conj(v) / q[0]
    else:
        perm = list(range(1, plan.order)) + [0]
        conj_b = jnp.transpose(jnp.conj(v), perm) if plan.order > 1 else jnp.conj(v)
        for i, f in enumerate(q):
            if f.ndim < 2:
                conj_b = conj_b / f
            else:
                flat = conj_b.reshape(-1, f.shape[0])
                sol = jax.lax.linalg.triangular_solve(
                    lift2single(f), lift2single(flat), left_side=False, lower=False)
                conj_b = sol.astype(conj_b.dtype).reshape(conj_b.shape)
            if i < order - 1:
                conj_b = jnp.swapaxes(conj_b, i, order - 1)

    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(plan.subs_gs[i], a, jnp.conj(a))
        term2 = jnp.einsum(plan.subs_gs[i], jnp.conj(conj_b), conj_b)
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1 + term2))
            lip = _update_lips(lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * (term1 - term2) * f
        else:
            ell = norm_lower_bound_spd(term1 + term2, jax.random.fold_in(key, i), k=norm_k)
            lip = _update_lips(lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * (jnp.triu(term1 - term2) @ f)
        new_q.append(fq); new_l.append(lip)

    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(key, 101))
    return KronState(q=new_q, lips=tuple(new_l))


def _whiten_qep(state, plan, g, key, lr, beta_l, damping, norm_k):
    """dQ = Q*E*P — balancing mandatory (L not scale invariant), psgd.py:339-364."""
    q = balance_kron(state.q)
    kd, krest = jax.random.split(key)
    pg = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(g, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        qpg = jnp.einsum(plan.subs_qs[i], f, pg)
        term1 = jnp.einsum(plan.subs_gs[i], qpg, jnp.conj(qpg))
        if f.ndim < 2:
            term2 = (plan.numel / f.size) * f * jnp.conj(f)
            ell = jnp.max(jnp.real(term1 + term2))
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        else:
            term2 = (plan.numel / f.shape[0]) * (f @ jnp.conj(f.T))
            ell = norm_lower_bound_spd(term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * ((term1 - term2) @ f)
        new_q.append(fq); new_l.append(lip)
    return KronState(q=tuple(new_q), lips=tuple(new_l)), pg


def _whiten_qeq(state, plan, g, key, lr, beta_l, damping, norm_k):
    """dQ = Q*E*Q — psgd.py:367-391."""
    kd, krest = jax.random.split(key)
    q = state.q
    pg = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(g, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(plan.subs_gs[i], pg, jnp.conj(pg))
        term2 = plan.numel / (f.size if f.ndim < 2 else f.shape[0])
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1)) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        else:
            ell = norm_lower_bound_spd(term1, jax.random.fold_in(krest, i), k=norm_k) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * (f @ term1 - f * term2)
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(krest, 101))
    return KronState(q=new_q, lips=tuple(new_l)), pg


def _whiten_q05eq15(state, plan, g, key, lr, beta_l, damping, norm_k):
    """dQ = Q^0.5 * E * Q^1.5 (default; online Newton-Schulz) — psgd.py:394-419."""
    kd, krest = jax.random.split(key)
    q = state.q
    pg = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(g, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(plan.subs_gs[i], pg, jnp.conj(pg))
        term2 = plan.numel / (f.size if f.ndim < 2 else f.shape[0])
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1)) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        elif _fused_ns_enabled(f.shape[0], f.dtype):
            fq, lip = _fused_ns_step(f, term1, state.lips[i], term2,
                                     jax.random.fold_in(krest, i), lr,
                                     beta_l, norm_k)
        else:
            ell = norm_lower_bound_spd(term1, jax.random.fold_in(krest, i), k=norm_k) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * (term1 @ f - term2 * f)
            fq = procrustes_step2(fq, jax.random.fold_in(krest, i + 200), norm_k=norm_k)
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(krest, 101))
    return KronState(q=new_q, lips=tuple(new_l)), pg


def _whiten_pro4p(state, plan, g, key, lr, beta_l, damping, norm_k):
    """dP = P^0.5 * E * P: fit P directly (Q here *is* P) — psgd.py:422-452."""
    kd, krest = jax.random.split(key)
    q = state.q
    pg = jnp.einsum(plan.subs_a, *q, _damped(g, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(plan.subs_gs[i], pg, jnp.conj(pg))
        term2 = plan.numel / (f.size if f.ndim < 2 else f.shape[0])
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1)) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        else:
            ell = norm_lower_bound_spd(term1, jax.random.fold_in(krest, i), k=norm_k) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * (term1 @ f - term2 * f)
            fq = procrustes_loop3(fq, jax.random.fold_in(krest, i + 200), norm_k=norm_k)
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(krest, 101))
    return KronState(q=new_q, lips=tuple(new_l)), pg


def _whiten_quad(state, plan, g, key, lr, beta_l, damping, norm_k):
    """Quadratic form keeping Q SPD — psgd.py:455-482."""
    kd, krest = jax.random.split(key)
    q = state.q
    pg = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(g, kd, damping))
    return (_quad_core(state, plan, q, pg, krest, lr, beta_l, norm_k,
                       half_step=True), pg)


def _whiten_quad4p(state, plan, g, key, lr, beta_l, damping, norm_k):
    """QUAD on P directly — psgd.py:485-513."""
    kd, krest = jax.random.split(key)
    q = state.q
    pg = jnp.einsum(plan.subs_a, *q, _damped(g, kd, damping))
    return (_quad_core(state, plan, q, pg, krest, lr, beta_l, norm_k,
                       half_step=False), pg)


def _quad_core(state, plan, q, pg, key, lr, beta_l, norm_k, half_step: bool):
    step_div = 2.0 if half_step else 1.0
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(plan.subs_gs[i], pg, jnp.conj(pg))
        term2 = plan.numel / (f.size if f.ndim < 2 else f.shape[0])
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1)) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            gain = 1.0 - _coeff(lr / step_div, lip, f.dtype) * (term1 - term2)
            fq = f * gain * gain
        else:
            ell = norm_lower_bound_spd(term1, jax.random.fold_in(key, i), k=norm_k) + term2
            lip = _update_lips(state.lips[i], ell, beta_l)
            c = _coeff(lr / step_div, lip, f.dtype)
            p = f - c * (term1 @ f - term2 * f)
            p = p - c * (p @ term1 - term2 * p)
            fq = 0.5 * (p + jnp.conj(p.T))
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(key, 101))
    return KronState(q=new_q, lips=tuple(new_l))


_WHITEN_UPDATES = {
    DQ_EQ: _whiten_eq,
    DQ_QEP: _whiten_qep,
    DQ_QEQ: _whiten_qeq,
    DQ_Q05EQ15: _whiten_q05eq15,
    DQ_PRO4P: _whiten_pro4p,
    DQ_QUAD: _whiten_quad,
    DQ_QUAD4P: _whiten_quad4p,
}


# ---------------------------------------------------------------------------
# Newton-type updates: fit Q from a (V, Hvp) pair; term2 comes from V.
# Reference parity: update_precond_kron_newton_* (psgd.py:657-829).
# ---------------------------------------------------------------------------


def update_kron_newton(state: KronState, plan: KronPlan, v: jax.Array,
                       h: jax.Array, key: jax.Array, lr: float = 0.1,
                       beta_l: float = 0.9, damping: float = 1e-9,
                       norm_k: int = 32) -> KronState:
    fn = _NEWTON_UPDATES[plan.dq]
    return fn(state, plan, v, h, key, lr, beta_l, damping, norm_k)


def _newton_eq(state, plan, v, h, key, lr, beta_l, damping, norm_k):
    kd, krest = jax.random.split(key)
    return _update_eq_core(state, plan, v, _damped(h, kd, damping), krest,
                           lr, beta_l, norm_k)


def _newton_qep(state, plan, v, h, key, lr, beta_l, damping, norm_k):
    q = balance_kron(state.q)  # mandatory (psgd.py:672-673)
    kd, krest = jax.random.split(key)
    ph = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(h, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        qph = jnp.einsum(plan.subs_qs[i], f, ph)
        qv = jnp.einsum(plan.subs_qs[i], f, v)
        term1 = jnp.einsum(plan.subs_gs[i], qph, jnp.conj(qph))
        term2 = jnp.einsum(plan.subs_gs[i], qv, jnp.conj(qv))
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1 + term2))
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        else:
            ell = norm_lower_bound_spd(term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * ((term1 - term2) @ f)
        new_q.append(fq); new_l.append(lip)
    return KronState(q=tuple(new_q), lips=tuple(new_l))


def _newton_terms(plan, ph, v, i):
    term1 = jnp.einsum(plan.subs_gs[i], ph, jnp.conj(ph))
    term2 = jnp.einsum(plan.subs_gs[i], v, jnp.conj(v))
    return term1, term2


def _newton_qeq(state, plan, v, h, key, lr, beta_l, damping, norm_k):
    kd, krest = jax.random.split(key)
    q = state.q
    ph = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(h, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1, term2 = _newton_terms(plan, ph, v, i)
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1 + term2))
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        else:
            ell = norm_lower_bound_spd(term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * (f @ (term1 - term2))
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(krest, 101))
    return KronState(q=new_q, lips=tuple(new_l))


def _newton_q05eq15(state, plan, v, h, key, lr, beta_l, damping, norm_k):
    kd, krest = jax.random.split(key)
    q = state.q
    ph = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(h, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1, term2 = _newton_terms(plan, ph, v, i)
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1 + term2))
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        elif _fused_ns_enabled(f.shape[0], f.dtype):
            fq, lip = _fused_ns_step(f, term1 + term2, state.lips[i], 0.0,
                                     jax.random.fold_in(krest, i), lr,
                                     beta_l, norm_k, step_mat=term1 - term2)
        else:
            ell = norm_lower_bound_spd(term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * ((term1 - term2) @ f)
            fq = procrustes_step2(fq, jax.random.fold_in(krest, i + 200), norm_k=norm_k)
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(krest, 101))
    return KronState(q=new_q, lips=tuple(new_l))


def _newton_pro4p(state, plan, v, h, key, lr, beta_l, damping, norm_k):
    kd, krest = jax.random.split(key)
    q = state.q
    ph = jnp.einsum(plan.subs_a, *q, _damped(h, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1, term2 = _newton_terms(plan, ph, v, i)
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1 + term2))
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f * (1.0 - _coeff(lr, lip, f.dtype) * (term1 - term2))
        else:
            ell = norm_lower_bound_spd(term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
            lip = _update_lips(state.lips[i], ell, beta_l)
            fq = f - _coeff(lr, lip, f.dtype) * ((term1 - term2) @ f)
            fq = procrustes_loop3(fq, jax.random.fold_in(krest, i + 200), norm_k=norm_k)
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(krest, 101))
    return KronState(q=new_q, lips=tuple(new_l))


def _newton_quad_core(state, plan, v, h, key, lr, beta_l, damping, norm_k,
                      half_step: bool):
    kd, krest = jax.random.split(key)
    q = state.q
    if plan.fits_p:
        ph = jnp.einsum(plan.subs_a, *q, _damped(h, kd, damping))
    else:
        ph = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q, _damped(h, kd, damping))
    step_div = 2.0 if half_step else 1.0
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1, term2 = _newton_terms(plan, ph, v, i)
        if f.ndim < 2:
            ell = jnp.max(jnp.real(term1 + term2))
            lip = _update_lips(state.lips[i], ell, beta_l)
            gain = 1.0 - _coeff(lr / step_div, lip, f.dtype) * (term1 - term2)
            fq = f * gain * gain
        else:
            ell = norm_lower_bound_spd(term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
            lip = _update_lips(state.lips[i], ell, beta_l)
            err = _coeff(lr / step_div, lip, f.dtype) * (term1 - term2)
            p = f - err @ f
            p = p - p @ err
            fq = 0.5 * (p + jnp.conj(p.T))
        new_q.append(fq); new_l.append(lip)
    new_q = _maybe_balance(tuple(new_q), jax.random.fold_in(krest, 101))
    return KronState(q=new_q, lips=tuple(new_l))


def _newton_quad(state, plan, v, h, key, lr, beta_l, damping, norm_k):
    return _newton_quad_core(state, plan, v, h, key, lr, beta_l, damping,
                             norm_k, half_step=True)


def _newton_quad4p(state, plan, v, h, key, lr, beta_l, damping, norm_k):
    return _newton_quad_core(state, plan, v, h, key, lr, beta_l, damping,
                             norm_k, half_step=False)


_NEWTON_UPDATES = {
    DQ_EQ: _newton_eq,
    DQ_QEP: _newton_qep,
    DQ_QEQ: _newton_qeq,
    DQ_Q05EQ15: _newton_q05eq15,
    DQ_PRO4P: _newton_pro4p,
    DQ_QUAD: _newton_quad,
    DQ_QUAD4P: _newton_quad4p,
}


def update_kron_whiten_eq_exact(state: KronState, plan: KronPlan,
                                g: jax.Array, key: jax.Array, lr: float = 0.1,
                                beta_l: float = 0.9,
                                step_normalizer: str = "2nd") -> KronState:
    """EQ-geometry whitening with v analytically integrated out via EXPLICIT
    triangular inverses — the old Kron class's V=None path
    (reference preconditioned...py:2040-2070): term2_i =
    prod_{j!=i} tr(invQ_j^H invQ_j) * (invQ_i^H invQ_i).

    Fully deterministic (no probe noise; the only PRNG use is the prob-0.01
    balancing gate), at the cost of one triangular inverse per dense factor
    — a compatibility mode on TPU, like EQ itself.  The new-API whiten
    family supersedes this with the scale-free analytic term2
    (psgd.py:379-385); kept for exact old-class parity."""
    q = list(_maybe_balance(state.q, key))
    a = jnp.einsum(plan.subs_a, *q, g)

    inv_q = []
    for f in q:
        if f.ndim < 2:
            inv_q.append(1.0 / f)
        else:
            eye = jnp.eye(f.shape[0], dtype=lift2single(f).dtype)
            sol = jax.lax.linalg.triangular_solve(
                lift2single(f), eye, left_side=True, lower=False)
            inv_q.append(sol.astype(f.dtype))
    ihih = [jnp.conj(f) * f if f.ndim < 2 else jnp.conj(f.T) @ f
            for f in inv_q]
    traces = [jnp.sum(f) if f.ndim < 2 else jnp.trace(f) for f in ihih]

    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(plan.subs_gs[i], a, jnp.conj(a))
        term2 = ihih[i]
        for j, tr in enumerate(traces):
            if j != i:
                term2 = term2 * tr
        if f.ndim < 2:
            if step_normalizer == "2nd":
                ell = jnp.max(jnp.abs(term1 + term2))
                lip = _update_lips(state.lips[i], ell, beta_l)
                fq = f - _coeff(lr, lip, f.dtype) * (term1 - term2) * f
            else:
                grad = term1 - term2
                lip = state.lips[i]
                den = jnp.max(jnp.abs(grad)).astype(real_dtype_of(f.dtype))
                fq = f - (lr / (den + 1e-38)).astype(
                    real_dtype_of(f.dtype)) * grad * f
        else:
            from ..ops.linalg import norm_lower_bound
            if step_normalizer == "2nd":
                ell = norm_lower_bound(term1 + term2)
                lip = _update_lips(state.lips[i], ell, beta_l)
                fq = f - _coeff(lr, lip, f.dtype) * (
                    jnp.triu(term1 - term2) @ f)
            else:
                grad = jnp.triu(term1 - term2)
                lip = state.lips[i]
                den = norm_lower_bound(grad).astype(real_dtype_of(f.dtype))
                fq = f - (lr / (den + 1e-38)).astype(
                    real_dtype_of(f.dtype)) * (grad @ f)
        new_q.append(fq)
        new_l.append(lip)
    return KronState(q=tuple(new_q), lips=tuple(new_l))


# ---------------------------------------------------------------------------
# Stacked (layer-batched) updates.
#
# A lax.scan-over-layers model stores each block leaf as a (n_layer, ...)
# stack; vmapping the per-tensor update over the stack is mathematically
# right but lowers the Pallas NS kernel to a SERIAL while loop of n_layer
# single-factor launches (measured ~26 us each on GPT-2 124M), and vmapped
# PRNG draws stay on the slow threefry path.  These stacked variants batch
# the whole leaf: batched einsums for Pg/term1, ONE fused-kernel launch per
# dense factor (grid = n_layer), and per-layer-seeded hardware-PRNG noise.
# Layer i's result depends only on state[i], g[i], keys[i] — identical math
# to vmap, and shard-composition independent (stack_sharding parity).
# ---------------------------------------------------------------------------


def _batched_subs(subs: str) -> str:
    """Prefix a batch symbol to every einsum term."""
    z = _sym(100)
    lhs, rhs = subs.split("->")
    return ",".join(z + t for t in lhs.split(",")) + "->" + z + rhs


def _fused_ns_stacked(f, term1, lips, term2_vec, keys, lr, beta_l, norm_k,
                      step_mat=None):
    """Batched fused NS update: one kernel launch for the whole stack."""
    from ..ops.pallas_kernels import fused_ns_update, key_seed_words
    seeds = key_seed_words(keys)
    fq, new_l = fused_ns_update(term1, f, lips.astype(jnp.float32),
                                term2_vec.astype(jnp.float32), seeds, lr,
                                beta_l, k=norm_k, step_mat=step_mat)
    return fq, new_l.astype(lips.dtype)


def _ns_tail_stacked_xla(f, term1, lips, term2_vec, keys_bound, keys_proc,
                         lr, beta_l, norm_k, step_mat=None):
    """XLA fallback for the stacked dense-factor NS tail (vmapped); key
    streams match the per-tensor update exactly."""
    def one(f_i, t1_i, lip_i, t2_i, kb_i, kp_i, sm_i):
        ell = norm_lower_bound_spd(t1_i, kb_i, k=norm_k) + t2_i.astype(
            real_dtype_of(t1_i.dtype))
        lip = _update_lips(lip_i, ell, beta_l)
        sm = t1_i if sm_i is None else sm_i
        fq = f_i - _coeff(lr, lip, f_i.dtype) * (
            sm @ f_i - t2_i.astype(real_dtype_of(f_i.dtype)) * f_i)
        fq = procrustes_step2(fq, kp_i, norm_k=norm_k)
        return fq, lip

    if step_mat is None:
        return jax.vmap(lambda a, b, c, d, e, g: one(a, b, c, d, e, g, None))(
            f, term1, lips, term2_vec, keys_bound, keys_proc)
    return jax.vmap(one)(f, term1, lips, term2_vec, keys_bound, keys_proc,
                         step_mat)


def update_kron_whiten_stacked(state: KronState, plan: KronPlan, g: jax.Array,
                               keys: jax.Array, lr: float = 0.1,
                               beta_l: float = 0.9, damping: float = 1e-9,
                               norm_k: int = 32,
                               return_pg: bool = False) -> KronState:
    """Whitening update for a layer-stacked leaf.

    ``state`` leaves and ``g`` carry a leading layer axis; ``keys`` is (B,).
    Specialized fast path for the default Q0.5EQ1.5 geometry; other dQ vmap
    the per-tensor update (correct, just not launch-batched).
    ``return_pg``: see update_kron_whiten."""
    if plan.dq != DQ_Q05EQ15 or plan.order == 0:
        fn = lambda s, gg, kk: update_kron_whiten(
            s, plan, gg, kk, lr, beta_l, damping, norm_k, return_pg=return_pg)
        return jax.vmap(fn)(state, g, keys)

    b = g.shape[0]
    ks = jax.vmap(jax.random.split)(keys)
    kd, krest = ks[:, 0], ks[:, 1]
    q = state.q
    pg = jnp.einsum(_batched_subs(plan.subs_p),
                    *[jnp.conj(f) for f in q], *q,
                    _damped_stacked(g, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(_batched_subs(plan.subs_gs[i]), pg, jnp.conj(pg))
        term2 = plan.numel / plan.shape[i]
        keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i))(krest)
        if plan.is_diag[i]:
            ell = jnp.max(jnp.real(term1), axis=1) + term2
            lip = jax.vmap(lambda l, e: _update_lips(l, e, beta_l))(
                state.lips[i], ell)
            coeff = (lr / lip).astype(real_dtype_of(f.dtype))[:, None]
            fq = f * (1.0 - coeff * (term1 - term2))
        else:
            t2v = jnp.full((b,), term2, jnp.float32)
            if _fused_ns_enabled(f.shape[-1], f.dtype):
                fq, lip = _fused_ns_stacked(f, term1, state.lips[i], t2v,
                                            keys_i, lr, beta_l, norm_k)
            else:
                keys_p = jax.vmap(
                    lambda k: jax.random.fold_in(k, i + 200))(krest)
                fq, lip = _ns_tail_stacked_xla(f, term1, state.lips[i], t2v,
                                               keys_i, keys_p, lr, beta_l,
                                               norm_k)
        new_q.append(fq)
        new_l.append(lip)
    kb = jax.vmap(lambda k: jax.random.fold_in(k, 101))(krest)
    new_q = jax.vmap(_maybe_balance)(tuple(new_q), kb)
    st_new = KronState(q=new_q, lips=tuple(new_l))
    return (st_new, pg) if return_pg else st_new


# ---------------------------------------------------------------------------
# Dim-sharded update: one GLOBAL Kron preconditioner for a leaf whose dims
# are sharded over mesh axes (embeddings under fsdp/tp), computed with
# local contractions + small collectives inside shard_map.
#
# SURVEY.md §7 "Sharded factor updates": term1 = exprGs[i](Pg, Pg*) is a
# contraction over all dims but i —
#   * dims sharded on j != i: local contraction + psum of the (n_i, n_i)
#     result (1.2 MB for a 768 factor, vs GSPMD's ~50% redundant compute);
#   * a DENSE dim sharded on its own axis: all-gather the leaf slab along
#     that dim first (diag-sharded dims, the big embedding dims, never
#     gather).
# Dense factors stay replicated (identical collectived inputs + identical
# PRNG keys on every device -> bitwise-identical Q, zero broadcasts); diag
# factors live sharded along their dim.  Math identical to the replicated
# update; communication: the dense-dim all-gathers + one psum per dense
# factor (+ pmax scalars).
# ---------------------------------------------------------------------------


def _linear_axis_index(axes):
    idx = jnp.zeros((), jnp.int32)
    for ax in axes:
        idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return idx


def dim_shard_reshard_plan(plan: KronPlan, dim_axes, axis_sizes):
    """Compute layout for the dim-sharded update: every mesh axis that
    shards a DENSE dim is moved onto the largest divisible diag dim (via
    all_to_all inside the update) so the O(numel x n) contractions scale by
    the FULL shard count; axes with no divisible diag target fall back to
    an all-gather of their dim.

    Args:
      dim_axes: per-dim tuple of mesh axis names sharding the leaf.
      axis_sizes: mapping axis name -> mesh size.
    Returns (eff_axes, moves, gather_dims):
      eff_axes: per-dim axes in the compute layout (diag dims may gain
        moved axes, appended minor to their own);
      moves: ordered (dense_dim, axis, target_diag_dim) all_to_all steps;
      gather_dims: dense dims to all-gather instead.
    """
    eff = [tuple(a) for a in dim_axes]
    local = [plan.shape[d] for d in range(len(plan.shape))]
    for d, axes in enumerate(dim_axes):
        for ax in axes:
            local[d] //= axis_sizes[ax]
    moves, gather_set = [], set()
    for d in range(len(plan.shape)):
        if plan.is_diag[d] or not dim_axes[d]:
            continue
        dim_moves = []
        ok = True
        # minor axis first: executing the all_to_alls in list order then
        # reassembles dim d in global order, and eff[t]'s append order
        # matches the resulting ownership decomposition of t
        for ax in reversed(dim_axes[d]):
            k = axis_sizes[ax]
            # largest diag dim whose current local size divides by k
            targets = sorted(
                (t for t in range(len(plan.shape))
                 if plan.is_diag[t] and local[t] % k == 0),
                key=lambda t: -local[t])
            if not targets:
                ok = False
                break
            t = targets[0]
            dim_moves.append((d, ax, t))
            local[t] //= k
            eff[t] = tuple(eff[t]) + (ax,)
        if ok:
            moves.extend(dim_moves)
            eff[d] = ()
        else:
            for (_, ax, t) in dim_moves:  # undo partial placement
                local[t] *= axis_sizes[ax]
                eff[t] = tuple(eff[t][:-1])
            gather_set.add(d)
    return tuple(eff), moves, tuple(sorted(gather_set))


def update_kron_whiten_dim_sharded(
        state: KronState, plan: KronPlan, g: jax.Array, key: jax.Array,
        dim_axes, reshard_plan, apply_src: jax.Array, do_update,
        lr: float = 0.1, beta_l: float = 0.9, damping: float = 1e-9,
        norm_k: int = 32, fit_first: bool = True, share: bool = False,
        pcache=None, always_fit: bool = False,
        always_select: bool = False):
    """Whiten-fit + apply for a dim-sharded leaf, executed INSIDE shard_map.

    Args:
      state: dense factors full (replicated), diag factors local slices in
        the COMPUTE layout (sharded by reshard_plan's eff axes).
      g / apply_src: local blocks in the leaf's own sharding.
      dim_axes: per-plan-dim tuple of mesh axis names ((), single or multi).
      reshard_plan: (eff_axes, moves, gather_dims) from
        dim_shard_reshard_plan — mesh axes on dense dims are moved onto a
        diag dim via all_to_all so every contraction scales by the full
        shard count (an all-gather fallback covers non-divisible cases).
      do_update: traced bool (update-probability gate).
      share: reuse the fit's internal P(g + damping*v) as the apply on fit
        steps (requires g and apply_src to be the same source and
        fit_first=False; see scale_by_kron_whiten(share_fit_apply=True)).
      pcache: optional cached per-factor P_i in the COMPUTE layout (dense
        replicated, diag local like state.q) — see compute_p_factors.
        When given, non-fit applies run through it (one factor pass, zero
        extra collectives: the refresh after a fit is factor-local) and the
        return gains the refreshed cache.
    Returns (new_state_local, preconditioned_apply_src_local), with the
    refreshed pcache inserted second when ``pcache`` is given.
    """
    return _update_kron_dim_sharded(
        state, plan, g, key, dim_axes, reshard_plan, apply_src, do_update,
        "whiten", lr, beta_l, damping, norm_k, fit_first, share, pcache,
        always_fit=always_fit, always_select=always_select)


def update_kron_newton_dim_sharded(
        state: KronState, plan: KronPlan, v: jax.Array, h: jax.Array,
        key: jax.Array, dim_axes, reshard_plan, apply_src: jax.Array,
        do_update, lr: float = 0.1, beta_l: float = 0.9,
        damping: float = 1e-9, norm_k: int = 32, fit_first: bool = True,
        pcache=None, always_fit: bool = False):
    """Newton-mode dim-sharded fit + apply: same collective structure as the
    whiten variant, with term2 the (v v^H) contraction psum'd like term1
    (reference update_precond_kron_newton_q0p5eq1p5, psgd.py:594-616).
    ``pcache``: see update_kron_whiten_dim_sharded."""
    return _update_kron_dim_sharded(
        state, plan, (v, h), key, dim_axes, reshard_plan, apply_src,
        do_update, "newton", lr, beta_l, damping, norm_k, fit_first,
        pcache=pcache, always_fit=always_fit)


def _update_kron_dim_sharded(
        state, plan, fit_src, key, dim_axes, reshard_plan, apply_src,
        do_update, mode, lr, beta_l, damping, norm_k, fit_first,
        share: bool = False, pcache=None, always_fit: bool = False,
        always_select: bool = False):
    if plan.dq not in DIM_SHARDABLE_DQS:
        raise NotImplementedError(
            "dim-sharded update supports Q0.5EQ1.5, QUAD and QEQ")
    eff_axes, moves, gather_dims = reshard_plan

    def to_compute(x):
        for d in gather_dims:
            for ax in reversed(dim_axes[d]):
                x = jax.lax.all_gather(x, ax, axis=d, tiled=True)
        for (d, ax, t) in moves:
            x = jax.lax.all_to_all(x, ax, split_axis=t, concat_axis=d,
                                   tiled=True)
        return x

    # fit sources are resharded lazily INSIDE the gated fit below: at the
    # production operating point (update probability annealed to ~0.01)
    # off-steps must not pay the full-leaf all_gather/all_to_all traffic
    apply_src = to_compute(apply_src)
    diag_axes = [eff_axes[d] if plan.is_diag[d] else ()
                 for d in range(len(plan.shape))]

    # noise key: folded with the shard position along still-sharded (diag)
    # dims — each shard draws its own rows' noise; gate/bound/Procrustes
    # keys stay UNFOLDED so replicated decisions are bitwise identical.
    k_noise = key
    for axes in diag_axes:
        if axes:
            k_noise = jax.random.fold_in(k_noise, _linear_axis_index(axes))
    kd = jax.random.split(k_noise)[0]
    krest = jax.random.split(key)[1]

    def fit_core(st):
        q = st.q
        if mode == "newton":
            v, h = fit_src
            v = to_compute(v)
            h = to_compute(h)
            pg = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q,
                            _damped(h, kd, damping))
        else:
            g = to_compute(fit_src)
            pg = jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in q], *q,
                            _damped(g, kd, damping))
        new_q, new_l = [], []
        for i, f in enumerate(q):
            term1 = jnp.einsum(plan.subs_gs[i], pg, jnp.conj(pg))
            red = tuple(ax for d, axes in enumerate(diag_axes) if d != i
                        for ax in axes)
            if red:
                term1 = jax.lax.psum(term1, red)
            if mode == "newton":
                term2 = jnp.einsum(plan.subs_gs[i], v, jnp.conj(v))
                if red:
                    term2 = jax.lax.psum(term2, red)
            else:
                term2 = plan.numel / plan.shape[i]
            quad = plan.dq == DQ_QUAD
            qeq = plan.dq == DQ_QEQ
            lr_eff = lr / 2.0 if quad else lr
            if plan.is_diag[i]:
                ell = jnp.max(jnp.real(term1 + term2))
                if diag_axes[i]:
                    ell = jax.lax.pmax(ell, diag_axes[i])
                lip = _update_lips(st.lips[i], ell, beta_l)
                gain = 1.0 - _coeff(lr_eff, lip, f.dtype) * (term1 - term2)
                fq = f * gain * gain if quad else f * gain
            elif quad:
                # SPD Q, two-sided quadratic step + symmetrize
                # (_quad_core / _newton_quad_core under the psum'd terms)
                if mode == "newton":
                    ell = norm_lower_bound_spd(
                        term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
                    lip = _update_lips(st.lips[i], ell, beta_l)
                    err = _coeff(lr_eff, lip, f.dtype) * (term1 - term2)
                    p = f - err @ f
                    p = p - p @ err
                else:
                    ell = norm_lower_bound_spd(
                        term1, jax.random.fold_in(krest, i), k=norm_k) + term2
                    lip = _update_lips(st.lips[i], ell, beta_l)
                    c = _coeff(lr_eff, lip, f.dtype)
                    p = f - c * (term1 @ f - term2 * f)
                    p = p - c * (p @ term1 - term2 * p)
                fq = 0.5 * (p + jnp.conj(p.T))
            elif qeq:
                # dQ = Q*E*Q: left-multiplied step, no Procrustes retraction
                # (_whiten_qeq / _newton_qeq under the psum'd terms)
                if mode == "newton":
                    ell = norm_lower_bound_spd(
                        term1 + term2, jax.random.fold_in(krest, i), k=norm_k)
                    lip = _update_lips(st.lips[i], ell, beta_l)
                    fq = f - _coeff(lr, lip, f.dtype) * (f @ (term1 - term2))
                else:
                    ell = norm_lower_bound_spd(
                        term1, jax.random.fold_in(krest, i), k=norm_k) + term2
                    lip = _update_lips(st.lips[i], ell, beta_l)
                    fq = f - _coeff(lr, lip, f.dtype) * (f @ term1 - term2 * f)
            elif mode == "newton":
                if _fused_ns_enabled(f.shape[0], f.dtype):
                    fq, lip = _fused_ns_step(
                        f, term1 + term2, st.lips[i], 0.0,
                        jax.random.fold_in(krest, i), lr, beta_l, norm_k,
                        step_mat=term1 - term2)
                else:
                    ell = norm_lower_bound_spd(
                        term1 + term2, jax.random.fold_in(krest, i),
                        k=norm_k)
                    lip = _update_lips(st.lips[i], ell, beta_l)
                    fq = f - _coeff(lr, lip, f.dtype) * ((term1 - term2) @ f)
                    fq = procrustes_step2(
                        fq, jax.random.fold_in(krest, i + 200), norm_k=norm_k)
            elif _fused_ns_enabled(f.shape[0], f.dtype):
                fq, lip = _fused_ns_step(f, term1, st.lips[i], term2,
                                         jax.random.fold_in(krest, i), lr,
                                         beta_l, norm_k)
            else:
                ell = norm_lower_bound_spd(
                    term1, jax.random.fold_in(krest, i), k=norm_k) + term2
                lip = _update_lips(st.lips[i], ell, beta_l)
                fq = f - _coeff(lr, lip, f.dtype) * (term1 @ f - term2 * f)
                fq = procrustes_step2(fq, jax.random.fold_in(krest, i + 200),
                                      norm_k=norm_k)
            new_q.append(fq)
            new_l.append(lip)

        # balancing: diag factors' max-abs needs a pmax along their dim
        def balance(qt):
            acc = lifted_real_dtype(qt[0].dtype)
            norms = []
            for i, f in enumerate(qt):
                m = jnp.max(jnp.abs(f)).astype(acc)
                if plan.is_diag[i] and diag_axes[i]:
                    m = jax.lax.pmax(m, diag_axes[i])
                norms.append(m)
            gmean = jnp.prod(jnp.stack(norms)) ** (1.0 / len(qt))
            return tuple(f * (gmean / n).astype(real_dtype_of(f.dtype))
                         for f, n in zip(qt, norms))

        if len(new_q) > 1:
            u = jax.random.uniform(jax.random.fold_in(krest, 101))
            new_q = jax.lax.cond(u < 0.01, balance, lambda t: t,
                                 tuple(new_q))
        return KronState(q=tuple(new_q), lips=tuple(new_l)), pg

    def _apply(st, pc=None):
        if pc is not None:
            # cached P_i: one factor pass; the cache lives in the compute
            # layout (dense replicated, diag local) so this is collective-
            # free just like the Q-based apply
            return jnp.einsum(plan.subs_a, *pc, apply_src)
        return jnp.einsum(plan.subs_p, *[jnp.conj(f) for f in st.q],
                          *st.q, apply_src)

    cached = pcache is not None
    pc_new = None

    def _sel(a, b):
        # always_fit with a residual dynamic gate (pipelined_fit's count>0):
        # fit unconditionally, discard by select — cond-free, schedulable
        if not always_select:
            return a
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(do_update, x, y), a, b)

    if share and mode == "whiten":
        # fit and apply sources coincide (validated by the transform, which
        # also forces fit_first=False): the fit's P(src + damping*v) — in
        # the compute layout, pre-update Q — IS the apply product, so fit
        # steps skip the separate exprP chain.
        if always_fit:  # share excludes pipelined: gate statically true
            st_new, pg_out = fit_core(state)
            if cached:
                pc_new = compute_p_factors(st_new, plan)
        elif cached:
            def fit_branch(s):
                ns, pg = fit_core(s)
                return ns, compute_p_factors(ns, plan), pg
            st_new, pc_new, pg_out = jax.lax.cond(
                do_update, fit_branch,
                lambda s: (s, pcache, _apply(s, pcache)), state)
        else:
            st_new, pg_out = jax.lax.cond(
                do_update, fit_core, lambda s: (s, _apply(s)), state)
    elif cached:
        # refresh the cache (factor-local: dense q^H q, diag |q|^2) inside
        # the gated fit; apply through the cache either way
        if always_fit:
            fitted = fit_core(state)[0]
            st_new = _sel(fitted, state)
            pc_new = _sel(compute_p_factors(fitted, plan), pcache)
        else:
            st_new, pc_new = jax.lax.cond(
                do_update,
                lambda s: (lambda ns: (ns, compute_p_factors(ns, plan)))(
                    fit_core(s)[0]),
                lambda s: (s, pcache), state)
        pg_out = _apply(None, pc_new if fit_first else pcache)
    else:
        # drop the fit's internal pg inside the branch (DCE'd by XLA)
        if always_fit:
            st_new = _sel(fit_core(state)[0], state)
        else:
            st_new = jax.lax.cond(do_update, lambda s: fit_core(s)[0],
                                  lambda s: s, state)
        st_used = st_new if fit_first else state
        pg_out = _apply(st_used)

    # back to the leaf's own sharding: inverse all_to_alls, then slice the
    # gathered dims to this device's block
    for (d, ax, t) in reversed(moves):
        pg_out = jax.lax.all_to_all(pg_out, ax, split_axis=d, concat_axis=t,
                                    tiled=True)
    for d in gather_dims:
        k = 1
        for ax in dim_axes[d]:
            k *= jax.lax.axis_size(ax)
        loc = plan.shape[d] // k
        pg_out = jax.lax.dynamic_slice_in_dim(
            pg_out, _linear_axis_index(dim_axes[d]) * loc, loc, axis=d)
    return (st_new, pc_new, pg_out) if cached else (st_new, pg_out)


def update_kron_newton_stacked(state: KronState, plan: KronPlan, v: jax.Array,
                               h: jax.Array, keys: jax.Array, lr: float = 0.1,
                               beta_l: float = 0.9, damping: float = 1e-9,
                               norm_k: int = 32) -> KronState:
    """Newton-type update for a layer-stacked leaf (see whiten variant)."""
    if plan.dq != DQ_Q05EQ15 or plan.order == 0:
        fn = lambda s, vv, hh, kk: update_kron_newton(
            s, plan, vv, hh, kk, lr, beta_l, damping, norm_k)
        return jax.vmap(fn)(state, v, h, keys)

    b = v.shape[0]
    ks = jax.vmap(jax.random.split)(keys)
    kd, krest = ks[:, 0], ks[:, 1]
    q = state.q
    ph = jnp.einsum(_batched_subs(plan.subs_p),
                    *[jnp.conj(f) for f in q], *q,
                    _damped_stacked(h, kd, damping))
    new_q, new_l = [], []
    for i, f in enumerate(q):
        term1 = jnp.einsum(_batched_subs(plan.subs_gs[i]), ph, jnp.conj(ph))
        term2 = jnp.einsum(_batched_subs(plan.subs_gs[i]), v, jnp.conj(v))
        keys_i = jax.vmap(lambda k: jax.random.fold_in(k, i))(krest)
        if plan.is_diag[i]:
            ell = jnp.max(jnp.real(term1 + term2), axis=1)
            lip = jax.vmap(lambda l, e: _update_lips(l, e, beta_l))(
                state.lips[i], ell)
            coeff = (lr / lip).astype(real_dtype_of(f.dtype))[:, None]
            fq = f * (1.0 - coeff * (term1 - term2))
        else:
            t2v = jnp.zeros((b,), jnp.float32)
            if _fused_ns_enabled(f.shape[-1], f.dtype):
                fq, lip = _fused_ns_stacked(f, term1 + term2, state.lips[i],
                                            t2v, keys_i, lr, beta_l, norm_k,
                                            step_mat=term1 - term2)
            else:
                keys_p = jax.vmap(
                    lambda k: jax.random.fold_in(k, i + 200))(krest)
                fq, lip = _ns_tail_stacked_xla(f, term1 + term2,
                                               state.lips[i], t2v, keys_i,
                                               keys_p, lr, beta_l, norm_k,
                                               step_mat=term1 - term2)
        new_q.append(fq)
        new_l.append(lip)
    kb = jax.vmap(lambda k: jax.random.fold_in(k, 101))(krest)
    new_q = jax.vmap(_maybe_balance)(tuple(new_q), kb)
    return KronState(q=new_q, lips=tuple(new_l))
