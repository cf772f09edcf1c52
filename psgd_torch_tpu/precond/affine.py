"""Affine-group preconditioner Q = kron(conj(Q2), Q1) per matrix parameter.

Functional JAX re-design of the reference Affine family
(/root/reference/preconditioned_stochastic_gradient_descent.py:1404-1899):

  * ``matrixizer``   — tensor <-> matrix adapters searching dim permutations
    that minimize prod(s[:i])^2 + prod(s[i:])^2 (reference :1414-1472); here
    it returns a static plan (permutation + matrix shape) instead of
    closures, so it composes with jit.
  * ``init_affine``  — triangular-or-diagonal side selection by
    max_size / max_skew (reference initQ, :1475-1494).
  * ``update_affine``       — the (v, h)/(dX, dG) update for all four
    dense/diagonal side combinations, with '1st' or '2nd' step normalizers
    and complex support (reference :1507-1610).
  * ``update_affine_dropv`` — gradient-whitening update with the dummy
    variable v analytically integrated out where that is cheaper
    (diag/diag, diag/dense-tall, dense/diag-short), else the with-v path
    (reference :1614-1700).
  * ``precond_grad_affine`` — apply P (reference :1704-1720).

Deprecated upstream in favor of Kron (reference prints a deprecation at
:1805) but kept for full capability parity.  The EQ-style triangular solves
are lifted to float32.
"""

from __future__ import annotations

import itertools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.linalg import lift2single, lifted_real_dtype, norm_lower_bound, real_dtype_of


class MatrixPlan(NamedTuple):
    """Static tensor<->matrix conversion plan (hashable)."""
    perm: Tuple[int, ...]       # permutation applied before reshape
    inv_perm: Tuple[int, ...]
    tensor_shape: Tuple[int, ...]
    permuted_shape: Tuple[int, ...]
    matrix_shape: Tuple[int, int]


def matrixizer(shape) -> MatrixPlan:
    """Find the dim permutation + split minimizing the preconditioner size
    prod(s[:i])^2 + prod(s[i:])^2 (reference :1414-1472)."""
    shape = tuple(int(s) for s in shape)
    if len(shape) == 2:
        return MatrixPlan((0, 1), (0, 1), shape, shape, shape)
    if len(shape) < 2:
        n = int(math.prod(shape)) if shape else 1
        p = tuple(range(len(shape)))
        return MatrixPlan(p, p, shape, shape, (1, n))
    best = None
    for p in itertools.permutations(range(len(shape))):
        s = tuple(shape[j] for j in p)
        for i in range(1, len(p)):
            size = math.prod(s[:i]) ** 2 + math.prod(s[i:]) ** 2
            if best is None or size < best[0]:
                best = (size, p, s, i)
    _, p, s, i = best
    inv = tuple(k for k, _ in sorted(enumerate(p), key=lambda t: t[1]))
    return MatrixPlan(p, inv, shape, s,
                      (math.prod(s[:i]), math.prod(s[i:])))


def to_matrix(plan: MatrixPlan, t: jax.Array) -> jax.Array:
    if len(plan.tensor_shape) == 2:
        return t
    return jnp.transpose(t, plan.perm).reshape(plan.matrix_shape)


def from_matrix(plan: MatrixPlan, m: jax.Array) -> jax.Array:
    if len(plan.tensor_shape) == 2:
        return m
    return jnp.transpose(m.reshape(plan.permuted_shape), plan.inv_perm)


class AffineState(NamedTuple):
    ql: jax.Array   # (m, m) triangular or (m,) diagonal
    qr: jax.Array   # (n, n) triangular or (n,) diagonal


def init_affine(matrix_shape: Tuple[int, int], scale: float = 1.0,
                max_size: float = float("inf"), max_skew: float = float("inf"),
                dtype=jnp.float32) -> AffineState:
    """Q1/Q2 = sqrt(scale) * I, each diagonal when size < 2, > max_size, or
    > max_skew * (other side) (reference initQ, :1475-1494)."""
    s1, s2 = matrix_shape
    root = scale ** 0.5

    def side(s, other):
        if s < 2 or s > max_size or s > max_skew * other:
            return root * jnp.ones((s,), dtype)
        return root * jnp.eye(s, dtype=dtype)

    return AffineState(ql=side(s1, s2), qr=side(s2, s1))


def _tri_solve_left(a, b):
    """inv(A^H) B with A upper triangular (lifted to fp32)."""
    sol = jax.lax.linalg.triangular_solve(
        lift2single(jnp.conj(a.T)), lift2single(b), left_side=True, lower=True)
    return sol.astype(b.dtype)


def _tri_solve_right(a, b):
    """B inv(A) with A upper triangular (lifted to fp32)."""
    sol = jax.lax.linalg.triangular_solve(
        lift2single(a), lift2single(b), left_side=False, lower=False)
    return sol.astype(b.dtype)


def _maybe_balance_affine(ql, qr, key, prob=0.01):
    def bal(ops):
        ql, qr = ops
        acc = lifted_real_dtype(ql.dtype)
        ml = jnp.max(jnp.abs(ql)).astype(acc)
        mr = jnp.max(jnp.abs(qr)).astype(acc)
        rho = jnp.sqrt(ml / mr)
        return (ql / rho.astype(real_dtype_of(ql.dtype)),
                qr * rho.astype(real_dtype_of(qr.dtype)))

    u = jax.random.uniform(key)
    return jax.lax.cond(u < prob, bal, lambda o: o, (ql, qr))


def update_affine(state: AffineState, dx: jax.Array, dg: jax.Array,
                  key: jax.Array, lr: float = 0.01,
                  step_normalizer: str = "2nd",
                  tiny: float = 1.2e-38) -> AffineState:
    """One affine update with a (dX, dG) = (v, Hvp) or (randn, grad) pair.

    Reference parity: update_precond_affine_math_ (:1507-1610), all four
    side combinations, both step normalizers, complex-safe."""
    ql, qr = _maybe_balance_affine(state.ql, state.qr, key)
    l_dense, r_dense = ql.ndim == 2, qr.ndim == 2
    rdt = real_dtype_of(ql.dtype)

    def nb(x):
        return norm_lower_bound(x).astype(rdt)

    if l_dense and r_dense:
        a = ql @ dg @ jnp.conj(qr.T)
        bh = _tri_solve_left(ql, _tri_solve_right(qr, dx))
        aha, bhb = jnp.conj(a.T) @ a, bh @ jnp.conj(bh.T)
        aah, bbh = a @ jnp.conj(a.T), jnp.conj(bh.T) @ bh
        grad1 = jnp.triu(aah - bhb)
        grad2 = jnp.triu(aha - bbh)
        if step_normalizer == "2nd":
            s1 = lr / (nb(aah + bhb) + tiny)
            s2 = lr / (nb(aha + bbh) + tiny)
        else:
            s1 = lr / (nb(grad1) + tiny)
            s2 = lr / (nb(grad2) + tiny)
        return AffineState(ql - s1 * (grad1 @ ql), qr - s2 * (grad2 @ qr))

    if l_dense and not r_dense:
        a = ql @ (dg * jnp.conj(qr))
        bh = _tri_solve_left(ql, dx / qr)
        aah, bhb = a @ jnp.conj(a.T), bh @ jnp.conj(bh.T)
        aac = jnp.sum(a * jnp.conj(a), axis=0)
        bbc = jnp.sum(bh * jnp.conj(bh), axis=0)
        grad1 = jnp.triu(aah - bhb)
        grad2 = aac - bbc
        if step_normalizer == "2nd":
            s1 = lr / (nb(aah + bhb) + tiny)
            s2 = lr / (jnp.max(jnp.real(aac + bbc)).astype(rdt) + tiny)
        else:
            s1 = lr / (nb(grad1) + tiny)
            s2 = lr / (jnp.max(jnp.abs(grad2)).astype(rdt) + tiny)
        return AffineState(ql - s1 * (grad1 @ ql), qr - s2 * grad2 * qr)

    if not l_dense and r_dense:
        a = (ql[:, None] * dg) @ jnp.conj(qr.T)
        bh = _tri_solve_right(qr, dx) / jnp.conj(ql)[:, None]
        aac = jnp.sum(a * jnp.conj(a), axis=1)
        bbc = jnp.sum(bh * jnp.conj(bh), axis=1)
        aha, bbh = jnp.conj(a.T) @ a, jnp.conj(bh.T) @ bh
        grad1 = aac - bbc
        grad2 = jnp.triu(aha - bbh)
        if step_normalizer == "2nd":
            s1 = lr / (jnp.max(jnp.real(aac + bbc)).astype(rdt) + tiny)
            s2 = lr / (nb(aha + bbh) + tiny)
        else:
            s1 = lr / (jnp.max(jnp.abs(grad1)).astype(rdt) + tiny)
            s2 = lr / (nb(grad2) + tiny)
        return AffineState(ql - s1 * grad1 * ql, qr - s2 * (grad2 @ qr))

    # both diagonal
    a = ql[:, None] * dg * jnp.conj(qr)
    bh = dx / qr / jnp.conj(ql)[:, None]
    aac1 = jnp.sum(a * jnp.conj(a), axis=1)
    bbc1 = jnp.sum(bh * jnp.conj(bh), axis=1)
    aac2 = jnp.sum(a * jnp.conj(a), axis=0)
    bbc2 = jnp.sum(bh * jnp.conj(bh), axis=0)
    grad1 = aac1 - bbc1
    grad2 = aac2 - bbc2
    if step_normalizer == "2nd":
        s1 = lr / (jnp.max(jnp.real(aac1 + bbc1)).astype(rdt) + tiny)
        s2 = lr / (jnp.max(jnp.real(aac2 + bbc2)).astype(rdt) + tiny)
    else:
        s1 = lr / (jnp.max(jnp.abs(grad1)).astype(rdt) + tiny)
        s2 = lr / (jnp.max(jnp.abs(grad2)).astype(rdt) + tiny)
    return AffineState(ql - s1 * grad1 * ql, qr - s2 * grad2 * qr)


def update_affine_dropv(state: AffineState, dg: jax.Array, key: jax.Array,
                        lr: float = 0.01, step_normalizer: str = "2nd",
                        tiny: float = 1.2e-38) -> AffineState:
    """Whitening update with v integrated out where cheap (reference
    :1614-1700); falls back to the with-v path otherwise."""
    ql, qr = state.ql, state.qr
    kb, kv = jax.random.split(key)
    l_dense, r_dense = ql.ndim == 2, qr.ndim == 2
    rdt = real_dtype_of(ql.dtype)
    m = dg.shape[0] if ql.ndim else 1
    n = dg.shape[1] if qr.ndim else 1

    def nb(x):
        return norm_lower_bound(x).astype(rdt)

    if not l_dense and not r_dense:
        a = ql[:, None] * dg * jnp.conj(qr)
        inv_qql = 1.0 / (ql * jnp.conj(ql))
        inv_qqr = 1.0 / (qr * jnp.conj(qr))
        aac1 = jnp.sum(a * jnp.conj(a), axis=1)
        bbc1 = jnp.sum(inv_qqr) * inv_qql
        aac2 = jnp.sum(a * jnp.conj(a), axis=0)
        bbc2 = jnp.sum(inv_qql) * inv_qqr
        grad1, grad2 = aac1 - bbc1, aac2 - bbc2
        if step_normalizer == "2nd":
            s1 = lr / (jnp.max(jnp.real(aac1 + bbc1)).astype(rdt) + tiny)
            s2 = lr / (jnp.max(jnp.real(aac2 + bbc2)).astype(rdt) + tiny)
        else:
            s1 = lr / (jnp.max(jnp.abs(grad1)).astype(rdt) + tiny)
            s2 = lr / (jnp.max(jnp.abs(grad2)).astype(rdt) + tiny)
        ql, qr = ql - s1 * grad1 * ql, qr - s2 * grad2 * qr
        return AffineState(*_maybe_balance_affine(ql, qr, kb))

    if not l_dense and r_dense and ql.shape[0] >= qr.shape[0]:
        a = (ql[:, None] * dg) @ jnp.conj(qr.T)
        inv_qql = 1.0 / (ql * jnp.conj(ql))
        eye = jnp.eye(qr.shape[0], dtype=qr.dtype)
        inv_qr = _tri_solve_right(qr, eye)
        inv_qqr = jnp.conj(inv_qr.T) @ inv_qr
        aac = jnp.sum(a * jnp.conj(a), axis=1)
        bbc = jnp.real(jnp.trace(inv_qqr)) * inv_qql
        aha = jnp.conj(a.T) @ a
        bbh = jnp.sum(inv_qql) * inv_qqr
        grad1 = aac - bbc
        grad2 = jnp.triu(aha - bbh)
        if step_normalizer == "2nd":
            s1 = lr / (jnp.max(jnp.real(aac + bbc)).astype(rdt) + tiny)
            s2 = lr / (nb(aha + bbh) + tiny)
        else:
            s1 = lr / (jnp.max(jnp.abs(grad1)).astype(rdt) + tiny)
            s2 = lr / (nb(grad2) + tiny)
        ql, qr = ql - s1 * grad1 * ql, qr - s2 * (grad2 @ qr)
        return AffineState(*_maybe_balance_affine(ql, qr, kb))

    if not r_dense and l_dense and qr.shape[0] >= ql.shape[0]:
        a = ql @ (dg * jnp.conj(qr))
        eye = jnp.eye(ql.shape[0], dtype=ql.dtype)
        inv_ql = _tri_solve_right(ql, eye)
        inv_qql = jnp.conj(inv_ql.T) @ inv_ql
        inv_qqr = 1.0 / (qr * jnp.conj(qr))
        aah = a @ jnp.conj(a.T)
        bhb = jnp.sum(inv_qqr) * inv_qql
        aac = jnp.sum(a * jnp.conj(a), axis=0)
        bbc = jnp.real(jnp.trace(inv_qql)) * inv_qqr
        grad1 = jnp.triu(aah - bhb)
        grad2 = aac - bbc
        if step_normalizer == "2nd":
            s1 = lr / (nb(aah + bhb) + tiny)
            s2 = lr / (jnp.max(jnp.real(aac + bbc)).astype(rdt) + tiny)
        else:
            s1 = lr / (nb(grad1) + tiny)
            s2 = lr / (jnp.max(jnp.abs(grad2)).astype(rdt) + tiny)
        ql, qr = ql - s1 * (grad1 @ ql), qr - s2 * grad2 * qr
        return AffineState(*_maybe_balance_affine(ql, qr, kb))

    # with-v fallback (reference :1695-1700)
    v = jax.random.normal(kv, dg.shape, dg.dtype)
    return update_affine(AffineState(ql, qr), v, dg, kb, lr=lr,
                         step_normalizer=step_normalizer, tiny=tiny)


def precond_grad_affine(state: AffineState, grad: jax.Array) -> jax.Array:
    """P grad = Q1^H Q1 grad (Q2^H Q2)^T (reference :1704-1720)."""
    ql, qr = state.ql, state.qr
    if ql.ndim == 2:
        out = jnp.conj(ql.T) @ (ql @ grad)
    else:
        out = (ql * jnp.conj(ql))[:, None] * grad
    if qr.ndim == 2:
        out = (out @ jnp.conj(qr.T)) @ qr
    else:
        out = out * (qr * jnp.conj(qr))
    return out
