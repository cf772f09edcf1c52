"""Sparse-LU preconditioner: P = Q^T Q with Q = L U,
L = [L1 0; L2 diag(l3)], U = [U1 U2; 0 diag(u3)] and rank-r dense corners.

Functional JAX re-design of the reference SPLU kernels
(/root/reference/preconditioned_stochastic_gradient_descent.py:480-617).
Cost is O(r n) per step — between the diagonal and dense preconditioners.
Triangular solves on the r x r corners are lifted to float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import lift2single, norm_lower_bound, real_dtype_of


class SPLUState(NamedTuple):
    l12: jax.Array   # (n, r): [L1 (r x r); L2 (n-r x r)]
    l3: jax.Array    # (n - r, 1)
    u12: jax.Array   # (r, n): [U1 (r x r), U2 (r x n-r)]
    u3: jax.Array    # (n - r, 1)


def init_splu(n: int, r: int, scale: float = 1.0, dtype=jnp.float32) -> SPLUState:
    if not 0 < r < n:
        raise ValueError(f"rank r={r} must be in (0, n={n})")
    root = scale ** 0.5
    l12 = root * jnp.concatenate([jnp.eye(r, dtype=dtype),
                                  jnp.zeros((n - r, r), dtype)])
    u12 = root * jnp.concatenate([jnp.eye(r, dtype=dtype),
                                  jnp.zeros((r, n - r), dtype)], axis=1)
    return SPLUState(l12=l12, l3=root * jnp.ones((n - r, 1), dtype),
                     u12=u12, u3=root * jnp.ones((n - r, 1), dtype))


def _tri(a, b, lower, trans=False):
    a = lift2single(a)
    if trans:
        a = a.T
        lower = not lower
    return jax.lax.linalg.triangular_solve(
        a, lift2single(b), left_side=True, lower=lower).astype(b.dtype)


def update_splu(state: SPLUState, v: jax.Array, h: jax.Array,
                lr: float = 0.01, tiny: float = 1.2e-38) -> SPLUState:
    """One update with a (v, h) = (dx, dg) pair (reference
    update_precond_splu, :481-572)."""
    l12, l3, u12, u3 = state
    r = u12.shape[0]
    rdt = real_dtype_of(l12.dtype)

    # balance dynamic ranges of L and U (reference :497-503)
    max_l = jnp.maximum(jnp.max(jnp.diagonal(l12[:r])), jnp.max(l3))
    max_u = jnp.maximum(jnp.max(jnp.diagonal(u12[:, :r])), jnp.max(u3))
    rho = jnp.sqrt(max_l / max_u)
    l12, l3 = l12 / rho, l3 / rho
    u12, u3 = u12 * rho, u3 * rho

    l1, l2 = l12[:r], l12[r:]
    u1, u2 = u12[:, :r], u12[:, r:]

    dx = v.reshape(-1, 1)
    dg = h.reshape(-1, 1)

    # U dg, Q dg
    ug1 = u1 @ dg[:r] + u2 @ dg[r:]
    ug2 = u3 * dg[r:]
    qg1 = l1 @ ug1
    qg2 = l2 @ ug1 + l3 * ug2
    # inv(U^T) dx, inv(Q^T) dx
    iutx1 = _tri(u1, dx[:r], lower=False, trans=True)
    iutx2 = (dx[r:] - u2.T @ iutx1) / u3
    iqtx2 = iutx2 / l3
    iqtx1 = _tri(l1, iutx1 - l2.T @ iqtx2, lower=True, trans=True)
    # L^T Q dg, P dg
    ltqg1 = l1.T @ qg1 + l2.T @ qg2
    ltqg2 = l3 * qg2
    pg1 = u1.T @ ltqg1
    pg2 = u2.T @ ltqg1 + u3 * ltqg2
    # inv(L) inv(Q^T) dx, inv(P) dx
    iliqtx1 = _tri(l1, iqtx1, lower=True)
    iliqtx2 = (iqtx2 - l2 @ iliqtx1) / l3
    ipx2 = iliqtx2 / u3
    ipx1 = _tri(u1, iliqtx1 - u2 @ ipx2, lower=False)

    # update L (reference :544-556)
    grad1 = jnp.tril(qg1 @ qg1.T - iqtx1 @ iqtx1.T)
    grad2 = qg2 @ qg1.T - iqtx2 @ iqtx1.T
    grad3 = qg2 * qg2 - iqtx2 * iqtx2
    step0 = lr / (jnp.maximum(
        norm_lower_bound(jnp.concatenate([grad1, grad2], axis=0)),
        jnp.max(jnp.abs(grad3))).astype(rdt) + tiny)
    new_l1 = l1 - step0 * (grad1 @ l1)
    new_l2 = l2 - step0 * (grad2 @ l1) - step0 * grad3 * l2
    new_l3 = l3 - step0 * grad3 * l3

    # update U (reference :558-570)
    grad1u = jnp.triu(pg1 @ dg[:r].T - dx[:r] @ ipx1.T)
    grad2u = pg1 @ dg[r:].T - dx[:r] @ ipx2.T
    grad3u = pg2 * dg[r:] - dx[r:] * ipx2
    step0u = lr / (jnp.maximum(
        norm_lower_bound(jnp.concatenate([grad1u, grad2u], axis=1)),
        jnp.max(jnp.abs(grad3u))).astype(rdt) + tiny)
    new_u1 = u1 - u1 @ (step0u * grad1u)
    new_u2 = u2 - u1 @ (step0u * grad2u) - step0u * grad3u.T * u2
    new_u3 = u3 - step0u * grad3u * u3

    return SPLUState(l12=jnp.concatenate([new_l1, new_l2], axis=0),
                     l3=new_l3,
                     u12=jnp.concatenate([new_u1, new_u2], axis=1),
                     u3=new_u3)


def precond_grad_splu(state: SPLUState, g: jax.Array) -> jax.Array:
    """P g (reference precond_grad_splu, :575-609)."""
    l12, l3, u12, u3 = state
    r = u12.shape[0]
    l1, l2 = l12[:r], l12[r:]
    u1, u2 = u12[:, :r], u12[:, r:]
    shape = g.shape
    g = g.reshape(-1, 1)

    ug1 = u1 @ g[:r] + u2 @ g[r:]
    ug2 = u3 * g[r:]
    qg1 = l1 @ ug1
    qg2 = l2 @ ug1 + l3 * ug2
    ltqg1 = l1.T @ qg1 + l2.T @ qg2
    ltqg2 = l3 * qg2
    out = jnp.concatenate([u1.T @ ltqg1, u2.T @ ltqg1 + u3 * ltqg2])
    return out.reshape(shape)
