"""Legacy functional kernels from the reference's original implementation
(/root/reference/preconditioned_stochastic_gradient_descent.py).  These are
the (dx, dg)-pair APIs used by the classic demos (mnist_with_lenet5.py,
lstm_with_xor_problem.py):

  * legacy dense P (:122-164);
  * the shape-dispatching matrix Kron preconditioner with its four kernels:
    (dense, dense) :243-287, (normalization, dense) :293-356,
    (normalization, scaling) :363-426 (Adafactor-like sublinear memory),
    (dense, scaling) :431-475;
  * the classic Newton preconditioner with a maintained inverse via
    rank-2 Woodbury updates (:1171-1213);
  * the legacy UVd/LRA update with '1st'/'2nd' step normalizers (:657-753).

A "normalization" factor is the (2, M) Lie group: row 0 the diagonal, row 1
the last column (feature normalization); a "scaling" factor is a (1, N)
diagonal.  All kernels are pure and return new state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.linalg import lift2single, norm_lower_bound, real_dtype_of, \
    woodbury_identity

_TINY = 1.2e-38


def _tri_left(a, b, lower, trans=False):
    a = lift2single(a)
    if trans:
        a, lower = a.T, not lower
    return jax.lax.linalg.triangular_solve(
        a, lift2single(b), left_side=True, lower=lower).astype(b.dtype)


def _tri_right(a, b):
    """b @ inv(a), a upper triangular."""
    return jax.lax.linalg.triangular_solve(
        lift2single(a), lift2single(b), left_side=False,
        lower=False).astype(b.dtype)


# ---------------------------------------------------------------------------
# legacy dense preconditioner (:122-164)
# ---------------------------------------------------------------------------


def update_precond_dense(q: jax.Array, dx: jax.Array, dg: jax.Array,
                         lr: float = 0.01, tiny: float = _TINY) -> jax.Array:
    """P = Q^T Q over the concatenated parameter vector; triangular Q."""
    dx = dx.reshape(-1, 1)
    dg = dg.reshape(-1, 1)
    a = q @ dg
    b = _tri_left(q, dx, lower=False, trans=True)
    grad = jnp.triu(a @ a.T - b @ b.T)
    step0 = lr / (norm_lower_bound(grad).astype(real_dtype_of(q.dtype)) + tiny)
    return q - step0 * (grad @ q)


def precond_grad_dense(q: jax.Array, g: jax.Array) -> jax.Array:
    shape = g.shape
    return (q.T @ (q @ g.reshape(-1, 1))).reshape(shape)


# ---------------------------------------------------------------------------
# legacy matrix Kron kernels and shape dispatcher (:168-475)
# ---------------------------------------------------------------------------


def init_kron_legacy(shape: Tuple[int, int], kind_l: str = "dense",
                     kind_r: str = "dense", scale: float = 1.0,
                     dtype=jnp.float32):
    """(Ql, Qr) for a matrix param: kind in {'dense','norm','scale'}.

    dense -> (n, n) identity; norm -> (2, n) [ones; zeros]; scale -> (1, n)
    ones (reference demo setups, e.g. mnist_with_lenet5.py:53)."""
    m, n = shape

    def side(kind, s):
        if kind == "dense":
            return scale * jnp.eye(s, dtype=dtype)
        if kind == "norm":
            return jnp.concatenate([scale * jnp.ones((1, s), dtype),
                                    jnp.zeros((1, s), dtype)])
        if kind == "scale":
            return scale * jnp.ones((1, s), dtype)
        raise ValueError(f"unknown factor kind {kind!r}")

    return side(kind_l, m), side(kind_r, n)


def update_precond_kron(ql, qr, dx, dg, lr: float = 0.01, tiny: float = _TINY):
    """Shape-dispatching update (reference :168-203): m==n dense, m==2
    normalization, m==1 scaling, per side."""
    m, n = ql.shape
    p, q = qr.shape
    if m == n:
        if p == q:
            return _update_dense_dense(ql, qr, dx, dg, lr, tiny)
        if p == 2:
            out = _update_norm_dense(qr, ql, dx.T, dg.T, lr, tiny)
            return out[1], out[0]
        if p == 1:
            return _update_dense_scale(ql, qr, dx, dg, lr, tiny)
    elif m == 2:
        if p == q:
            return _update_norm_dense(ql, qr, dx, dg, lr, tiny)
        if p == 1:
            return _update_norm_scale(ql, qr, dx, dg, lr, tiny)
    elif m == 1:
        if p == q:
            out = _update_dense_scale(qr, ql, dx.T, dg.T, lr, tiny)
            return out[1], out[0]
        if p == 2:
            out = _update_norm_scale(qr, ql, dx.T, dg.T, lr, tiny)
            return out[1], out[0]
    raise ValueError("Unknown Kronecker product preconditioner shapes")


def precond_grad_kron(ql, qr, grad):
    """Shape-dispatching apply (reference :206-238)."""
    m, n = ql.shape
    p, q = qr.shape
    if m == n:
        if p == q:
            return _grad_dense_dense(ql, qr, grad)
        if p == 2:
            return _grad_norm_dense(qr, ql, grad.T).T
        if p == 1:
            return _grad_dense_scale(ql, qr, grad)
    elif m == 2:
        if p == q:
            return _grad_norm_dense(ql, qr, grad)
        if p == 1:
            return _grad_norm_scale(ql, qr, grad)
    elif m == 1:
        if p == q:
            return _grad_dense_scale(qr, ql, grad.T).T
        if p == 2:
            return _grad_norm_scale(qr, ql, grad.T).T
    raise ValueError("Unknown Kronecker product preconditioner shapes")


def _update_dense_dense(ql, qr, dx, dg, lr, tiny):
    """(dense, dense) with dynamic-range balancing (reference :243-275)."""
    rdt = real_dtype_of(ql.dtype)
    rho = jnp.sqrt(jnp.max(jnp.diagonal(ql)) / jnp.max(jnp.diagonal(qr)))
    ql, qr = ql / rho, qr * rho
    a = ql @ dg @ qr.T
    bt = _tri_left(ql, _tri_right(qr, dx), lower=False, trans=True)
    grad1 = jnp.triu(a @ a.T - bt @ bt.T)
    grad2 = jnp.triu(a.T @ a - bt.T @ bt)
    s1 = lr / (norm_lower_bound(grad1).astype(rdt) + tiny)
    s2 = lr / (norm_lower_bound(grad2).astype(rdt) + tiny)
    return ql - s1 * (grad1 @ ql), qr - s2 * (grad2 @ qr)


def _grad_dense_dense(ql, qr, grad):
    return ql.T @ ql @ grad @ qr.T @ qr


def _norm_apply(ql, x):
    """Ql x with the (2, M) normalization factor: diag + last-column."""
    return ql[0:1].T * x + ql[1:].T @ x[-1:]


def _norm_inv_t_apply(ql, x):
    """inv(Ql)^T x."""
    bt = x / ql[0:1].T
    bt = bt.at[-1:].add(-(ql[1:] / (ql[0:1] * ql[0, -1])) @ x)
    return bt


def _update_norm_dense(ql, qr, dx, dg, lr, tiny):
    """(normalization, dense) (reference :293-336)."""
    rdt = real_dtype_of(qr.dtype)
    rho = jnp.sqrt(jnp.max(ql[0]) / jnp.max(jnp.diagonal(qr)))
    ql, qr = ql / rho, qr * rho
    a = _norm_apply(ql, dg) @ qr.T
    bt = _tri_right(qr, _norm_inv_t_apply(ql, dx))

    grad1_diag = jnp.sum(a * a, axis=1) - jnp.sum(bt * bt, axis=1)
    grad1_bias = (a[:-1] @ a[-1:].T - bt[:-1] @ bt[-1:].T)[:, 0]
    grad1_bias = jnp.concatenate([grad1_bias, jnp.zeros((1,), grad1_bias.dtype)])
    s1 = lr / (jnp.maximum(jnp.max(jnp.abs(grad1_diag)),
                           jnp.max(jnp.abs(grad1_bias))).astype(rdt) + tiny)
    new_ql = jnp.stack([ql[0] - s1 * grad1_diag * ql[0],
                        ql[1] - s1 * (grad1_diag * ql[1] + ql[0, -1] * grad1_bias)])

    grad2 = jnp.triu(a.T @ a - bt.T @ bt)
    s2 = lr / (norm_lower_bound(grad2).astype(rdt) + tiny)
    return new_ql, qr - s2 * (grad2 @ qr)


def _grad_norm_dense(ql, qr, grad):
    pre = _norm_apply(ql, grad) @ qr.T @ qr
    add_last = ql[1:] @ pre
    pre = pre * ql[0:1].T
    return pre.at[-1:].add(add_last)


def _update_norm_scale(ql, qr, dx, dg, lr, tiny):
    """(normalization, scaling): Adafactor-like sublinear memory
    (reference :363-405)."""
    rdt = real_dtype_of(qr.dtype)
    rho = jnp.sqrt(jnp.max(ql[0]) / jnp.max(qr))
    ql, qr = ql / rho, qr * rho
    a = _norm_apply(ql, dg) * qr
    bt = _norm_inv_t_apply(ql, dx) / qr

    grad1_diag = jnp.sum(a * a, axis=1) - jnp.sum(bt * bt, axis=1)
    grad1_bias = (a[:-1] @ a[-1:].T - bt[:-1] @ bt[-1:].T)[:, 0]
    grad1_bias = jnp.concatenate([grad1_bias, jnp.zeros((1,), grad1_bias.dtype)])
    s1 = lr / (jnp.maximum(jnp.max(jnp.abs(grad1_diag)),
                           jnp.max(jnp.abs(grad1_bias))).astype(rdt) + tiny)
    new_ql = jnp.stack([ql[0] - s1 * grad1_diag * ql[0],
                        ql[1] - s1 * (grad1_diag * ql[1] + ql[0, -1] * grad1_bias)])

    grad2 = jnp.sum(a * a, axis=0, keepdims=True) \
        - jnp.sum(bt * bt, axis=0, keepdims=True)
    s2 = lr / (jnp.max(jnp.abs(grad2)).astype(rdt) + tiny)
    return new_ql, qr - s2 * grad2 * qr


def _grad_norm_scale(ql, qr, grad):
    pre = _norm_apply(ql, grad) * (qr * qr)
    add_last = ql[1:] @ pre
    pre = pre * ql[0:1].T
    return pre.at[-1:].add(add_last)


def _update_dense_scale(ql, qr, dx, dg, lr, tiny):
    """(dense, scaling) (reference :431-462)."""
    rdt = real_dtype_of(ql.dtype)
    rho = jnp.sqrt(jnp.max(jnp.diagonal(ql)) / jnp.max(qr))
    ql, qr = ql / rho, qr * rho
    a = ql @ (dg * qr)
    bt = _tri_left(ql, dx / qr, lower=False, trans=True)
    grad1 = jnp.triu(a @ a.T - bt @ bt.T)
    grad2 = jnp.sum(a * a, axis=0, keepdims=True) \
        - jnp.sum(bt * bt, axis=0, keepdims=True)
    s1 = lr / (norm_lower_bound(grad1).astype(rdt) + tiny)
    s2 = lr / (jnp.max(jnp.abs(grad2)).astype(rdt) + tiny)
    return ql - s1 * (grad1 @ ql), qr - s2 * grad2 * qr


def _grad_dense_scale(ql, qr, grad):
    return ql.T @ ql @ (grad * (qr * qr))


# ---------------------------------------------------------------------------
# classic Newton with maintained inverse via Woodbury (:1171-1202)
# ---------------------------------------------------------------------------


class NewtonInvState(NamedTuple):
    q: jax.Array
    inv_q: jax.Array


def init_newton_inv(n: int, scale: float = 1.0, dtype=jnp.float32) -> NewtonInvState:
    return NewtonInvState(q=scale * jnp.eye(n, dtype=dtype),
                          inv_q=(1.0 / scale) * jnp.eye(n, dtype=dtype))


def update_newton_inv(state: NewtonInvState, v: jax.Array, h: jax.Array,
                      lr: float = 0.01, step_normalizer: str = "2nd",
                      tiny: float = _TINY) -> NewtonInvState:
    """Dense-Q update that also maintains inv(Q) with a rank-2 Woodbury
    update, avoiding triangular solves entirely (reference keep_invQ path,
    :1178-1202)."""
    q, inv_q = state
    v = v.reshape(-1, 1)
    h = h.reshape(-1, 1)
    a = q @ h
    b = inv_q.T @ v
    rdt = real_dtype_of(q.dtype)
    if step_normalizer == "2nd":
        mu = lr / (jnp.sum(a * a + b * b).astype(rdt) + tiny)
    else:
        mu = lr * jax.lax.rsqrt(jnp.abs(
            jnp.sum(a * a) ** 2 + jnp.sum(b * b) ** 2
            - 2 * jnp.sum(a * b) ** 2).astype(rdt) + tiny)
    u_mat = jnp.concatenate([a, b], axis=1) * mu
    v_mat = jnp.concatenate([-(a.T @ q), v.T], axis=0)
    q_new = q + u_mat @ v_mat
    inv_q_new = woodbury_identity(inv_q, u_mat, v_mat)
    return NewtonInvState(q=q_new, inv_q=inv_q_new)


def precond_grad_newton_inv(state: NewtonInvState, g: jax.Array) -> jax.Array:
    shape = g.shape
    return (state.q.T @ (state.q @ g.reshape(-1, 1))).reshape(shape)


def update_newton_tri(q: jax.Array, v: jax.Array, h: jax.Array,
                      lr: float = 0.01, step_normalizer: str = "2nd",
                      tiny: float = _TINY) -> jax.Array:
    """Classic Newton update on the *triangular* group (the reference's
    ``update_precond_newton_math_`` with invQ=None, preconditioned...py:
    1204-1213): a = Q h, b = Q^-T v via triangular solve, Q -= mu *
    triu(a a^T - b b^T) Q.  Used by the numerical-stability study
    (misc/psgd_numerical_stability.py:61-76) as the triangular-group
    contrast to the GL(n,R) kept-inverse path."""
    v = v.reshape(-1, 1)
    h = h.reshape(-1, 1)
    a = q @ h
    b = _tri_left(q, v, lower=False, trans=True)
    grad = jnp.triu(a @ a.T - b @ b.T)
    rdt = real_dtype_of(q.dtype)
    if step_normalizer == "2nd":
        mu = lr / (jnp.sum(a * a + b * b).astype(rdt) + tiny)
    else:
        mu = lr / (norm_lower_bound(grad).astype(rdt) + tiny)
    return q - mu * (grad @ q)


# ---------------------------------------------------------------------------
# legacy UVd (LRA) with '1st'/'2nd' step normalizers (:657-753)
# ---------------------------------------------------------------------------


class UVdState(NamedTuple):
    u: jax.Array
    v: jax.Array
    d: jax.Array


def init_uvd(n: int, rank: int, key: jax.Array, scale: float = 1.0,
             dtype=jnp.float32) -> UVdState:
    ku, kv = jax.random.split(key)
    u = jax.random.normal(ku, (n, rank), dtype)
    v = jax.random.normal(kv, (n, rank), dtype)
    if rank > 0:
        u = u * (0.1 ** 0.5 / jnp.linalg.norm(u))
        v = v * (0.1 ** 0.5 / jnp.linalg.norm(v))
    return UVdState(u=u, v=v, d=scale * jnp.ones((n, 1), dtype))


def update_uvd(state: UVdState, v: jax.Array, h: jax.Array, key: jax.Array,
               lr: float = 0.01, step_normalizer: str = "2nd",
               tiny: float = _TINY) -> UVdState:
    """Legacy LRA update (reference update_precond_UVd_math_, :657-739):
    prob-0.01 norm balancing, LU solve, '1st'/'2nd' normalizers, and the
    prob-0.5 U-or-V choice."""
    u, w, d = state
    v = v.reshape(-1, 1)
    h = h.reshape(-1, 1)
    rank = u.shape[1]
    rdt = real_dtype_of(u.dtype)

    def bal(ops):
        u, w = ops
        rho = jnp.sqrt(jnp.linalg.norm(u) / jnp.linalg.norm(w))
        return u / rho, w * rho

    kb, kc = jax.random.split(key)
    u, w = jax.lax.cond(jax.random.uniform(kb) < 0.01, bal, lambda o: o, (u, w))

    qh = d * h + u @ (w.T @ (d * h))
    ph = d * (qh + w @ (u.T @ qh))

    ip_vtu = w.T @ u + jnp.eye(rank, dtype=u.dtype)
    lu_fac, piv = jsl.lu_factor(lift2single(ip_vtu))
    inv_qtv = v / d
    inv_qtv = inv_qtv - w @ jsl.lu_solve(
        (lu_fac, piv), lift2single(u.T @ inv_qtv), trans=1).astype(u.dtype)
    inv_pv = inv_qtv - u @ jsl.lu_solve(
        (lu_fac, piv), lift2single(w.T @ inv_qtv), trans=0).astype(u.dtype)
    inv_pv = inv_pv / d

    nabla_d = ph * h - v * inv_pv
    if step_normalizer == "2nd":
        mu = lr * jnp.min(jax.lax.rsqrt(ph * ph + v * v + tiny)
                          * jax.lax.rsqrt(h * h + inv_pv * inv_pv + tiny)).astype(rdt)
    else:
        mu = lr / (jnp.max(jnp.abs(nabla_d)).astype(rdt) + tiny)
    d = d - mu * d * nabla_d

    a, b = qh, inv_qtv

    def upd_u(ops):
        u, w = ops
        atv, btv = a.T @ w, b.T @ w
        atvvt, btvvt = atv @ w.T, btv @ w.T
        if step_normalizer == "2nd":
            m = lr / (jnp.linalg.norm(a) * jnp.linalg.norm(atvvt)
                      + jnp.linalg.norm(b) * jnp.linalg.norm(btvvt) + tiny)
        else:
            nrm = jnp.sqrt(jnp.abs(
                (a.T @ a) * (atvvt @ atvvt.T) + (b.T @ b) * (btvvt @ btvvt.T)
                - 2 * (a.T @ b) * (atvvt @ btvvt.T)))[0, 0]
            m = lr / (nrm + tiny)
        m = m.astype(rdt)
        return u - m * (a @ (atv @ ip_vtu) - b @ (btv @ ip_vtu)), w

    def upd_v(ops):
        u, w = ops
        atu, btu = a.T @ u, b.T @ u
        uuta, uutb = u @ atu.T, u @ btu.T
        if step_normalizer == "2nd":
            m = lr / (jnp.linalg.norm(a) * jnp.linalg.norm(uuta)
                      + jnp.linalg.norm(b) * jnp.linalg.norm(uutb) + tiny)
        else:
            nrm = jnp.sqrt(jnp.abs(
                (uuta.T @ uuta) * (a.T @ a) + (uutb.T @ uutb) * (b.T @ b)
                - 2 * (uuta.T @ uutb) * (a.T @ b)))[0, 0]
            m = lr / (nrm + tiny)
        m = m.astype(rdt)
        return u, w - m * ((a + w @ atu.T) @ atu - (b + w @ btu.T) @ btu)

    u, w = jax.lax.cond(jax.random.uniform(kc) < 0.5, upd_u, upd_v, (u, w))
    return UVdState(u=u, v=w, d=d)


def precond_grad_uvd(state: UVdState, g: jax.Array) -> jax.Array:
    """P g with Q = (I + U V^T) diag(d) (reference :744-753)."""
    shape = g.shape
    g = g.reshape(-1, 1)
    u, w, d = state
    qg = d * g + u @ (w.T @ (d * g))
    pg = d * (qg + w @ (u.T @ qg))
    return pg.reshape(shape)