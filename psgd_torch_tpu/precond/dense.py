"""Dense-matrix Newton-type PSGD preconditioner (BFGS alternative).

Functional JAX re-design of the reference dense family
(/root/reference/psgd.py:1339-1424, class at :1427-1563): one full Q over the
concatenated parameter vector, all seven dQ geometries.  Useful for small
problems and as the ground-truth implementation of the PSGD math; the class
docstring notes it as "a good alternative to the BFGS like quasi-Newton
optimizers as no line search is required" (psgd.py:1429-1432).

v, h are column vectors (n, 1) or 1-D (n,); updates are pure and return
(q, lips).  The matmul-only geometries (QEQ/Q0.5EQ1.5/QUAD/*4P) are purely
n x n and n x 1 products — MXU-friendly; EQ keeps a triangular solve (lifted
to float32) for parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import (
    lift2single,
    lifted_real_dtype,
    procrustes_step2,
    procrustes_loop3,
    real_dtype_of,
)
from .kron import canonical_dq, DQ_EQ, DQ_QEP, DQ_QEQ, DQ_QUAD, DQ_Q05EQ15, \
    DQ_QUAD4P, DQ_PRO4P, _FIT_P


class DenseState(NamedTuple):
    q: jax.Array      # (n, n) preconditioner factor (or P itself for *4P)
    lips: jax.Array   # () Lipschitz estimate, >= fp32


def init_dense(n: int, scale: float | jax.Array = 1.0, dq: str = DQ_Q05EQ15,
               dtype=jnp.float32) -> DenseState:
    """Q = scale * I (scale squared for the fit-P geometries,
    psgd.py:1457-1459)."""
    dq = canonical_dq(dq)
    scale = jnp.asarray(scale, real_dtype_of(dtype))
    if dq in _FIT_P:
        scale = scale * scale
    return DenseState(q=scale.astype(dtype) * jnp.eye(n, dtype=dtype),
                      lips=jnp.zeros((), lifted_real_dtype(dtype)))


def precond_grad(state: DenseState, g: jax.Array, dq: str) -> jax.Array:
    """Apply the preconditioner: Q g for *4P, Q(Qg) for QUAD (Q symmetric),
    Q^T(Qg) otherwise (psgd.py:1473-1478)."""
    dq = canonical_dq(dq)
    squeeze = g.ndim == 1
    g2 = g[:, None] if squeeze else g
    if dq in _FIT_P:
        out = state.q @ g2
    elif dq == DQ_QUAD:
        out = state.q @ (state.q @ g2)
    else:
        out = state.q.T @ (state.q @ g2)
    return out[:, 0] if squeeze else out


def _as_col(x):
    return x[:, None] if x.ndim == 1 else x


def _damped_col(h, key, damping):
    eps = jnp.finfo(real_dtype_of(h.dtype)).eps
    return h + (damping + eps * jnp.abs(h)) * jax.random.normal(key, h.shape, h.dtype)


def _sum_sq(a, b):
    return jnp.sum(a * a) + jnp.sum(b * b)


def _lmax(lips, ell, beta_l):
    ell = ell.astype(lips.dtype)
    return jnp.maximum(beta_l * lips + (1.0 - beta_l) * ell, ell)


def update_dense(state: DenseState, v: jax.Array, h: jax.Array, key: jax.Array,
                 dq: str, lr: float = 0.1, beta_l: float = 0.9,
                 damping: float | None = 1e-9, norm_k: int = 32) -> DenseState:
    """One Newton-type dense update for geometry ``dq``.

    Reference parity: update_precond_dense_* (psgd.py:1339-1424).
    ``damping=None`` skips the noise injection entirely (for callers that
    already damped the pair, like update_dense_whiten); any float — including
    0.0 — still adds the eps*|h| floor, matching the reference Newton
    updates (psgd.py:723)."""
    dq = canonical_dq(dq)
    v = _as_col(v)
    h = _as_col(h)
    kd, ku = jax.random.split(key)
    q, lips = state.q, state.lips
    rdt = real_dtype_of(q.dtype)
    hd = h if damping is None else _damped_col(h, kd, damping)

    if dq == DQ_EQ:
        a = q @ hd
        b = jax.lax.linalg.triangular_solve(
            lift2single(q.T), lift2single(v), left_side=True, lower=True
        ).astype(v.dtype)
        ell = _sum_sq(a, b)
        lips = _lmax(lips, ell, beta_l)
        q = q - (lr / lips).astype(rdt) * (jnp.triu(a @ a.T - b @ b.T) @ q)
    elif dq == DQ_QEP:
        a = q @ (q.T @ (q @ hd))
        b = q @ v
        ell = _sum_sq(a, b)
        lips = _lmax(lips, ell, beta_l)
        q = q - (lr / lips).astype(rdt) * (a @ (a.T @ q) - b @ (b.T @ q))
    elif dq == DQ_QEQ:
        a = q.T @ (q @ hd)
        ell = _sum_sq(a, v)
        lips = _lmax(lips, ell, beta_l)
        q = q - (lr / lips).astype(rdt) * ((q @ a) @ a.T - (q @ v) @ v.T)
    elif dq == DQ_Q05EQ15:
        a = q.T @ (q @ hd)
        ell = _sum_sq(a, v)
        lips = _lmax(lips, ell, beta_l)
        q = q - (lr / lips).astype(rdt) * (a @ (a.T @ q) - v @ (v.T @ q))
        q = procrustes_step2(q, ku, norm_k=norm_k)
    elif dq == DQ_PRO4P:
        a = q @ hd  # Q is P here: apply once
        ell = _sum_sq(a, v)
        lips = _lmax(lips, ell, beta_l)
        q = q - (lr / lips).astype(rdt) * (a @ (a.T @ q) - v @ (v.T @ q))
        q = procrustes_loop3(q, ku, norm_k=norm_k)
    elif dq == DQ_QUAD:
        a = q @ (q @ hd)  # Q symmetric
        ell = _sum_sq(a, v)
        lips = _lmax(lips, ell, beta_l)
        c = (lr / 2.0 / lips).astype(rdt)
        p = q - c * (a @ (a.T @ q) - v @ (v.T @ q))
        p = p - c * ((p @ a) @ a.T - (p @ v) @ v.T)
        q = 0.5 * (p + p.T)
    else:  # QUAD4P
        a = q @ hd  # Q is P here
        ell = _sum_sq(a, v)
        lips = _lmax(lips, ell, beta_l)
        c = (lr / lips).astype(rdt)
        p = q - c * (a @ (a.T @ q) - v @ (v.T @ q))
        p = p - c * ((p @ a) @ a.T - (p @ v) @ v.T)
        q = 0.5 * (p + p.T)

    return DenseState(q=q, lips=lips)


def update_dense_whiten(state: DenseState, g: jax.Array, key: jax.Array,
                        dq: str, lr: float = 0.1, beta_l: float = 0.9,
                        damping: float = 1e-9, norm_k: int = 32) -> DenseState:
    """Gradient/momentum-whitening variant: synthesize v ~ N(0, I) and feed
    (v, g + damping v) — the dense analogue of the Kron whiten wrappers."""
    kv, ku = jax.random.split(key)
    g2 = _as_col(g)
    v = jax.random.normal(kv, g2.shape, g2.dtype)
    eps = jnp.finfo(real_dtype_of(g2.dtype)).eps
    h = g2 + (damping + eps * jnp.abs(g2)) * v
    return update_dense(state, v, h, ku, dq, lr=lr, beta_l=beta_l,
                        damping=None, norm_k=norm_k)


# ---------------------------------------------------------------------------
# Row-sharded (ZeRO-style) dense Newton, QEQ geometry.
#
# The dense fit terms are rank-1 outer products (a a^T with a = P hd, and
# v v^T — update_precond_dense_qeq, psgd.py:1360-1366), so with Q's ROWS
# sharded over a mesh axis the whole fit + apply is O(n^2 / k) FLOPs and
# memory per device, with only two (n,)-sized psums per fit and one per
# apply.  QEQ is the one matmul-only geometry whose dense update needs no
# transpose, symmetrization, or Procrustes retraction of Q — the other
# geometries would all-to-all an (n, n) block transpose each fit.
#
# Padding contract (n padded to a multiple of the shard count): Q starts as
# eye, the probe/damping noise is masked to the true rows, so the padded
# rows and columns of Q stay exactly e_i forever and padded gradient rows
# produce exactly zero preconditioned output.
# ---------------------------------------------------------------------------


def update_dense_qeq_row_sharded(q_loc: jax.Array, lips: jax.Array,
                                 v: jax.Array, h: jax.Array, key: jax.Array,
                                 axis: str, n_true: int,
                                 lr: float = 0.1, beta_l: float = 0.9,
                                 damping: float | None = 1e-9):
    """One QEQ dense Newton update on a row shard, INSIDE shard_map.

    Args:
      q_loc: (n_loc, n) local row block of Q.
      v, h: full replicated probe / Hvp column vectors (n, 1) or (n,).
      n_true: unpadded problem size (static); rows >= n_true are masked.
    Returns (q_loc, lips).
    """
    v = _as_col(v)
    h = _as_col(h)
    rdt = real_dtype_of(q_loc.dtype)
    n = v.shape[0]
    mask = (jnp.arange(n) < n_true)[:, None]
    if damping is None:
        hd = h
    else:
        eps = jnp.finfo(real_dtype_of(h.dtype)).eps
        hd = h + jnp.where(
            mask, (damping + eps * jnp.abs(h))
            * jax.random.normal(key, h.shape, h.dtype), 0.0)

    qh = q_loc @ hd                                   # (n_loc, 1)
    a = jax.lax.psum(q_loc.T @ qh, axis)              # (n, 1) = P hd
    ell = _sum_sq(a, v)
    lips = _lmax(lips, ell, beta_l)
    c = (lr / lips).astype(rdt)
    q_loc = q_loc - c * ((q_loc @ a) @ a.T - (q_loc @ v) @ v.T)
    return q_loc, lips


def precond_grad_qeq_row_sharded(q_loc: jax.Array, g: jax.Array,
                                 axis: str) -> jax.Array:
    """P g = Q^T (Q g) with Q row-sharded: local products + one psum;
    returns the full replicated (n,) result (INSIDE shard_map)."""
    squeeze = g.ndim == 1
    g2 = _as_col(g)
    out = jax.lax.psum(q_loc.T @ (q_loc @ g2), axis)
    return out[:, 0] if squeeze else out
