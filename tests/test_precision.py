"""Finite-precision-arithmetic tests.

Model: misc/psgd_with_finite_precision_arithmetic.py — fit a Kron
preconditioner to a kron^5 Hessian in float32 vs float64.  The QEP geometry
is numerically stable in single precision (error floor within ~100x of the
fp64 floor, both small); the EQ geometry (triangular solves) is known to be
less stable, which we record by only requiring it to not blow up.
"""

import jax
import jax.numpy as jnp
import pytest

from psgd_torch_tpu.precond import kron

import pytest as _pytest

pytestmark = _pytest.mark.slow

N = 6          # per-dim size; implicit Hessian is 6^5 x 6^5
DIMS = 5
N_ITERS = 1200


def _hs(dtype):
    """Five Gram factors with a small ridge: cond ~60 per factor, so the
    implicit kron^5 Hessian has condition ~1e9 — far beyond what an identity
    preconditioner handles, but within reach of a converged fp32 fit."""
    hs = []
    for i in range(DIMS):
        a = jax.random.normal(jax.random.key(40 + i), (N, N),
                              jnp.float64) / N ** 0.5
        hs.append((a @ a.T + 0.05 * jnp.eye(N)).astype(dtype))
    return hs


def _fit_err(dq, dtype, n_iters=N_ITERS):
    hs = _hs(dtype)
    shape = (N,) * DIMS
    state, plan = kron.init_kron(shape, 1.0, float("inf"), float("inf"),
                                 dq, dtype)
    root = jax.random.key(99)

    def h_apply(v):
        return jnp.einsum("aA,bB,cC,dD,eE,ABCDE->abcde", *hs, v)

    def step(state, i):
        k = jax.random.fold_in(root, i)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, shape, dtype)
        state = kron.update_kron_newton(state, plan, v, h_apply(v), ku,
                                        lr=0.1, damping=0.0)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(n_iters))

    errs, scales = 0.0, 0.0
    for t in range(4):
        v = jax.random.normal(jax.random.fold_in(root, 10_000 + t), shape, dtype)
        pg = kron.precond_grad(state, plan, h_apply(v))
        errs += float(jnp.sum((pg - v).astype(jnp.float64) ** 2))
        scales += float(jnp.sum(v.astype(jnp.float64) ** 2))
    return (errs / scales) ** 0.5


def test_qep_stable_in_float32():
    err64 = _fit_err("QEP", jnp.float64)
    err32 = _fit_err("QEP", jnp.float32)
    assert err64 < 2e-3, err64
    # fp32 reaches a small floor close to the fp64 fit (not a divergence)
    assert err32 < 0.02, (err32, err64)


def test_eq_does_not_blow_up_in_float32():
    """EQ needs triangular solves; the reference documents it as less stable
    in fp32 (misc/psgd_with_finite_precision_arithmetic.py:1-5).  We require
    boundedness and a real fit, with a looser floor than QEP."""
    err32 = _fit_err("EQ", jnp.float32, n_iters=800)
    assert jnp.isfinite(err32), err32
    assert err32 < 0.5, err32


def test_bf16_whiten_operating_point():
    """Q in bfloat16 with lr_preconditioner >= 0.1 is the documented bf16
    operating point (README.md:10, reference wrapper defaults).  A bf16 Q fit
    on a moderately conditioned matrix Hessian must still reduce whitening
    error vs the identity preconditioner."""
    n = 16
    a = jax.random.normal(jax.random.key(7), (n, n), jnp.float32) / n ** 0.5
    h = (a @ a.T + 0.5 * jnp.eye(n)).astype(jnp.float32)
    state, plan = kron.init_kron((n,), 1.0, float("inf"), float("inf"),
                                 "Q0.5EQ1.5", jnp.bfloat16)
    root = jax.random.key(11)

    def step(state, i):
        k = jax.random.fold_in(root, i)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (n,), jnp.float32)
        g = (h @ v).astype(jnp.bfloat16)
        return kron.update_kron_whiten(state, plan, g, ku, lr=0.1,
                                       norm_k=128), None

    state, _ = jax.lax.scan(step, state, jnp.arange(600))
    # error vs H^-1 g of the bf16 fit, measured in fp32
    errs, scales = 0.0, 0.0
    for t in range(8):
        v = jax.random.normal(jax.random.fold_in(root, 5_000 + t), (n,), jnp.float32)
        g = h @ v
        pg = kron.precond_grad(state, plan, g.astype(jnp.bfloat16))
        errs += float(jnp.sum((pg.astype(jnp.float32) - v) ** 2))
        scales += float(jnp.sum(v ** 2))
    rel = (errs / scales) ** 0.5
    base = float(jnp.linalg.norm(h @ h - jnp.eye(n)) / jnp.linalg.norm(jnp.eye(n)))
    assert rel < 0.5, rel  # H has cond ~ 10; identity P would leave rel ~ O(1)
