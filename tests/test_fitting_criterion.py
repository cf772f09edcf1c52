"""Lie-group preconditioner-fitting criterion tests.

Model: misc/preconditioner_fitting_rule_verification.py — the PSGD fitting
loss  tr(P H H + P^-1 - 2 H)  is minimized exactly at P = H^-1 (value
tr(H^-1) - 2 tr(H) + tr(H) ... with minimum loss0* = 0 shifted); the test
asserts the criterion *decreases* from its init value across a grid of
preconditioner learning rates, for both the dense GL(n,R) update (with kept
inverse, reference update_precond_newton_math_) and the LRA preconditioner on
an H = diag + U U^T Hessian (reference :62-118).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_torch_tpu.precond import legacy, lra

import pytest as _pytest

pytestmark = _pytest.mark.slow

N = 20
N_ITERS = 4000


def _criterion_dense(q, h):
    p = q.T @ q
    return float(jnp.trace(p @ h @ h + jnp.linalg.inv(p) - 2 * h))


@pytest.mark.parametrize("lr", [0.01, 0.05, 0.2, 0.5])
def test_dense_gl_criterion_decreases(lr):
    key = jax.random.key(3)
    a = jax.random.normal(key, (N, N), jnp.float64)
    h = a @ a.T / N + 0.1 * jnp.eye(N)

    init_scale = float((N / jnp.trace(h @ h)) ** 0.25)
    state = legacy.init_newton_inv(N, init_scale, jnp.float64)
    loss0 = _criterion_dense(state.q, h)

    @jax.jit
    def step(state, k):
        v = jax.random.normal(k, (N,), jnp.float64)
        return legacy.update_newton_inv(state, v, h @ v, lr=lr), None

    state, _ = jax.lax.scan(
        step, state, jax.random.split(jax.random.key(17), N_ITERS))
    loss1 = _criterion_dense(state.q, h)
    # criterion minimized at P = H^-1 where it equals 0; even the slowest lr
    # in the grid must have cut it well below the init value by now
    assert loss1 < 0.3 * loss0, (loss0, loss1)

    # the kept inverse must still track Q (Woodbury consistency)
    np.testing.assert_allclose(np.asarray(state.q @ state.inv_q),
                               np.eye(N), atol=1e-6)


def test_lra_criterion_decreases_on_diag_plus_lowrank():
    """LRA fits H = diag(d) + U U^T (its own representable family)."""
    r = 5
    key = jax.random.key(5)
    u = jax.random.uniform(jax.random.fold_in(key, 0), (N, r), jnp.float64) / N ** 0.5
    d = jax.random.uniform(jax.random.fold_in(key, 1), (N,), jnp.float64) + 0.1
    h = jnp.diag(d) + u @ u.T

    state = lra.init_lra(N, r, jax.random.fold_in(key, 2),
                         float((N / jnp.trace(h @ h)) ** 0.25), jnp.float64)

    def criterion(state):
        eye = jnp.eye(N, dtype=jnp.float64)
        p = jax.vmap(lambda col: lra.precond_grad(state, col), in_axes=1,
                     out_axes=1)(eye)
        return float(jnp.trace(p @ h @ h + jnp.linalg.inv(p) - 2 * h))

    loss0 = criterion(state)

    @jax.jit
    def step(state, k):
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (N,), jnp.float64)
        return lra.update_lra_newton(state, v, h @ v, ku, lr=0.2,
                                     damping=0.0), None

    state, _ = jax.lax.scan(
        step, state, jax.random.split(jax.random.key(23), 4000))
    loss1 = criterion(state)
    assert loss1 < 0.2 * loss0, (loss0, loss1)


def test_divergence_guard_large_lr():
    """At absurd lr the criterion blows up — mirrors the reference's
    `loss > 10 * loss0 -> break` divergence guard, confirming the criterion
    is a real discriminator and the tests above are non-trivial."""
    key = jax.random.key(3)
    a = jax.random.normal(key, (N, N), jnp.float64)
    h = a @ a.T / N + 0.1 * jnp.eye(N)
    init_scale = float((N / jnp.trace(h @ h)) ** 0.25)
    state = legacy.init_newton_inv(N, init_scale, jnp.float64)
    loss0 = _criterion_dense(state.q, h)

    @jax.jit
    def step(state, k):
        v = jax.random.normal(k, (N,), jnp.float64)
        return legacy.update_newton_inv(state, v, h @ v, lr=8.0), None

    state, _ = jax.lax.scan(
        step, state, jax.random.split(jax.random.key(29), 200))
    loss1 = _criterion_dense(state.q, h)
    assert not (loss1 < 10 * loss0), (loss0, loss1)
