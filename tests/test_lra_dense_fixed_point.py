"""Fixed-point tests for the LRA and dense preconditioner families.

Models: misc/psgd_lra_verification.py (H = diag + U U^T, assert |Pg - v| -> 0)
and the dense geometry coverage of misc/psgd_kron_verification.py.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_torch_tpu.precond import dense, lra

import pytest as _pytest

pytestmark = _pytest.mark.slow


def _lra_problem(n=10, r=5):
    u = jax.random.normal(jax.random.key(0), (n, r), jnp.float64) / n ** 0.5
    h = jnp.diag(jax.random.uniform(jax.random.key(1), (n,), jnp.float64)) + u @ u.T
    return h


def _run_lra(mode, n=10, r=5, n_iters=20000, lr=0.1):
    h = _lra_problem(n, r)
    root = jax.random.key(zlib.crc32(f"lra/{mode}".encode()))
    state = lra.init_lra(n, r, jax.random.fold_in(root, 0), 1.0, jnp.float64)

    def step(state, i):
        k = jax.random.fold_in(root, i + 1)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (n, 1), jnp.float64)
        g = h @ v
        if mode == "whiten":
            state = lra.update_lra_whiten(state, g, ku, lr=lr, damping=0.0)
        else:
            state = lra.update_lra_newton(state, v, g, ku, lr=lr, damping=0.0)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(n_iters))

    errs, scales = [], []
    for t in range(16):
        v = jax.random.normal(jax.random.fold_in(root, n_iters + 2 + t), (n, 1), jnp.float64)
        g = h @ v
        pg = lra.precond_grad(state, g)
        errs.append(float(jnp.sum((pg - v) ** 2)))
        scales.append(float(jnp.sum(v ** 2)))
    return (sum(errs) / sum(scales)) ** 0.5


def test_lra_newton_fixed_point():
    err = _run_lra("newton")
    assert err < 0.1, f"LRA newton relative error {err}"


def test_lra_whiten_fixed_point():
    err = _run_lra("whiten", lr=0.05)
    assert err < 0.2, f"LRA whiten relative error {err}"


def test_lra_rank0_is_diagonal():
    # rank 0 must behave as a pure diagonal preconditioner on a diagonal H
    n = 12
    hdiag = 10.0 ** jnp.linspace(-1, 1, n)
    h = jnp.diag(hdiag)
    root = jax.random.key(3)
    state = lra.init_lra(n, 0, root, 1.0, jnp.float64)

    def step(state, i):
        k = jax.random.fold_in(root, i + 1)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (n, 1), jnp.float64)
        state = lra.update_lra_newton(state, v, h @ v, ku, lr=0.5, damping=0.0)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(4000))
    # d^2 ~ 1/hdiag
    np.testing.assert_allclose(np.asarray(state.d[:, 0] ** 2),
                               np.asarray(1.0 / hdiag), rtol=0.3)
    assert float(jnp.linalg.norm(state.u)) == 0.0 or state.u.shape[1] == 0


def test_lra_init_validates_rank():
    with pytest.raises(ValueError):
        lra.init_lra(10, 10, jax.random.key(0))


@pytest.mark.parametrize("dq", ["EQ", "QEP", "QEQ", "QUAD", "Q0.5EQ1.5",
                                "QUAD4P", "PRO4P"])
def test_dense_fixed_point(dq):
    n = 10
    a = jax.random.normal(jax.random.key(5), (n, n), jnp.float64) / n ** 0.5
    evals = jnp.diag(10.0 ** jnp.linspace(-1, 1, n))
    qm, _ = jnp.linalg.qr(a)
    h = qm @ evals @ qm.T
    n_iters = 2000
    root = jax.random.key(zlib.crc32(f"dense/{dq}".encode()))
    state = dense.init_dense(n, 1.0, dq, jnp.float64)

    def step(state, i):
        k = jax.random.fold_in(root, i + 1)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (n, 1), jnp.float64)
        g = h @ v
        lr = (1.0 - i / n_iters) / 2.0
        state = dense.update_dense(state, v, g, ku, dq, lr=lr, damping=0.0)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(n_iters))

    errs, scales = [], []
    for t in range(8):
        v = jax.random.normal(jax.random.fold_in(root, n_iters + 2 + t), (n, 1), jnp.float64)
        pg = dense.precond_grad(state, h @ v, dq)
        errs.append(float(jnp.sum((pg - v) ** 2)))
        scales.append(float(jnp.sum(v ** 2)))
    err = (sum(errs) / sum(scales)) ** 0.5
    assert err < 0.25, f"dense/{dq}: relative error {err}"


def test_dense_whiten_fixed_point():
    # whitening on G = H v implies P -> H^-1 (E[GG^T] = H^2)
    n = 8
    h = jnp.diag(10.0 ** jnp.linspace(-0.5, 0.5, n))
    n_iters = 3000
    root = jax.random.key(11)
    state = dense.init_dense(n, 1.0, "Q0.5EQ1.5", jnp.float64)

    def step(state, i):
        k = jax.random.fold_in(root, i + 1)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (n, 1), jnp.float64)
        lr = (1.0 - i / n_iters) / 2.0
        state = dense.update_dense_whiten(state, h @ v, ku, "Q0.5EQ1.5",
                                          lr=lr, damping=0.0)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(n_iters))
    p = state.q.T @ state.q
    np.testing.assert_allclose(np.asarray(p), np.asarray(jnp.linalg.inv(h)),
                               atol=0.15)


def test_lra_log_det_matches_dense():
    """log_det(state) must equal log|det| of the explicit dense Q
    (matrix determinant lemma path)."""
    n, r = 12, 3
    st = lra.init_lra(n, r, jax.random.key(5), 1.3, jnp.float64)
    # randomize so the test is not at the symmetric init
    st = st._replace(
        u=jax.random.normal(jax.random.key(6), (n, r), jnp.float64) * 0.3,
        v=jax.random.normal(jax.random.key(7), (n, r), jnp.float64) * 0.3,
        d=jnp.abs(jax.random.normal(jax.random.key(8), (n, 1), jnp.float64)) + 0.5)
    q_dense = (jnp.eye(n) + st.u @ st.v.T) @ jnp.diag(st.d[:, 0])
    want = jnp.linalg.slogdet(q_dense)[1]
    got = lra.log_det(st)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_lra_log_det_rank0():
    st = lra.init_lra(8, 0, jax.random.key(5), 2.0, jnp.float64)
    np.testing.assert_allclose(float(lra.log_det(st)), 8 * np.log(2.0),
                               rtol=1e-12)
