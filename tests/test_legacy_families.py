"""Fixed-point tests for the legacy preconditioner families: affine (all
four side combinations + drop-v), XMat, SPLU, legacy matrix-Kron kernels,
legacy dense, Woodbury-inverse Newton, legacy UVd.

Protocol as in misc/psgd_kron_verification.py: feed (v, h = H v) pairs (or
(randn, g = H v) for whitening) and assert |Pg - v| gets small relative to
the P = I error on an ill-conditioned H.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_torch_tpu.precond import affine, legacy, splu, xmat

import pytest as _pytest

pytestmark = _pytest.mark.slow


def _key(s):
    return jax.random.key(zlib.crc32(s.encode()))


def _rel_err(apply_fn, h_apply, shape, root, probes=8):
    errs, scales = [], []
    for t in range(probes):
        v = jax.random.normal(jax.random.fold_in(root, 10_000 + t), shape,
                              jnp.float64)
        g = h_apply(v)
        pg = apply_fn(g)
        errs.append(float(jnp.sum((pg - v) ** 2)))
        scales.append(float(jnp.sum(v ** 2)))
    return (sum(errs) / sum(scales)) ** 0.5


def _kron_h(key, m, n, l_dense=True, r_dense=True):
    def spd(k, s):
        a = jax.random.normal(k, (s, s), jnp.float64) / s ** 0.5
        q, _ = jnp.linalg.qr(a)
        e = jnp.diag(10.0 ** jnp.linspace(-0.7, 0.7, s))
        return q @ e @ q.T

    def diag(k, s):
        return 10.0 ** (1.4 * jax.random.uniform(k, (s,), jnp.float64) - 0.7)

    hl = spd(jax.random.fold_in(key, 0), m) if l_dense else jnp.diag(
        diag(jax.random.fold_in(key, 0), m))
    hr = spd(jax.random.fold_in(key, 1), n) if r_dense else jnp.diag(
        diag(jax.random.fold_in(key, 1), n))
    return lambda v: hl @ v @ hr


@pytest.mark.parametrize("sides", [("dense", "dense"), ("dense", "diag"),
                                   ("diag", "dense"), ("diag", "diag")])
@pytest.mark.parametrize("normalizer", ["1st", "2nd"])
def test_affine_newton_fixed_point(sides, normalizer):
    m, n = 8, 6
    h_apply = _kron_h(_key(f"affine{sides}"), m, n,
                      l_dense=(sides[0] == "dense"),
                      r_dense=(sides[1] == "dense"))
    max_size = float("inf")
    state = affine.init_affine((m, n), 1.0, max_size=max_size, dtype=jnp.float64)
    if sides[0] == "diag":
        state = state._replace(ql=jnp.ones((m,), jnp.float64))
    if sides[1] == "diag":
        state = state._replace(qr=jnp.ones((n,), jnp.float64))
    root = _key(f"affine-run{sides}{normalizer}")
    n_iters = 3000

    def step(state, i):
        k = jax.random.fold_in(root, i)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (m, n), jnp.float64)
        g = h_apply(v)
        state = affine.update_affine(state, v, g, ku, lr=0.05,
                                     step_normalizer=normalizer)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(n_iters))
    err = _rel_err(lambda g: affine.precond_grad_affine(state, g), h_apply,
                   (m, n), root)
    # for exactly-Kron H only the dense/dense form can drive the error to ~0;
    # diagonal sides can only match diagonal H structure
    tol = 0.25
    assert err < tol, f"affine{sides}/{normalizer}: {err}"


def test_affine_dropv_whitening():
    m, n = 8, 6
    h_apply = _kron_h(_key("dropv"), m, n, l_dense=False, r_dense=False)
    state = affine.AffineState(ql=jnp.ones((m,), jnp.float64),
                               qr=jnp.ones((n,), jnp.float64))
    root = _key("dropv-run")

    def step(state, i):
        k = jax.random.fold_in(root, i)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (m, n), jnp.float64)
        g = h_apply(v)
        state = affine.update_affine_dropv(state, g, ku, lr=0.05)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(4000))
    err = _rel_err(lambda g: affine.precond_grad_affine(state, g), h_apply,
                   (m, n), root)
    assert err < 0.3, f"affine dropv: {err}"


def test_matrixizer_plans():
    p = affine.matrixizer((2, 3, 5, 7, 11))
    t = jax.random.normal(jax.random.key(0), (2, 3, 5, 7, 11))
    m = affine.to_matrix(p, t)
    assert m.shape == p.matrix_shape
    np.testing.assert_array_equal(np.asarray(affine.from_matrix(p, m)),
                                  np.asarray(t))
    # optimum for (2,3,5,7,11): 42x55 split (reference docstring :1426)
    assert sorted(p.matrix_shape) == [42, 55]
    assert affine.matrixizer((10,)).matrix_shape == (1, 10)
    assert affine.matrixizer(()).matrix_shape == (1, 1)
    assert affine.matrixizer((4, 6)).matrix_shape == (4, 6)


@pytest.mark.parametrize("normalizer", ["1st", "2nd"])
def test_xmat_fixed_point(normalizer):
    n = 16
    key = _key("xmat")
    a_true = 10.0 ** (1.4 * jax.random.uniform(key, (n,), jnp.float64) - 0.7)
    h_apply = lambda v: a_true * v
    state = xmat.init_xmat(n, 1.0, jnp.float64)
    root = _key("xmat-run" + normalizer)

    def step(state, i):
        v = jax.random.normal(jax.random.fold_in(root, i), (n,), jnp.float64)
        state = xmat.update_xmat(state, v, h_apply(v), lr=0.05,
                                 step_normalizer=normalizer)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(3000))
    err = _rel_err(lambda g: xmat.precond_grad_xmat(state, g), h_apply, (n,), root)
    assert err < 0.15, f"xmat/{normalizer}: {err}"


def test_xmat_antidiagonal_structure():
    """XMat must beat a pure diagonal fit when H has anti-diagonal coupling."""
    n = 8
    key = _key("xmat-anti")
    q = jnp.eye(n) * 1.0 + 0.4 * jnp.fliplr(jnp.eye(n))
    h = q @ q.T  # SPD with anti-diagonal structure
    h_apply = lambda v: h @ v
    state = xmat.init_xmat(n, 1.0, jnp.float64)
    root = _key("xmat-anti-run")

    def step(state, i):
        v = jax.random.normal(jax.random.fold_in(root, i), (n,), jnp.float64)
        state = xmat.update_xmat(state, v, h_apply(v), lr=0.05)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(4000))
    err = _rel_err(lambda g: xmat.precond_grad_xmat(state, g), h_apply, (n,), root)
    assert err < 0.15, f"xmat anti-diag: {err}"
    assert float(jnp.max(jnp.abs(state.b))) > 0.01  # used the anti-diagonal


def test_splu_fixed_point():
    n, r = 12, 4
    key = _key("splu")
    a = jax.random.normal(key, (n, n), jnp.float64) / n ** 0.5
    q, _ = jnp.linalg.qr(a)
    h = q @ jnp.diag(10.0 ** jnp.linspace(-0.7, 0.7, n)) @ q.T
    h_apply = lambda v: h @ v
    state = splu.init_splu(n, r, 1.0, jnp.float64)
    root = _key("splu-run")

    def step(state, i):
        v = jax.random.normal(jax.random.fold_in(root, i), (n,), jnp.float64)
        state = splu.update_splu(state, v, h_apply(v), lr=0.02)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(6000))
    err = _rel_err(lambda g: splu.precond_grad_splu(state, g),
                   h_apply, (n,), root)
    assert err < 0.3, f"splu: {err}"


@pytest.mark.parametrize("kinds", [("dense", "dense"), ("norm", "dense"),
                                   ("norm", "scale"), ("dense", "scale"),
                                   ("scale", "dense"), ("scale", "norm")])
def test_legacy_kron_dispatch_fixed_point(kinds):
    m, n = 7, 5
    # H structure matchable by the factor kinds: dense side -> SPD, else diag
    h_apply = _kron_h(_key(f"lk{kinds}"), m, n,
                      l_dense=(kinds[0] == "dense"),
                      r_dense=(kinds[1] == "dense"))
    ql, qr = legacy.init_kron_legacy((m, n), kinds[0], kinds[1], 1.0, jnp.float64)
    root = _key(f"lk-run{kinds}")

    def step(carry, i):
        ql, qr = carry
        v = jax.random.normal(jax.random.fold_in(root, i), (m, n), jnp.float64)
        ql, qr = legacy.update_precond_kron(ql, qr, v, h_apply(v), lr=0.05)
        return (ql, qr), None

    (ql, qr), _ = jax.lax.scan(step, (ql, qr), jnp.arange(4000))
    err = _rel_err(lambda g: legacy.precond_grad_kron(ql, qr, g), h_apply,
                   (m, n), root)
    assert err < 0.3, f"legacy kron {kinds}: {err}"


def test_legacy_dense_fixed_point():
    n = 10
    key = _key("ldense")
    a = jax.random.normal(key, (n, n), jnp.float64) / n ** 0.5
    qm, _ = jnp.linalg.qr(a)
    h = qm @ jnp.diag(10.0 ** jnp.linspace(-0.7, 0.7, n)) @ qm.T
    h_apply = lambda v: h @ v
    q = jnp.eye(n, dtype=jnp.float64)
    root = _key("ldense-run")

    def step(q, i):
        v = jax.random.normal(jax.random.fold_in(root, i), (n,), jnp.float64)
        q = legacy.update_precond_dense(q, v, h_apply(v), lr=0.05)
        return q, None

    q, _ = jax.lax.scan(step, q, jnp.arange(4000))
    err = _rel_err(lambda g: legacy.precond_grad_dense(q, g), h_apply, (n,), root)
    assert err < 0.2, f"legacy dense: {err}"


@pytest.mark.parametrize("normalizer", ["1st", "2nd"])
def test_newton_with_kept_inverse(normalizer):
    n = 10
    key = _key("woodnewton")
    a = jax.random.normal(key, (n, n), jnp.float64) / n ** 0.5
    qm, _ = jnp.linalg.qr(a)
    h = qm @ jnp.diag(10.0 ** jnp.linspace(-0.7, 0.7, n)) @ qm.T
    h_apply = lambda v: h @ v
    state = legacy.init_newton_inv(n, 1.0, jnp.float64)
    root = _key("woodnewton-run" + normalizer)

    def step(state, i):
        v = jax.random.normal(jax.random.fold_in(root, i), (n,), jnp.float64)
        state = legacy.update_newton_inv(state, v, h_apply(v), lr=0.05,
                                         step_normalizer=normalizer)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(4000))
    err = _rel_err(lambda g: legacy.precond_grad_newton_inv(state, g),
                   h_apply, (n,), root)
    assert err < 0.2, f"newton_inv/{normalizer}: {err}"
    # the kept inverse must track inv(Q)
    resid = float(jnp.max(jnp.abs(state.q @ state.inv_q - jnp.eye(n))))
    assert resid < 1e-6, f"inv(Q) drift {resid}"


@pytest.mark.parametrize("normalizer", ["1st", "2nd"])
def test_legacy_uvd_fixed_point(normalizer):
    n, r = 10, 5
    key = _key("uvd")
    u = jax.random.normal(key, (n, r), jnp.float64) / n ** 0.5
    h = jnp.diag(jax.random.uniform(jax.random.fold_in(key, 1), (n,),
                                    jnp.float64)) + u @ u.T
    h_apply = lambda v: h @ v
    state = legacy.init_uvd(n, r, _key("uvd-init"), 1.0, jnp.float64)
    root = _key("uvd-run" + normalizer)

    def step(state, i):
        k = jax.random.fold_in(root, i)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (n,), jnp.float64)
        state = legacy.update_uvd(state, v, h_apply(v), ku,
                                  lr=0.1 if normalizer == "2nd" else 0.01,
                                  step_normalizer=normalizer)
        return state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(15000))
    err = _rel_err(lambda g: legacy.precond_grad_uvd(state, g), h_apply,
                   (n,), root)
    assert err < 0.2, f"uvd/{normalizer}: {err}"


def test_affine_matmul_vs_einsum_equivalence():
    """Implementation-equivalence check (reference
    misc/psgd_affine_matmul_vs_einsum.py:29-77): the library's matmul-based
    affine update must equal an independently written einsum formulation of
    the same math, on the dense x dense branch (precond/affine.py:146-160),
    and the apply must equal kron(conj(Qr), Ql)-as-einsum."""
    from psgd_torch_tpu.precond import affine as affine_p
    from psgd_torch_tpu.precond.affine import AffineState
    from psgd_torch_tpu.ops.linalg import norm_lower_bound

    m, n = 10, 14
    key = jax.random.key(0)
    st = AffineState(
        ql=jnp.triu(0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                            (m, m))) + jnp.eye(m),
        qr=jnp.triu(0.1 * jax.random.normal(jax.random.fold_in(key, 2),
                                            (n, n))) + jnp.eye(n))
    dx = jax.random.normal(jax.random.fold_in(key, 3), (m, n))
    dg = jax.random.normal(jax.random.fold_in(key, 4), (m, n))
    bal_key = jax.random.fold_in(key, 5)

    got = affine_p.update_affine(st, dx, dg, bal_key, lr=0.05,
                                 step_normalizer="2nd")

    # independent einsum formulation (fp64 test dtype: tri solves exact)
    ql, qr = st.ql, st.qr  # balance gate fires w.p. 0.01; same key -> same draw
    u = float(jax.random.uniform(bal_key))
    assert u >= 0.01  # deterministic: gate did not fire for this key
    a = jnp.einsum("ia,ab,cb->ic", ql, dg, jnp.conj(qr))
    inv_ql = jnp.linalg.inv(ql)
    inv_qr = jnp.linalg.inv(qr)
    bh = jnp.einsum("ai,ab,bc->ic", jnp.conj(inv_ql), dx, inv_qr)
    aah = jnp.einsum("ij,kj->ik", a, jnp.conj(a))
    bhb = jnp.einsum("ij,kj->ik", bh, jnp.conj(bh))
    aha = jnp.einsum("ji,jk->ik", jnp.conj(a), a)
    bbh = jnp.einsum("ji,jk->ik", jnp.conj(bh), bh)
    grad1 = jnp.triu(aah - bhb)
    grad2 = jnp.triu(aha - bbh)
    tiny = 1.2e-38
    s1 = 0.05 / (float(norm_lower_bound(aah + bhb)) + tiny)
    s2 = 0.05 / (float(norm_lower_bound(aha + bbh)) + tiny)
    want_ql = ql - s1 * jnp.einsum("ij,jk->ik", grad1, ql)
    want_qr = qr - s2 * jnp.einsum("ij,jk->ik", grad2, qr)

    np.testing.assert_allclose(np.asarray(got.ql), np.asarray(want_ql),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.qr), np.asarray(want_qr),
                               rtol=1e-9, atol=1e-12)

    # apply: precond_grad == einsum of P = kron(conj(Qr), Ql)^H kron(...) g
    g = jax.random.normal(jax.random.fold_in(key, 6), (m, n))
    got_pg = affine_p.precond_grad_affine(st, g)
    want_pg = jnp.einsum(
        "li,lk,ka,jb,ja->ib", jnp.conj(ql), ql, g, jnp.conj(qr), qr)
    np.testing.assert_allclose(np.asarray(got_pg), np.asarray(want_pg),
                               rtol=1e-9, atol=1e-12)
