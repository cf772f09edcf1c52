"""Tests for L0 numerical utilities (model: misc/tightness_of_spectral_norm_bound.py
and the Procrustes-step invariants from reference psgd.py:101-155)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_torch_tpu.ops import linalg

pytestmark = pytest.mark.smoke  # quick tier (<2 min warm cache)


def _rand_spd(key, n, dtype=jnp.float64):
    a = jax.random.normal(key, (n, n), dtype)
    return a @ a.conj().T / n


@pytest.mark.parametrize("n", [8, 64, 300])
@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_norm_lower_bound_spd_is_tight_lower_bound(n, dtype):
    key = jax.random.key(n)
    a = _rand_spd(key, n, dtype)
    true_norm = float(jnp.linalg.norm(a, ord=2))
    bound = float(linalg.norm_lower_bound_spd(a, jax.random.key(1)))
    assert bound <= true_norm * (1 + 1e-9)
    assert bound >= 0.5 * true_norm  # subspace iteration is much tighter in practice


def test_norm_lower_bound_spd_low_rank():
    # rank-1 SPD matrix: the aligned initialization must still find the norm
    key = jax.random.key(7)
    u = jax.random.normal(key, (500, 1), jnp.float64)
    a = u @ u.T
    true_norm = float(jnp.sum(u * u))
    bound = float(linalg.norm_lower_bound_spd(a, jax.random.key(3)))
    assert 0.9 * true_norm <= bound <= true_norm * (1 + 1e-9)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_norm_lower_bound_skh(dtype):
    key = jax.random.key(11)
    a = jax.random.normal(key, (60, 60), dtype)
    a = a - a.conj().T  # skew-Hermitian
    true_norm = float(jnp.linalg.norm(a, ord=2))
    bound = float(linalg.norm_lower_bound_skh(a, jax.random.key(5)))
    assert bound <= true_norm * (1 + 1e-9)
    assert bound >= 0.5 * true_norm


def test_legacy_norm_lower_bound():
    # ||A|| <= sqrt(2) * bound claim (preconditioned...py:73-75)
    for seed in range(5):
        a = jax.random.normal(jax.random.key(seed), (50, 70), jnp.float64)
        bound = float(linalg.norm_lower_bound(a))
        true_norm = float(jnp.linalg.norm(a, ord=2))
        assert bound <= true_norm * (1 + 1e-9)
        assert true_norm <= np.sqrt(2) * bound * (1 + 1e-9)
    assert float(linalg.norm_lower_bound(jnp.zeros((4, 4)))) == 0.0


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_procrustes_step2_drives_q_to_spd(dtype):
    # rotations preserve singular values and drive Q toward SPD
    key = jax.random.key(2)
    q = _rand_spd(key, 20, dtype) + 5 * jnp.eye(20, dtype=dtype)
    # rotate Q away from symmetry with a random det-positive orthogonal matrix
    w = jax.random.normal(jax.random.key(3), (20, 20), dtype)
    u, _, vt = jnp.linalg.svd(w)
    rot = u @ vt
    if not jnp.issubdtype(dtype, jnp.complexfloating):
        # ensure det(rot) > 0 so SO(n) rotations can reach SPD
        det = jnp.linalg.det(rot)
        rot = rot.at[0].multiply(jnp.sign(det))
    q0 = rot @ q
    sv0 = jnp.linalg.svd(q0, compute_uv=False)

    qq = q0
    for i in range(100):
        qq = linalg.procrustes_step2(qq, jax.random.key(100 + i))
    asym = float(jnp.max(jnp.abs(qq.conj().T - qq)) / jnp.max(jnp.abs(qq)))
    asym0 = float(jnp.max(jnp.abs(q0.conj().T - q0)) / jnp.max(jnp.abs(q0)))
    assert asym < 0.05 * asym0
    # singular values approximately preserved (2nd-order truncation error)
    sv = jnp.linalg.svd(qq, compute_uv=False)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(sv0), rtol=2e-2)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_procrustes_loop3_symmetrizes(dtype):
    key = jax.random.key(4)
    q = _rand_spd(key, 16, dtype) + 3 * jnp.eye(16, dtype=dtype)
    w = jax.random.normal(jax.random.key(5), (16, 16), dtype) * 0.2
    q0 = q + (w - w.conj().T)  # perturb away from Hermitian
    qq = q0
    for i in range(5):
        qq = linalg.procrustes_loop3(qq, jax.random.key(i))
    asym = float(jnp.max(jnp.abs(qq.conj().T - qq)) / jnp.max(jnp.abs(qq)))
    assert asym < 2e-3


def test_procrustes_step3_noop_when_hermitian():
    q = _rand_spd(jax.random.key(6), 10) + jnp.eye(10)
    q2 = linalg.procrustes_step3(q, jax.random.key(7))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-12)


def test_woodbury_identity():
    key = jax.random.key(8)
    a = _rand_spd(key, 12) + jnp.eye(12)
    u = jax.random.normal(jax.random.key(9), (12, 2))
    v = jax.random.normal(jax.random.key(10), (2, 12))
    inv_a = jnp.linalg.inv(a)
    got = linalg.woodbury_identity(inv_a, u, v)
    want = jnp.linalg.inv(a + u @ v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-8)


def test_damped_pair_vg():
    g = jax.random.normal(jax.random.key(12), (100,))
    v, gd = linalg.damped_pair_vg(g, jax.random.key(13))
    assert v.shape == g.shape
    np.testing.assert_allclose(
        np.asarray(gd), np.asarray(g + 2 ** -13 * jnp.mean(jnp.abs(g)) * v), rtol=1e-12)


def test_sgn_complex_and_real():
    z = jnp.array([3 + 4j, 0j, -1j])
    np.testing.assert_allclose(np.asarray(linalg.sgn(z)),
                               np.array([0.6 + 0.8j, 0, -1j]), atol=1e-12)
    x = jnp.array([-2.0, 0.0, 5.0])
    np.testing.assert_allclose(np.asarray(linalg.sgn(x)), np.array([-1.0, 0.0, 1.0]))
