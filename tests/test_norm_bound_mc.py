"""Monte-Carlo tightness tests for the spectral-norm lower bounds.

Model: misc/tightness_of_spectral_norm_bound.py — over several random-matrix
ensembles and sizes, the legacy bound satisfies
``bound <= ||A||_2 <= sqrt(2) * bound`` with high probability (the reference
observes the ratio rarely exceeding 1.4).  The new subspace-iteration bounds
(norm_lower_bound_spd / _skh) are genuine lower bounds that are empirically
tight (>= 0.9 ||A||) for k = 32 on the sizes PSGD uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest

pytestmark = _pytest.mark.slow

from psgd_torch_tpu.ops.linalg import (
    norm_lower_bound,
    norm_lower_bound_skh,
    norm_lower_bound_spd,
)


def _ensemble(name, key, shape):
    if name == "randn":
        return jax.random.normal(key, shape, jnp.float64)
    if name == "uniform":
        return jax.random.uniform(key, shape, jnp.float64)
    if name == "exp":
        return jnp.exp(3.0 * jax.random.normal(key, shape, jnp.float64))
    if name == "lowrank":
        k1, k2 = jax.random.split(key)
        u = jax.random.normal(k1, (shape[0], 2), jnp.float64)
        v = jax.random.normal(k2, (2, shape[1]), jnp.float64)
        return u @ v
    if name == "outlier":
        a = jax.random.normal(key, shape, jnp.float64)
        return a.at[0, 0].set(1e6)
    raise ValueError(name)


ENSEMBLES = ["randn", "uniform", "exp", "lowrank", "outlier"]


@pytest.mark.parametrize("name", ENSEMBLES)
@pytest.mark.parametrize("n", [10, 100])
def test_legacy_bound_tightness(name, n):
    """bound <= ||A|| <= sqrt(2) * bound across ensembles (legacy bound,
    reference preconditioned...py:73-75)."""
    for trial in range(20):
        a = _ensemble(name, jax.random.fold_in(jax.random.key(trial), n),
                      (n, n))
        true = float(jnp.linalg.norm(a, 2))
        est = float(norm_lower_bound(a))
        assert est <= true * (1 + 1e-10), (name, trial, est, true)
        assert true <= 2 ** 0.5 * est * (1 + 1e-10), (name, trial, est, true)


def test_legacy_bound_zero_matrix():
    assert float(norm_lower_bound(jnp.zeros((5, 5), jnp.float64))) == 0.0


@pytest.mark.parametrize("n", [8, 64, 256])
def test_spd_bound_is_tight_lower_bound(n):
    for trial in range(10):
        key = jax.random.fold_in(jax.random.key(100 + trial), n)
        a = jax.random.normal(key, (n, n), jnp.float64) / n ** 0.5
        spd = a @ a.T + 0.01 * jnp.eye(n)
        true = float(jnp.linalg.norm(spd, 2))
        est = float(norm_lower_bound_spd(spd, jax.random.fold_in(key, 1)))
        assert est <= true * (1 + 1e-9), (trial, est, true)
        assert est >= 0.85 * true, (trial, est, true)


def test_spd_bound_low_rank_robustness():
    """The centroid-rotation init keeps the bound tight for very low-rank SPD
    matrices (reference psgd.py:52-56)."""
    n = 200
    key = jax.random.key(7)
    u = jax.random.normal(key, (n, 1), jnp.float64)
    spd = u @ u.T  # rank one
    true = float(jnp.linalg.norm(spd, 2))
    est = float(norm_lower_bound_spd(spd, jax.random.fold_in(key, 1)))
    assert 0.95 * true <= est <= true * (1 + 1e-9), (est, true)


@pytest.mark.parametrize("n", [8, 64])
def test_skh_bound_is_tight_lower_bound(n):
    for trial in range(10):
        key = jax.random.fold_in(jax.random.key(200 + trial), n)
        a = jax.random.normal(key, (n, n), jnp.float64)
        skh = a - a.T
        true = float(jnp.linalg.norm(skh, 2))
        est = float(norm_lower_bound_skh(skh, jax.random.fold_in(key, 1)))
        assert est <= true * (1 + 1e-9), (trial, est, true)
        assert est >= 0.85 * true, (trial, est, true)


def test_spd_bound_extreme_scale():
    """No inf/nan for matrices near the fp32 overflow/underflow boundary
    (the reference normalizes by the max diagonal for exactly this,
    psgd.py:58-60)."""
    n = 16
    key = jax.random.key(9)
    a = jax.random.normal(key, (n, n), jnp.float32) / n ** 0.5
    spd = a @ a.T + jnp.eye(n)
    for scale in (1e30, 1e-30):
        est = float(norm_lower_bound_spd(spd * scale, jax.random.fold_in(key, 1)))
        true = float(jnp.linalg.norm((spd * scale).astype(jnp.float64), 2))
        assert np.isfinite(est), scale
        assert est <= true * (1 + 1e-6) and est >= 0.8 * true, (est, true)
