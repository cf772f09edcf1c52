"""The layer-batched stacked Kron updates must match vmap of the per-tensor
updates exactly (CPU threefry path: identical key streams by construction).

The stacked variants exist for TPU launch efficiency only — one fused-kernel
launch per dense factor instead of a serial per-layer loop, hardware-PRNG
noise — and must be a pure lowering change, not a math change.
"""

import jax
import jax.numpy as jnp
import pytest

from psgd_torch_tpu.precond import kron as kron_p

import pytest as _pytest

pytestmark = _pytest.mark.slow

B = 3
CASES = [
    ((16, 24), 10.0),   # dense x dense
    ((16, 48), 0.5),    # dense x diag
    ((8,), 1.0),        # single diag factor (bias-like)
    ((4, 6, 8), 10.0),  # order 3, all dense
]


def _stacked_state(plan, dtype=jnp.float32):
    st0 = kron_p.init_kron_from_plan(plan, 1.0, dtype)
    return jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim), st0)


def _assert_equal(a, b, tol=1e-6):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert float(jnp.max(jnp.abs(x - y))) < tol


@pytest.mark.parametrize("shape,max_skew", CASES)
def test_whiten_stacked_matches_vmap(shape, max_skew):
    key = jax.random.key(0)
    plan = kron_p.make_kron_plan(shape, max_skew=max_skew)
    st = _stacked_state(plan)
    g = jax.random.normal(jax.random.fold_in(key, 1), (B,) + shape)
    keys = jax.random.split(jax.random.fold_in(key, 2), B)
    ref = jax.vmap(lambda s, gg, kk: kron_p.update_kron_whiten(
        s, plan, gg, kk, 0.1, 0.9, 1e-9, 8))(st, g, keys)
    new = kron_p.update_kron_whiten_stacked(st, plan, g, keys, 0.1, 0.9,
                                            1e-9, 8)
    _assert_equal(ref, new)


@pytest.mark.parametrize("shape,max_skew", CASES)
def test_newton_stacked_matches_vmap(shape, max_skew):
    key = jax.random.key(3)
    plan = kron_p.make_kron_plan(shape, max_skew=max_skew)
    st = _stacked_state(plan)
    v = jax.random.normal(jax.random.fold_in(key, 1), (B,) + shape)
    h = jax.random.normal(jax.random.fold_in(key, 2), (B,) + shape)
    keys = jax.random.split(jax.random.fold_in(key, 4), B)
    ref = jax.vmap(lambda s, vv, hh, kk: kron_p.update_kron_newton(
        s, plan, vv, hh, kk, 0.1, 0.9, 1e-9, 8))(st, v, h, keys)
    new = kron_p.update_kron_newton_stacked(st, plan, v, h, keys, 0.1, 0.9,
                                            1e-9, 8)
    _assert_equal(ref, new)


def test_stacked_layer_independence():
    """Layer i's stacked-update result depends only on (state[i], g[i],
    keys[i]) — the property that makes stack sharding bitwise-equal to the
    replicated run regardless of shard composition."""
    key = jax.random.key(7)
    shape = (16, 24)
    plan = kron_p.make_kron_plan(shape, max_skew=10.0)
    st = _stacked_state(plan)
    g = jax.random.normal(jax.random.fold_in(key, 1), (B,) + shape)
    keys = jax.random.split(jax.random.fold_in(key, 2), B)
    full = kron_p.update_kron_whiten_stacked(st, plan, g, keys, 0.1, 0.9,
                                             1e-9, 8)
    sub = kron_p.update_kron_whiten_stacked(
        jax.tree_util.tree_map(lambda x: x[1:2], st), plan, g[1:2], keys[1:2],
        0.1, 0.9, 1e-9, 8)
    _assert_equal(jax.tree_util.tree_map(lambda x: x[1:2], full), sub)


def test_non_default_dq_falls_back():
    """Non-Q0.5EQ1.5 geometries route through vmap and stay correct."""
    key = jax.random.key(9)
    shape = (12, 12)
    plan = kron_p.make_kron_plan(shape, max_skew=10.0, dq="QEQ")
    st = _stacked_state(plan)
    g = jax.random.normal(jax.random.fold_in(key, 1), (B,) + shape)
    keys = jax.random.split(jax.random.fold_in(key, 2), B)
    ref = jax.vmap(lambda s, gg, kk: kron_p.update_kron_whiten(
        s, plan, gg, kk, 0.1, 0.9, 1e-9, 8))(st, g, keys)
    new = kron_p.update_kron_whiten_stacked(st, plan, g, keys, 0.1, 0.9,
                                            1e-9, 8)
    _assert_equal(ref, new)


def test_all_scalar_hyperparameters_schedulable():
    """betaL, damping, and the clip amps accept optax-style schedules
    (reference contract: every scalar hyperparameter mutable on the fly,
    misc/gpt2.py:440, misc/vit.py:362-363)."""
    import optax
    import psgd_torch_tpu.optim as popt

    params = {"w": jnp.zeros((8, 4))}
    g = {"w": jax.random.normal(jax.random.key(11), (8, 4))}
    tx = popt.scale_by_kron_whiten(
        preconditioner_init_scale=1.0,
        lr_preconditioner=optax.linear_schedule(0.5, 0.1, 10),
        betaL=optax.constant_schedule(0.9),
        damping=optax.constant_schedule(1e-9),
        grad_clip_max_amps=(optax.constant_schedule(2.0), lambda c: 10.0),
        preconditioner_update_probability=lambda c: 1.0)
    state = tx.init(params)
    u, state = jax.jit(tx.update)(g, state)
    u, state = jax.jit(tx.update)(g, state)
    assert jnp.all(jnp.isfinite(u["w"]))

    tx_n = popt.scale_by_kron_newton(
        preconditioner_init_scale=1.0,
        betaL=optax.constant_schedule(0.9),
        damping=optax.constant_schedule(1e-9),
        grad_clip_max_norm=optax.constant_schedule(5.0))
    state = tx_n.init(params)

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2)

    from psgd_torch_tpu.optim.hvp import make_hvp_fn
    u, state = jax.jit(lambda g, s, p: tx_n.update(
        g, s, p, hvp_fn=make_hvp_fn(loss_fn)))(g, state, params)
    assert jnp.all(jnp.isfinite(u["w"]))
