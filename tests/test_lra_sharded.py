"""ZeRO-style sharded global LRA: the (n, r) preconditioner row-sharded over
a mesh axis, fit + apply under shard_map with r-sized collectives only
(precond/lra.py module docstring; no reference counterpart — the reference
LRA classes, psgd.py:1075-1330, are single-process)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as PS

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.optim.hvp import make_hvp_fn
from psgd_torch_tpu.parallel import lra_state_specs, make_mesh
from psgd_torch_tpu.precond import lra as lra_p
from psgd_torch_tpu.utils.compat import shard_map

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 simulated devices")


def _mesh():
    return make_mesh(8, axis_names=("fsdp",))


_ST_SPECS = lra_p.LRAState(u=PS("fsdp", None), v=PS("fsdp", None),
                           d=PS("fsdp", None), lu=PS(), lv=PS(), ld=PS())


def test_core_update_matches_plain():
    """update_lra / precond_grad / log_det under shard_map with psum
    reductions equal the single-device computation (reduction-order
    tolerance)."""
    n, r = 48, 4
    st = lra_p.init_lra(n, r, jax.random.PRNGKey(0), dtype=jnp.float64)
    kv, kh, ku = jax.random.split(jax.random.PRNGKey(1), 3)
    v = jax.random.normal(kv, (n, 1))
    h = 3.0 * jax.random.normal(kh, (n, 1))

    plain = st
    for _ in range(3):
        plain = lra_p.update_lra(plain, v, h, ku)

    mesh = _mesh()
    upd = shard_map(
        lambda s, vv, hh, kk: lra_p.update_lra(s, vv, hh, kk,
                                               axis_name="fsdp"),
        mesh=mesh, in_specs=(_ST_SPECS, PS("fsdp", None), PS("fsdp", None),
                             PS()),
        out_specs=_ST_SPECS)
    sh = st
    for _ in range(3):
        sh = jax.jit(upd)(sh, v, h, ku)

    for name in ("u", "v", "d", "lu", "lv", "ld"):
        np.testing.assert_allclose(np.asarray(getattr(plain, name)),
                                   np.asarray(getattr(sh, name)),
                                   rtol=1e-5, atol=1e-6)

    ap = shard_map(
        lambda s, g: lra_p.precond_grad(s, g, axis_name="fsdp"),
        mesh=mesh, in_specs=(_ST_SPECS, PS("fsdp", None)),
        out_specs=PS("fsdp", None))
    np.testing.assert_allclose(np.asarray(lra_p.precond_grad(plain, h)),
                               np.asarray(jax.jit(ap)(sh, h)),
                               rtol=1e-5, atol=1e-6)

    ld = shard_map(lambda s: lra_p.log_det(s, axis_name="fsdp"),
                   mesh=mesh, in_specs=(_ST_SPECS,), out_specs=PS())
    np.testing.assert_allclose(float(lra_p.log_det(plain)),
                               float(jax.jit(ld)(sh)), rtol=1e-5)


def test_padded_rows_are_exact_noops():
    """pad_lra_state rows (U/V = 0, d = 1) never move under the update and
    never change the true rows."""
    n, r, extra = 20, 3, 12
    st = lra_p.init_lra(n, r, jax.random.PRNGKey(0), dtype=jnp.float64)
    kv, kh, ku = jax.random.split(jax.random.PRNGKey(1), 3)
    v = jax.random.normal(kv, (n, 1))
    h = jax.random.normal(kh, (n, 1))

    plain = lra_p.update_lra(st, v, h, ku)
    pad_st = lra_p.pad_lra_state(st, extra)
    vp = jnp.pad(v, ((0, extra), (0, 0)))
    hp = jnp.pad(h, ((0, extra), (0, 0)))
    padded = lra_p.update_lra(pad_st, vp, hp, ku)

    np.testing.assert_array_equal(np.asarray(padded.u[:n]),
                                  np.asarray(plain.u))
    np.testing.assert_array_equal(np.asarray(padded.d[:n]),
                                  np.asarray(plain.d))
    assert float(jnp.max(jnp.abs(padded.u[n:]))) == 0.0
    assert float(jnp.max(jnp.abs(padded.v[n:]))) == 0.0
    np.testing.assert_array_equal(np.asarray(padded.d[n:]),
                                  np.ones((extra, 1), np.float64))
    # preconditioned output on the true rows is unchanged too
    np.testing.assert_array_equal(
        np.asarray(lra_p.precond_grad(padded, hp)[:n]),
        np.asarray(lra_p.precond_grad(plain, h)))


def _problem():
    """Ill-conditioned quadratic over a small tree (47 params: deliberately
    NOT divisible by 8, so the sharded path pads)."""
    hess = 10.0 ** jnp.linspace(-2, 1, 40)
    t_star = jax.random.normal(jax.random.key(2), (40,))
    b_star = jnp.ones((7,))

    def loss(p):
        return (0.5 * jnp.sum(hess * (p["w"] - t_star) ** 2)
                + 0.5 * jnp.sum((p["b"] - b_star) ** 2))

    params = {"w": jnp.zeros((40,)), "b": jnp.zeros((7,))}
    return loss, params


@pytest.mark.slow
def test_whiten_transform_sharded_converges_and_state_stays_sharded():
    mesh = _mesh()
    loss, params = _problem()
    opt = popt.lra_whiten(learning_rate=0.5, rank_of_approximation=4,
                          preconditioner_init_scale=1.0,
                          vector_sharding=(mesh, "fsdp"), momentum=0.9)
    state = opt.init(params)
    specs = lra_state_specs(state, "fsdp")
    # n=47 pads to 48 rows
    assert state[0].precond.u.shape == (48, 4)

    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PS))
    state = jax.device_put(state, shardings)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    p = params
    l0 = float(loss(p))
    for _ in range(300):
        p, state = step(p, state)
        # sync every step: async dispatch of many collective programs can
        # exhaust the CPU-sim device thread pool mid-rendezvous (XLA-CPU
        # emulation artifact, not a sharding property)
        jax.block_until_ready(state)
    assert float(loss(p)) < 1e-3 * l0
    # pad row invariants survived 300 steps
    prec = state[0].precond
    assert float(jnp.max(jnp.abs(prec.u[47:]))) == 0.0
    assert float(prec.d[47, 0]) == 1.0
    # state leaves actually carry the row sharding
    assert prec.u.sharding.spec[0] == "fsdp"
    assert state[0].mu.sharding.spec[0] == "fsdp"


@pytest.mark.slow
def test_newton_transform_sharded_matches_plain_with_explicit_vh():
    """With explicit (vs, hvs) the only stochastic difference vs the plain
    transform is the damping dither (1e-9-scale), so trajectories must agree
    tightly for several steps."""
    mesh = _mesh()
    loss, params = _problem()
    kw = dict(learning_rate=0.05, rank_of_approximation=4,
              preconditioner_init_scale=1.0)
    plain = popt.lra_newton(**kw)
    sh = popt.lra_newton(vector_sharding=(mesh, "fsdp"), **kw)
    s_p, s_s = plain.init(params), sh.init(params)

    hvp_fn = make_hvp_fn(loss)
    # explicit vh: drive both .update calls directly
    p_p, p_s = params, params
    key = jax.random.key(7)
    for i in range(10):
        key, kv = jax.random.split(key)
        vs = jax.tree_util.tree_map(
            lambda x, k=kv: jax.random.normal(k, x.shape, x.dtype), params)
        _, hvs = hvp_fn(p_p, vs)
        g_p = jax.grad(loss)(p_p)
        up, s_p = plain.update(g_p, s_p, p_p, vs=vs, hvs=hvs)
        p_p = optax.apply_updates(p_p, up)
        g_s = jax.grad(loss)(p_s)
        _, hvs_s = hvp_fn(p_s, vs)
        us, s_s = sh.update(g_s, s_s, p_s, vs=vs, hvs=hvs_s)
        p_s = optax.apply_updates(p_s, us)

    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(p_p[k]), np.asarray(p_s[k]),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_newton_transform_sharded_hvp_fn_converges():
    """hvp_fn path: the Hvp cond sits outside the shard_map; the optimizer
    still reaches the optimum of the ill-conditioned quadratic."""
    mesh = _mesh()
    loss, params = _problem()
    opt = popt.lra_newton(learning_rate=0.5, rank_of_approximation=8,
                          preconditioner_init_scale=1.0,
                          grad_clip_max_norm=10.0,
                          preconditioner_update_probability=0.5,
                          vector_sharding=(mesh, "fsdp"))
    state = opt.init(params)
    hvp_fn = make_hvp_fn(loss)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        up, s = opt.update(g, s, p, hvp_fn=hvp_fn)
        return optax.apply_updates(p, up), s

    p = params
    l0 = float(loss(p))
    for _ in range(300):
        p, state = step(p, state)
        jax.block_until_ready(state)  # see note in the whiten test
    assert float(loss(p)) < 1e-4 * l0
