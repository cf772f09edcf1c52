"""Static p=1.0 specialization (`always_fit`): at a literal update
probability >= 1.0 the fit gate `uniform([0,1)) < 1.0` is statically true,
so the transform drops the lax.cond around the Q fit (a cond lowers to a
separate HLO computation — a scheduling barrier that would forbid
overlapping the pipelined fit with the model's backward pass).

These tests pin the specialization to the cond-gated path it replaces: the
SAME probability supplied as a constant *schedule* (not a literal) still
takes the lax.cond route, so trajectories must match to float equality, for
every fit/apply ordering (unbiased, biased, share_fit_apply, cache_p) and
for pipelined_fit (where the remaining count>0 gate becomes a select and step 0's
dead fit on the zeros momentum buffer must be discarded exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import psgd_torch_tpu.optim as popt

pytestmark = pytest.mark.smoke  # quick tier (<2 min warm cache)


def _problem(key=3):
    w_star = jax.random.normal(jax.random.key(key), (12, 6))

    def loss_fn(p):
        d = p["w"] - w_star
        return 0.5 * jnp.sum(d * d) + jnp.sum(jnp.abs(p["b"]))

    return loss_fn, {"w": jnp.zeros((12, 6)), "b": jnp.zeros(6)}


def _run(opt, loss_fn, params, n=6):
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(n):
        params, state = step(params, state)
    return params


def _const_sched(v):
    # a callable schedule defeats the isinstance(float) specialization and
    # keeps the lax.cond route — the reference trajectory
    return optax.constant_schedule(v)


@pytest.mark.parametrize("kwargs", [
    dict(),                                        # unbiased (default)
    dict(update_preconditioner_first=True),        # biased ordering
    dict(share_fit_apply=True, update_preconditioner_first=False),
    dict(cache_p=True),
    dict(cache_p=True, update_preconditioner_first=True),
    dict(share_fit_apply=True, cache_p=True,
         update_preconditioner_first=False),
])
def test_always_fit_matches_cond_path(kwargs):
    loss_fn, params = _problem()
    common = dict(learning_rate=0.1, momentum=0.9, whiten_grad=False,
                  preconditioner_init_scale=1.0)
    a = popt.kron_whiten(preconditioner_update_probability=1.0,
                         **common, **kwargs)
    b = popt.kron_whiten(preconditioner_update_probability=_const_sched(1.0),
                         **common, **kwargs)
    pa, pb = _run(a, loss_fn, params), _run(b, loss_fn, params)
    for la, lb in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        # same math, but XLA fuses the inlined fit differently than the
        # cond-wrapped one: reassociation-level differences only
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("cache_p", [False, True])
@pytest.mark.parametrize("biased", [False, True])
def test_always_fit_pipelined_matches_cond_path(cache_p, biased):
    loss_fn, params = _problem()
    common = dict(learning_rate=0.1, momentum=0.9, whiten_grad=False,
                  preconditioner_init_scale=1.0, pipelined_fit=True,
                  cache_p=cache_p, update_preconditioner_first=biased)
    a = popt.kron_whiten(preconditioner_update_probability=1.0, **common)
    b = popt.kron_whiten(preconditioner_update_probability=_const_sched(1.0),
                         **common)
    pa, pb = _run(a, loss_fn, params), _run(b, loss_fn, params)
    for la, lb in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        # same math, but XLA fuses the inlined fit differently than the
        # cond-wrapped one: reassociation-level differences only
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-9)
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(pa))


def test_always_fit_drops_the_fit_cond():
    """The jitted step at a literal p=1.0 (non-pipelined, no balance gate
    interference checked — the 0.01-probability balance cond remains) must
    contain one fewer `cond` primitive than the schedule-1.0 build."""
    loss_fn, params = _problem()

    def n_conds(opt):
        def step(params, state, grads):
            updates, state = opt.update(grads, state, params)
            return updates, state
        grads = jax.grad(loss_fn)(params)
        jaxpr = jax.make_jaxpr(step)(params, opt.init(params), grads)
        return str(jaxpr).count("cond[")

    common = dict(learning_rate=0.1, momentum=0.9, whiten_grad=False,
                  preconditioner_init_scale=1.0)
    n_lit = n_conds(popt.kron_whiten(
        preconditioner_update_probability=1.0, **common))
    n_sched = n_conds(popt.kron_whiten(
        preconditioner_update_probability=_const_sched(1.0), **common))
    assert n_lit < n_sched, (n_lit, n_sched)


def _tree_close(pa, pb):
    for la, lb in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-9)


def _run_newton(opt, loss_fn, params, n=6):
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params,
                                    hvp_fn=popt.make_hvp_fn(loss_fn))
        return optax.apply_updates(params, updates), state

    for _ in range(n):
        params, state = step(params, state)
    return params


@pytest.mark.parametrize("family", ["kron_newton", "lra_newton",
                                    "dense_newton"])
def test_always_fit_newton_families_match_cond_path(family):
    loss_fn, params = _problem()
    make = getattr(popt, family)
    kw = dict(learning_rate=0.05, preconditioner_init_scale=1.0)
    a = make(preconditioner_update_probability=1.0, **kw)
    b = make(preconditioner_update_probability=_const_sched(1.0), **kw)
    _tree_close(_run_newton(a, loss_fn, params),
                _run_newton(b, loss_fn, params))


def test_always_fit_lra_whiten_matches_cond_path():
    loss_fn, params = _problem()
    kw = dict(learning_rate=0.05, momentum=0.9, whiten_grad=False,
              preconditioner_init_scale=1.0)
    a = popt.lra_whiten(preconditioner_update_probability=1.0, **kw)
    b = popt.lra_whiten(preconditioner_update_probability=_const_sched(1.0),
                        **kw)
    _tree_close(_run(a, loss_fn, params), _run(b, loss_fn, params))


def test_always_fit_lra_whiten_sharded_matches_cond_path():
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("z",))
    loss_fn, params = _problem()
    kw = dict(learning_rate=0.05, momentum=0.9, whiten_grad=False,
              preconditioner_init_scale=1.0, vector_sharding=(mesh, "z"))
    a = popt.lra_whiten(preconditioner_update_probability=1.0, **kw)
    b = popt.lra_whiten(preconditioner_update_probability=_const_sched(1.0),
                        **kw)
    _tree_close(_run(a, loss_fn, params), _run(b, loss_fn, params))


@pytest.mark.parametrize("pipelined", [False, True])
def test_always_fit_stack_sharded_matches_cond_path(pipelined):
    """The routed (layer-sharded shard_map) path must also drop its cond at
    a literal p=1.0 and, under pipelined_fit, discard step 0's dead fit by
    select — pinned against the schedule-1.0 cond route on a 4-device
    mesh."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as PS
    from psgd_torch_tpu.parallel import psgd_state_specs

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("fsdp",))
    wstar = jax.random.normal(jax.random.key(5), (4, 12, 6))

    def loss_fn(p):
        d = p["blocks"] - wstar
        return 0.5 * jnp.sum(d * d)

    params = {"blocks": jnp.zeros((4, 12, 6))}
    mask = {"blocks": True}
    p_specs = {"blocks": PS()}

    def run(prob):
        opt = popt.kron_whiten(
            learning_rate=0.1, momentum=0.9, whiten_grad=False,
            preconditioner_init_scale=1.0, scanned_layers=mask,
            pipelined_fit=pipelined, stack_sharding=(mesh, "fsdp"),
            preconditioner_update_probability=prob)
        state = opt.init(params)
        s_specs = psgd_state_specs(p_specs, state, scanned_layers=mask,
                                   stack_axis="fsdp")
        state = jax.device_put(
            state, jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), s_specs,
                is_leaf=lambda x: isinstance(x, PS)))
        p = jax.device_put(params, NamedSharding(mesh, PS()))

        @jax.jit
        def step(p, s):
            g = jax.grad(loss_fn)(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s

        with mesh:
            for _ in range(5):
                p, state = step(p, state)
        return p

    _tree_close(run(1.0), run(_const_sched(1.0)))
