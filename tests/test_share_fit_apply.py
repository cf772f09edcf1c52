"""share_fit_apply: reuse the fit's internal P(src + damping*v) as the step's
preconditioned update, skipping the separate exprP apply on fit steps.

The shared product differs from the separate apply by O(damping + eps|src|)
white noise only, so trajectories must track the unshared ones closely; with
the fit gated off (p=0) the two code paths must be bitwise identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import psgd_torch_tpu.optim as popt


def _quadratic():
    key = jax.random.PRNGKey(7)
    a = jax.random.normal(key, (12, 12)) / jnp.sqrt(12.0)
    h = a @ a.T + 0.1 * jnp.eye(12)
    params = {"w": jax.random.normal(jax.random.PRNGKey(8), (12, 4)),
              "b": jnp.zeros((4,))}

    def loss(p):
        z = h @ p["w"] + p["b"]
        return jnp.sum(z * z) / 2

    return loss, params


def _run(tx, loss, params, steps):
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = tx.update(g, s, p)
        return jax.tree.map(lambda x, du: x - 1e-2 * du, p, u), s

    for _ in range(steps):
        params, state = step(params, state)
    return params


@pytest.mark.parametrize("momentum,whiten_grad", [(0.0, True), (0.9, False)])
def test_shared_tracks_unshared(momentum, whiten_grad):
    loss, params = _quadratic()
    kw = dict(momentum=momentum, whiten_grad=whiten_grad,
              update_preconditioner_first=False,
              preconditioner_init_scale=1.0, seed=3)
    p_ref = _run(popt.scale_by_kron_whiten(**kw), loss, params, 8)
    p_shr = _run(popt.scale_by_kron_whiten(share_fit_apply=True, **kw),
                 loss, params, 8)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_shr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_shared_identical_when_fit_never_runs():
    loss, params = _quadratic()
    kw = dict(update_preconditioner_first=False,
              preconditioner_update_probability=0.0,
              preconditioner_init_scale=1.0, seed=5)
    p_ref = _run(popt.scale_by_kron_whiten(**kw), loss, params, 4)
    p_shr = _run(popt.scale_by_kron_whiten(share_fit_apply=True, **kw),
                 loss, params, 4)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_shr)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_shared_converges_on_quadratic():
    loss, params = _quadratic()
    tx = popt.scale_by_kron_whiten(share_fit_apply=True,
                                   update_preconditioner_first=False,
                                   preconditioner_init_scale=1.0, seed=11)
    p = _run(tx, loss, params, 300)
    assert float(loss(p)) < 1e-3 * float(loss(params))


def test_validation_errors():
    mk = popt.scale_by_kron_whiten
    with pytest.raises(ValueError, match="update_preconditioner_first"):
        mk(share_fit_apply=True, update_preconditioner_first=True)
    with pytest.raises(ValueError, match="pipelined_fit"):
        mk(share_fit_apply=True, update_preconditioner_first=False,
           pipelined_fit=True, momentum=0.9, whiten_grad=False,
           preconditioner_init_scale=1.0)
    with pytest.raises(ValueError, match="coincide"):
        mk(share_fit_apply=True, update_preconditioner_first=False,
           momentum=0.9, whiten_grad=True)
    with pytest.raises(ValueError, match="EQ"):
        mk(share_fit_apply=True, update_preconditioner_first=False, dq="EQ")


def test_shared_with_scanned_layers():
    """Layer-stacked leaves take the batched stacked update's shared Pg."""
    key = jax.random.PRNGKey(0)
    params = {"blocks": jax.random.normal(key, (4, 16, 16)) * 0.3,
              "head": jax.random.normal(jax.random.PRNGKey(1), (16, 8)) * 0.3}
    scanned = {"blocks": True, "head": False}
    tgt = jax.random.normal(jax.random.PRNGKey(2), (16, 8))

    def loss(p):
        x = jnp.eye(16)
        for i in range(4):
            x = jnp.tanh(p["blocks"][i] @ x)
        return jnp.mean((x @ p["head"] - tgt) ** 2)

    kw = dict(momentum=0.9, whiten_grad=False,
              update_preconditioner_first=False,
              preconditioner_init_scale=1.0, scanned_layers=scanned, seed=2)
    p_ref = _run(popt.scale_by_kron_whiten(**kw), loss, params, 6)
    p_shr = _run(popt.scale_by_kron_whiten(share_fit_apply=True, **kw),
                 loss, params, 6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_shr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_shared_with_stack_sharding():
    """share_fit_apply composes with the ZeRO-style layer-stack shard_map."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:4]), ("layers",))
    key = jax.random.PRNGKey(0)
    params = {"blocks": jax.random.normal(key, (4, 16, 16)) * 0.3}
    scanned = {"blocks": True}
    tgt = jax.random.normal(jax.random.PRNGKey(2), (16,))

    def loss(p):
        x = jnp.ones((16,))
        for i in range(4):
            x = jnp.tanh(p["blocks"][i] @ x)
        return jnp.mean((x - tgt) ** 2)

    kw = dict(momentum=0.9, whiten_grad=False,
              update_preconditioner_first=False,
              preconditioner_init_scale=1.0, scanned_layers=scanned, seed=2)
    p_ref = _run(popt.scale_by_kron_whiten(**kw), loss, params, 5)
    p_shr = _run(popt.scale_by_kron_whiten(
        share_fit_apply=True, stack_sharding=(mesh, "layers"), **kw),
        loss, params, 5)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_shr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("dq", ["QEP", "QEQ", "Q0.5EQ1.5", "PRO4P",
                                "QUAD", "QUAD4P"])
def test_return_pg_matches_apply_all_geometries(dq):
    """The fit's returned Pg equals the apply product on the pre-update Q
    (up to the damping noise), and requesting it never changes the fitted
    state.  EQ raises (it never forms the full product)."""
    from psgd_torch_tpu.precond import kron

    st, plan = kron.init_kron((8, 6), 1.0, dq=dq)
    g = jax.random.normal(jax.random.PRNGKey(0), (8, 6), jnp.float32)
    k = jax.random.PRNGKey(1)
    st_plain = kron.update_kron_whiten(st, plan, g, k, damping=0.0)
    st_pg, pg = kron.update_kron_whiten(st, plan, g, k, damping=0.0,
                                        return_pg=True)
    np.testing.assert_allclose(np.asarray(pg),
                               np.asarray(kron.precond_grad(st, plan, g)),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_plain), jax.tree.leaves(st_pg)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_return_pg_eq_raises():
    from psgd_torch_tpu.precond import kron

    st, plan = kron.init_kron((4, 3), 1.0, dq="EQ")
    g = jax.random.normal(jax.random.PRNGKey(0), (4, 3), jnp.float32)
    with pytest.raises(ValueError, match="EQ"):
        kron.update_kron_whiten(st, plan, g, jax.random.PRNGKey(1),
                                return_pg=True)


@pytest.mark.slow
def test_shared_with_factor_sharding():
    """share_fit_apply composes with the dim-sharded (factor_sharding)
    embedding path: the shared run tracks the unshared run, and with the
    fit gated off the two are bitwise identical."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import PartitionSpec as PS
    from psgd_torch_tpu.parallel import (make_mesh, named_shardings,
                                         psgd_state_specs)

    mesh = make_mesh(8, axis_names=("fsdp",))
    specs = {"emb": PS("fsdp", None)}
    tgt = jax.random.normal(jax.random.PRNGKey(2), (64, 16))
    params = {"emb": jnp.zeros((64, 16))}

    def loss(p):
        return jnp.mean((p["emb"] - tgt) ** 2)

    def run(p_update, share):
        tx = popt.scale_by_kron_whiten(
            momentum=0.9, whiten_grad=False,
            update_preconditioner_first=False,
            preconditioner_update_probability=p_update,
            preconditioner_init_scale=1.0, seed=3,
            factor_sharding=(mesh, specs), share_fit_apply=share)
        st = tx.init(params)
        st = jax.device_put(st, named_shardings(
            mesh, psgd_state_specs(specs, st, factor_sharding_params=params,
                                   mesh=mesh)))
        p = jax.device_put(params, named_shardings(mesh, specs))

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            u, s = tx.update(g, s, p)
            return jax.tree.map(lambda x, du: x - 1e-2 * du, p, u), s

        with mesh:
            for _ in range(6):
                p, st = step(p, st)
                jax.block_until_ready(p)
        return p

    p_ref = run(1.0, False)
    p_shr = run(1.0, True)
    np.testing.assert_allclose(np.asarray(p_ref["emb"]),
                               np.asarray(p_shr["emb"]),
                               rtol=2e-4, atol=2e-5)

    p_ref0 = run(0.0, False)
    p_shr0 = run(0.0, True)
    assert np.array_equal(np.asarray(p_ref0["emb"]),
                          np.asarray(p_shr0["emb"]))


def test_shared_noise_bounded_in_bf16():
    """The docs claim the shared product's extra damping noise is of the
    order of bf16 quantization noise: with a bf16 Q state the one-step
    shared update must deviate from the separate apply by a small relative
    amount (the O(eps(bf16)|src|) damping term propagated through P)."""
    loss, params = _quadratic()
    kw = dict(momentum=0.9, whiten_grad=False,
              update_preconditioner_first=False,
              preconditioner_init_scale=1.0, seed=3,
              preconditioner_dtype=jnp.bfloat16)

    def one_update(share):
        tx = popt.scale_by_kron_whiten(share_fit_apply=share, **kw)
        st = tx.init(params)
        g = jax.grad(loss)(params)
        u, _ = tx.update(g, st, params)
        return u

    u_ref = one_update(False)
    u_shr = one_update(True)
    for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_shr)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
        assert rel < 0.05, f"shared bf16 update deviates {rel:.4f}"


@pytest.mark.slow
@pytest.mark.parametrize("dq", ["QEQ", "QUAD", "QEP", "PRO4P"])
def test_shared_tracks_unshared_other_geometries(dq):
    """The transform-level share path holds for every supported dQ, not
    just the default Q0.5EQ1.5 (per-geometry Pg==apply is covered at the
    kron level; this drives the full transform)."""
    loss, params = _quadratic()
    kw = dict(update_preconditioner_first=False, dq=dq,
              preconditioner_init_scale=1.0, seed=3)
    p_ref = _run(popt.scale_by_kron_whiten(**kw), loss, params, 6)
    p_shr = _run(popt.scale_by_kron_whiten(share_fit_apply=True, **kw),
                 loss, params, 6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_shr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
