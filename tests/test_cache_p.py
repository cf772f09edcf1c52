"""cache_p: cache P_i = Q_i^H Q_i per factor after each fit so the apply on
non-fit steps is a single factor pass (the *4P apply cost for every
geometry) instead of the two-sided exprP chain the reference evaluates every
step (psgd.py:402, 628-631).

Trajectories must match the uncached transform to float rounding (the cached
apply only reassociates the einsum), across geometries, orderings, scanned
stacks, on-the-fly init, and the share_fit_apply composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import psgd_torch_tpu.optim as popt
import psgd_torch_tpu.precond.kron as kron_p


def _params():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 3)
    return {"w": jax.random.normal(ks[0], (12, 8)),
            "b": jax.random.normal(ks[1], (8,)),
            "stack": jax.random.normal(ks[2], (3, 8, 6))}


def _grad_stream(params, i):
    return jax.tree.map(
        lambda x: jax.random.normal(jax.random.fold_in(
            jax.random.PRNGKey(100 + i), 0), x.shape) * (1 + 0.1 * jnp.abs(x)),
        params)


def _run(tx, params, steps=8):
    state = tx.init(params)
    step = jax.jit(tx.update)
    outs = []
    for i in range(steps):
        u, state = step(_grad_stream(params, i), state)
        outs.append(u)
    return outs, state


SCANNED = {"w": False, "b": False, "stack": True}


@pytest.mark.parametrize("dq", ["Q0.5EQ1.5", "QUAD", "QEQ", "QEP", "EQ"])
def test_cached_matches_uncached_across_geometries(dq):
    params = _params()
    kw = dict(dq=dq, preconditioner_init_scale=None, scanned_layers=SCANNED,
              preconditioner_update_probability=0.6, seed=5)
    ref, _ = _run(popt.scale_by_kron_whiten(**kw), params)
    got, _ = _run(popt.scale_by_kron_whiten(cache_p=True, **kw), params)
    for a, b in zip(ref, got):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("kw", [
    dict(update_preconditioner_first=False),
    dict(momentum=0.9, whiten_grad=False),
    dict(momentum=0.9, whiten_grad=False, update_preconditioner_first=False,
         share_fit_apply=True),
    dict(momentum=0.9, whiten_grad=False, preconditioner_init_scale=1.0,
         pipelined_fit=True),
], ids=["unbiased", "momentum-whiten", "share_fit_apply", "pipelined_fit"])
def test_cached_matches_uncached_modes(kw):
    params = _params()
    base = dict(scanned_layers=SCANNED,
                preconditioner_update_probability=0.6, seed=7)
    base.update(kw)
    base.setdefault("preconditioner_init_scale", None)
    ref, _ = _run(popt.scale_by_kron_whiten(**base), params)
    got, _ = _run(popt.scale_by_kron_whiten(cache_p=True, **base), params)
    for a, b in zip(ref, got):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-9, atol=1e-9)


def test_cached_newton_matches_uncached():
    params = _params()

    def loss(p):
        return (jnp.sum(p["w"] ** 2) / 2 + jnp.sum((p["b"] - 1.0) ** 2)
                + jnp.sum(p["stack"] ** 4) / 4)

    hvp = popt.make_hvp_fn(loss)
    kw = dict(scanned_layers=SCANNED, preconditioner_init_scale=None,
              preconditioner_update_probability=0.5, seed=9)

    def run(tx):
        st = tx.init(params)
        step = jax.jit(lambda g, s, p: tx.update(g, s, p, hvp_fn=hvp))
        outs = []
        for i in range(6):
            u, st = step(jax.grad(loss)(params), st, params)
            outs.append(u)
        return outs

    ref = run(popt.scale_by_kron_newton(**kw))
    got = run(popt.scale_by_kron_newton(cache_p=True, **kw))
    for a, b in zip(ref, got):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-9, atol=1e-9)


def test_cached_apply_is_cheaper():
    """The cached apply must contract strictly fewer FLOPs than the exprP
    chain for a dense-dense leaf (it is a single factor pass)."""
    st, plan = kron_p.init_kron((64, 64))
    g = jnp.ones((64, 64))
    pc = kron_p.compute_p_factors(st, plan)

    def flops(fn, *args):
        return jax.jit(fn).lower(*args).compile().cost_analysis()["flops"]

    cached = flops(lambda p, x: kron_p.precond_grad_cached(p, plan, x), pc, g)
    chain = flops(lambda s, x: kron_p.precond_grad(s, plan, x), st, g)
    assert cached < 0.67 * chain, (cached, chain)


def test_cache_matches_q_squared():
    st, plan = kron_p.init_kron((6, 5), max_skew=float("inf"))
    qs = tuple(jax.random.normal(jax.random.PRNGKey(i), q.shape)
               for i, q in enumerate(st.q))
    st = st._replace(q=qs)
    pc = kron_p.compute_p_factors(st, plan)
    for q, p in zip(qs, pc):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q.T @ q),
                                   rtol=1e-12, atol=1e-12)


def test_raises_for_fit_p_geometries():
    with pytest.raises(ValueError, match="fit-P"):
        popt.scale_by_kron_whiten(dq="QUAD4P", cache_p=True)
    with pytest.raises(ValueError, match="fit-P"):
        popt.scale_by_kron_newton(dq="PRO4P", cache_p=True)
    st4p, plan4p = kron_p.init_kron((4, 4), dq="QUAD4P")
    with pytest.raises(ValueError, match="single"):
        kron_p.compute_p_factors(st4p, plan4p)


@pytest.mark.parametrize("mode_kw", [
    dict(),
    dict(update_preconditioner_first=False),
    dict(momentum=0.9, whiten_grad=False, update_preconditioner_first=False,
         share_fit_apply=True),
], ids=["biased", "unbiased", "share_fit_apply"])
def test_dim_sharded_cache_matches_uncached(mode_kw):
    """cache_p through the dim-sharded (factor_sharding) path: the cached
    run must match the uncached dim-sharded run to float rounding (same
    collectives and PRNG streams; the cache only reassociates the apply
    einsum), and the cache's sharded state placement must follow
    psgd_state_specs (diag P sharded like diag Q, dense P replicated)."""
    from psgd_torch_tpu.parallel import (make_mesh, named_shardings,
                                         psgd_state_specs)
    from jax.sharding import PartitionSpec as PS

    mesh = make_mesh(8, axis_names=("fsdp", "tp"))
    p = {"emb": jnp.zeros((64, 16))}
    specs = {"emb": PS("fsdp", "tp")}
    kw = dict(preconditioner_init_scale=1.0, seed=7,
              preconditioner_update_probability=0.6,
              factor_sharding=(mesh, specs))
    kw.update(mode_kw)

    def run(cache):
        tx = popt.scale_by_kron_whiten(cache_p=cache, **kw)
        st = tx.init(p)
        st = jax.device_put(st, named_shardings(
            mesh, psgd_state_specs(specs, st, factor_sharding_params=p,
                                   mesh=mesh)))
        outs = []
        with mesh:
            step = jax.jit(tx.update)
            for i in range(6):
                g = jax.device_put(
                    {"emb": jax.random.normal(jax.random.key(i), (64, 16))},
                    named_shardings(mesh, specs))
                u, st = step(g, st)
                outs.append(u)
        return outs, st

    ref, _ = run(False)
    got, st = run(True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a["emb"]),
                                   np.asarray(b["emb"]),
                                   rtol=1e-9, atol=1e-9)
    # cache present, correctly sharded (vocab-diag P sharded, dense P
    # replicated in the compute layout), and equal to Q_i^H Q_i
    pc = st.pcache[0]
    q = st.precond[0].q
    assert any("fsdp" in str(s.spec) for x in pc
               for s in [x.sharding]), "diag P not sharded"
    for x, f in zip(pc, q):
        want = np.conj(np.asarray(f)).T @ np.asarray(f) if f.ndim == 2 \
            else np.abs(np.asarray(f)) ** 2
        np.testing.assert_allclose(np.asarray(x), want, rtol=1e-12,
                                   atol=1e-12)


def test_dim_sharded_cache_newton_matches_uncached():
    """Newton-mode factor_sharding + cache_p parity."""
    from psgd_torch_tpu.parallel import (make_mesh, named_shardings,
                                         psgd_state_specs)
    from jax.sharding import PartitionSpec as PS

    mesh = make_mesh(8, axis_names=("fsdp",))
    p = {"emb": jax.random.normal(jax.random.key(0), (64, 16))}
    specs = {"emb": PS("fsdp", None)}

    def loss(t):
        return jnp.sum(t["emb"] ** 2) / 2 + jnp.sum(t["emb"] ** 4) / 12

    hvp = popt.make_hvp_fn(loss)
    kw = dict(preconditioner_init_scale=1.0, seed=3,
              preconditioner_update_probability=0.5,
              factor_sharding=(mesh, specs))

    def run(cache):
        tx = popt.scale_by_kron_newton(cache_p=cache, **kw)
        st = tx.init(p)
        st = jax.device_put(st, named_shardings(
            mesh, psgd_state_specs(specs, st, factor_sharding_params=p,
                                   mesh=mesh)))
        outs = []
        with mesh:
            step = jax.jit(lambda g, s, pp: tx.update(g, s, pp, hvp_fn=hvp))
            for i in range(5):
                u, st = step(jax.grad(loss)(p), st, p)
                outs.append(u)
        return outs

    ref = run(False)
    got = run(True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a["emb"]),
                                   np.asarray(b["emb"]),
                                   rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("share", [False, True])
def test_stack_sharded_cache_matches_replicated(share):
    """cache_p through the layer-axis shard_map: the stack-sharded cached
    run must match the replicated cached run (per-layer math and PRNG
    streams identical by construction)."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("fsdp",))
    params = {"stack": jax.random.normal(jax.random.PRNGKey(0), (4, 10, 6)),
              "w": jax.random.normal(jax.random.PRNGKey(1), (10, 6))}
    scanned = {"stack": True, "w": False}
    kw = dict(momentum=0.9, whiten_grad=False,
              update_preconditioner_first=False, share_fit_apply=share,
              preconditioner_init_scale=1.0, cache_p=True,
              preconditioner_update_probability=0.6,
              scanned_layers=scanned, seed=3)
    ref, st_ref = _run(popt.scale_by_kron_whiten(**kw), params, steps=6)
    got, st_got = _run(popt.scale_by_kron_whiten(
        stack_sharding=(mesh, "fsdp"), **kw), params, steps=6)
    for a, b in zip(ref, got):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-8, atol=1e-8)
    # the cached factors themselves agree with the replicated run's
    for x, y in zip(jax.tree.leaves(st_ref.pcache),
                    jax.tree.leaves(st_got.pcache)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-8, atol=1e-8)


def test_stack_sharded_cache_newton_matches_replicated():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("fsdp",))
    params = {"stack": jax.random.normal(jax.random.PRNGKey(0), (4, 10, 6))}
    scanned = {"stack": True}

    def loss(p):
        return jnp.sum(p["stack"] ** 2) / 2

    hvp = popt.make_hvp_fn(loss)
    kw = dict(scanned_layers=scanned, preconditioner_init_scale=1.0,
              preconditioner_update_probability=0.5, cache_p=True, seed=9)

    def run(tx):
        st = tx.init(params)
        step = jax.jit(lambda g, s, p: tx.update(g, s, p, hvp_fn=hvp))
        outs = []
        for i in range(5):
            u, st = step(jax.grad(loss)(params), st, params)
            outs.append(u)
        return outs

    ref = run(popt.scale_by_kron_newton(**kw))
    got = run(popt.scale_by_kron_newton(stack_sharding=(mesh, "fsdp"), **kw))
    for a, b in zip(ref, got):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-8, atol=1e-8)


def test_stack_sharded_cache_state_specs_place_and_train():
    """psgd_state_specs shards the cached factors' layer axis; a jitted
    sharded step runs and the cache keeps its sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as PS
    from psgd_torch_tpu.parallel import psgd_state_specs
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("fsdp",))
    params = {"stack": jax.random.normal(jax.random.PRNGKey(0), (4, 10, 6))}
    scanned = {"stack": True}
    tx = popt.scale_by_kron_whiten(
        cache_p=True, scanned_layers=scanned, preconditioner_init_scale=1.0,
        stack_sharding=(mesh, "fsdp"))
    state = tx.init(params)
    specs = psgd_state_specs({"stack": PS()}, state, scanned_layers=scanned,
                             stack_axis="fsdp")
    for x, s in zip(state.pcache[0], specs.pcache[0]):
        assert s[0] == "fsdp" and len(s) == x.ndim
    state = jax.device_put(state, jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PS)))
    g = jax.tree.map(jnp.ones_like, params)
    u, state2 = jax.jit(tx.update)(g, state)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(u))
    assert state2.pcache[0][-1].sharding.spec[0] == "fsdp"


def test_state_specs_cover_the_cache():
    from jax.sharding import PartitionSpec as PS
    from psgd_torch_tpu.parallel import psgd_state_specs
    params = _params()
    tx = popt.scale_by_kron_whiten(cache_p=True, scanned_layers=SCANNED,
                                   preconditioner_init_scale=1.0)
    state = tx.init(params)
    specs = psgd_state_specs(jax.tree.map(lambda _: PS(), params), state,
                             scanned_layers=SCANNED)
    # identical tree structure: every cached factor got a (replicated) spec
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(
                jax.tree.map(lambda _: 0, specs,
                             is_leaf=lambda x: isinstance(x, PS))))
