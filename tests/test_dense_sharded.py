"""Row-sharded (ZeRO-style) dense Newton, QEQ geometry — beyond-reference
capability: the reference DenseNewton (psgd.py:1427-1563) replicates the
full (n, n) Q; here its rows shard over a mesh axis so state memory and
fit/apply FLOPs scale 1/k (precond/dense.py row-sharded section)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as PS

import psgd_torch_tpu.optim as popt
import psgd_torch_tpu.precond.dense as dense_p
from psgd_torch_tpu.parallel import dense_state_specs, make_mesh


def _mesh():
    return make_mesh(8, axis_names=("fsdp",))


def test_vector_sharding_requires_qeq():
    with pytest.raises(ValueError, match="QEQ"):
        popt.scale_by_dense_newton(dq="Q0.5EQ1.5",
                                   vector_sharding=(None, "fsdp"))


def test_row_sharded_update_matches_plain_math():
    """Single fit + apply on the sharded path equals the plain QEQ dense
    update (damping=None removes the only stochastic input)."""
    mesh = _mesh()
    n, n_pad = 20, 24
    key = jax.random.key(0)
    q0 = jnp.eye(n) + 0.01 * jax.random.normal(key, (n, n))
    v = jax.random.normal(jax.random.fold_in(key, 1), (n,))
    h = 3.0 * v + jax.random.normal(jax.random.fold_in(key, 2), (n,)) * 0.1
    g = jax.random.normal(jax.random.fold_in(key, 3), (n,))

    # plain
    st = dense_p.DenseState(q=q0, lips=jnp.zeros(()))
    st1 = dense_p.update_dense(st, v, h, key, "QEQ", lr=0.2, damping=None)
    pg_plain = dense_p.precond_grad(st1, g, "QEQ")

    # sharded: pad q to n_pad with identity rows/cols, vectors with zeros
    qp = jnp.eye(n_pad).at[:n, :n].set(q0)
    pad = (0, n_pad - n)

    def local(q_loc, lips, v, h, g, key):
        q_loc, lips = dense_p.update_dense_qeq_row_sharded(
            q_loc, lips, v, h, key, "fsdp", n, lr=0.2, damping=None)
        pg = dense_p.precond_grad_qeq_row_sharded(q_loc, g, "fsdp")
        return q_loc, lips, pg

    from psgd_torch_tpu.utils.compat import shard_map
    fn = shard_map(local, mesh=mesh,
                   in_specs=(PS("fsdp", None), PS(), PS(), PS(), PS(), PS()),
                   out_specs=(PS("fsdp", None), PS(), PS()))
    with mesh:
        q_sh, lips_sh, pg_sh = fn(qp, jnp.zeros(()), jnp.pad(v, pad),
                                  jnp.pad(h, pad), jnp.pad(g, pad), key)
    np.testing.assert_allclose(np.asarray(q_sh[:n, :n]),
                               np.asarray(st1.q), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(lips_sh), float(st1.lips), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pg_sh[:n]), np.asarray(pg_plain),
                               rtol=2e-5, atol=2e-6)
    # padded rows/cols stay exactly identity
    np.testing.assert_array_equal(np.asarray(q_sh[n:, :]),
                                  np.eye(n_pad)[n:, :])
    np.testing.assert_array_equal(np.asarray(q_sh[:n, n:]),
                                  np.zeros((n, n_pad - n)))
    np.testing.assert_array_equal(np.asarray(pg_sh[n:]),
                                  np.zeros(n_pad - n))


def _problem():
    """Ill-conditioned quadratic over 47 params (pads to 48)."""
    hess = 10.0 ** jnp.linspace(-2, 2, 40)
    t_star = jax.random.normal(jax.random.key(2), (40,))

    def loss(p):
        return (0.5 * jnp.sum(hess * (p["w"] - t_star) ** 2)
                + 0.5 * jnp.sum((p["b"] - 1.0) ** 2))

    params = {"w": jnp.zeros((40,)), "b": jnp.zeros((7,))}
    return loss, params


@pytest.mark.slow
def test_sharded_dense_newton_converges_and_state_stays_sharded():
    mesh = _mesh()
    loss, params = _problem()

    def hvp(p, v):
        return jax.jvp(jax.grad(loss), (p,), (v,))

    opt = popt.dense_newton(learning_rate=0.5, dq="QEQ",
                            preconditioner_init_scale=1.0,
                            vector_sharding=(mesh, "fsdp"),
                            grad_clip_max_norm=50.0, momentum=0.9)
    state = opt.init(params)
    assert state[0].precond.q.shape == (48, 48)
    specs = dense_state_specs(state, "fsdp")
    state = jax.device_put(state, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PS)))

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        up, s = opt.update(g, s, p, hvp_fn=hvp)
        return optax.apply_updates(p, up), s

    p = params
    l0 = float(loss(p))
    with mesh:
        for _ in range(300):
            p, state = step(p, state)
            jax.block_until_ready(state)
    assert float(loss(p)) < 1e-5 * l0, float(loss(p))
    # Q must actually live sharded
    q = state[0].precond.q
    shard_shapes = {tuple(sh.data.shape) for sh in q.addressable_shards}
    assert shard_shapes == {(6, 48)}, shard_shapes


@pytest.mark.slow
def test_sharded_matches_replicated_trajectory():
    """Same seeds, same (v, h) stream (explicit vs), sharded vs plain:
    updates agree to reduction-order tolerance over several steps."""
    mesh = _mesh()
    loss, params = _problem()

    kw = dict(dq="QEQ", preconditioner_init_scale=1.0,
              lr_preconditioner=0.1, seed=5)
    opt_sh = popt.scale_by_dense_newton(vector_sharding=(mesh, "fsdp"), **kw)
    opt_pl = popt.scale_by_dense_newton(**kw)
    s_sh, s_pl = opt_sh.init(params), opt_pl.init(params)
    s_sh = jax.device_put(s_sh, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), dense_state_specs(s_sh, "fsdp"),
        is_leaf=lambda x: isinstance(x, PS)))

    p_sh = p_pl = params
    for i in range(5):
        g_sh = jax.grad(loss)(p_sh)
        g_pl = jax.grad(loss)(p_pl)
        k = jax.random.fold_in(jax.random.key(9), i)
        vs = jax.tree_util.tree_map(
            lambda x: jax.random.normal(k, x.shape), p_pl)
        _, hvs = jax.jvp(jax.grad(loss), (p_pl,), (vs,))
        with mesh:
            u_sh, s_sh = jax.jit(opt_sh.update)(g_sh, s_sh, vs=vs, hvs=hvs)
        u_pl, s_pl = jax.jit(opt_pl.update)(g_pl, s_pl, vs=vs, hvs=hvs)
        p_sh = optax.apply_updates(p_sh, jax.tree_util.tree_map(
            lambda u: -0.1 * u, u_sh))
        p_pl = optax.apply_updates(p_pl, jax.tree_util.tree_map(
            lambda u: -0.1 * u, u_pl))
    for ks in ("w", "b"):
        np.testing.assert_allclose(np.asarray(p_sh[ks]), np.asarray(p_pl[ks]),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_vector_sharded_states_checkpoint_roundtrip(tmp_path):
    """Orbax round trip of the row-sharded DenseState restores into fresh
    shardings bitwise (reference state is unserializable, SURVEY.md §5)."""
    pytest.importorskip("orbax.checkpoint")
    from psgd_torch_tpu.utils import checkpoint as ckpt

    mesh = _mesh()
    loss, params = _problem()

    def hvp(p, v):
        return jax.jvp(jax.grad(loss), (p,), (v,))

    opt = popt.dense_newton(learning_rate=0.3, dq="QEQ",
                            preconditioner_init_scale=1.0,
                            vector_sharding=(mesh, "fsdp"), momentum=0.9)
    state = opt.init(params)
    specs = dense_state_specs(state, "fsdp")
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PS))
    state = jax.device_put(state, shardings)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        up, s = opt.update(g, s, p, hvp_fn=hvp)
        return optax.apply_updates(p, up), s

    p = params
    with mesh:
        for _ in range(5):
            p, state = step(p, state)
            jax.block_until_ready(state)

    ckpt.save_checkpoint(str(tmp_path / "dn"), 5, p, state)
    template = {"step": 5, "params": p, "opt_state": state, "extra": {}}
    restored = ckpt.restore_checkpoint(str(tmp_path / "dn"), template)
    s2 = jax.device_put(restored["opt_state"], shardings)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))
    # restored-and-resharded q carries the row sharding (48/8 = 6 rows/dev)
    assert {tuple(sh.data.shape) for sh in s2[0].precond.q.addressable_shards} \
        == {(6, 48)}
