"""End-to-end optimizer-transform tests: Rosenbrock (hello_psgd parity),
ill-conditioned quadratics, momentum/clipping/update-probability mechanics,
and checkpointability of the state pytree."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import psgd_torch_tpu.optim as popt


def rosenbrock(params):
    x, y = params["x"], params["y"]
    return 100.0 * (y - x ** 2) ** 2 + (1.0 - x) ** 2


def test_dense_newton_rosenbrock():
    """hello_psgd.py parity: DenseNewton with the reference's settings
    (lr_params=1.0, lr_preconditioner=0.5, momentum=0.9, 2000 iters on the
    100-dim coupled Rosenbrock, hello_psgd.py:8-19)."""
    params = jnp.zeros(100)

    def loss_fn(x):
        x1, x2 = x[0::2], x[1::2]
        return jnp.sum(100.0 * (x2 - x1 ** 2) ** 2 + (1.0 - x1) ** 2)

    opt = popt.dense_newton(learning_rate=1.0, lr_preconditioner=0.5,
                            momentum=0.9)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params,
                                    hvp_fn=popt.make_hvp_fn(loss_fn))
        return optax.apply_updates(params, updates), state

    losses = []
    for _ in range(2000):
        params, state = step(params, state)
        losses.append(float(loss_fn(params)))
    assert losses[-1] < 1e-8, f"Rosenbrock loss {losses[-1]}"
    np.testing.assert_allclose(np.asarray(params), np.ones(100), atol=1e-3)


def _quad_problem(key=0):
    h1 = jnp.diag(10.0 ** jnp.linspace(-1.5, 1.5, 24))
    h2 = jnp.diag(10.0 ** jnp.linspace(-1.0, 1.0, 8))
    w_star = jax.random.normal(jax.random.key(key), (24, 8))

    def loss_fn(p):
        d = p["w"] - w_star
        return 0.5 * jnp.sum(d * (h1 @ d @ h2))

    return loss_fn, {"w": jnp.zeros((24, 8))}


@pytest.mark.parametrize("dq", ["Q0.5EQ1.5", "QUAD", "QEQ"])
def test_kron_newton_quadratic(dq):
    loss_fn, params = _quad_problem()
    opt = popt.kron_newton(learning_rate=0.5, grad_clip_max_norm=10.0, dq=dq)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params,
                                    hvp_fn=popt.make_hvp_fn(loss_fn))
        return optax.apply_updates(params, updates), state

    for _ in range(300):
        params, state = step(params, state)
    assert float(loss_fn(params)) < 1e-8


def test_kron_whiten_quadratic_with_momentum():
    loss_fn, params = _quad_problem()
    sched = optax.linear_schedule(0.1, 0.0, 800)
    opt = popt.kron_whiten(learning_rate=sched, momentum=0.9)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    l0 = float(loss_fn(params))
    for _ in range(800):
        params, state = step(params, state)
    assert float(loss_fn(params)) < 1e-3 * l0


def test_kron_whiten_momentum_whitening():
    loss_fn, params = _quad_problem()
    opt = popt.kron_whiten(learning_rate=optax.linear_schedule(0.05, 0.0, 600),
                           momentum=0.9, whiten_grad=False)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    l0 = float(loss_fn(params))
    for _ in range(600):
        params, state = step(params, state)
    assert float(loss_fn(params)) < 1e-2 * l0


def test_whiten_momentum_requires_momentum():
    with pytest.raises(ValueError):
        popt.scale_by_kron_whiten(whiten_grad=False, momentum=0.0)


def test_lra_newton_quadratic():
    loss_fn, params = _quad_problem()
    opt = popt.lra_newton(learning_rate=0.5, rank_of_approximation=10,
                          grad_clip_max_norm=10.0)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params,
                                    hvp_fn=popt.make_hvp_fn(loss_fn))
        return optax.apply_updates(params, updates), state

    l0 = float(loss_fn(params))
    for _ in range(1500):
        params, state = step(params, state)
    assert float(loss_fn(params)) < 1e-3 * l0


def test_lra_whiten_runs_and_descends():
    loss_fn, params = _quad_problem()
    opt = popt.lra_whiten(learning_rate=optax.linear_schedule(0.1, 0.0, 500))
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    l0 = float(loss_fn(params))
    for _ in range(500):
        params, state = step(params, state)
    assert float(loss_fn(params)) < 1e-2 * l0


def test_update_probability_gates_q_updates():
    """With p=0, Q must stay at its (first-step-rescaled) value."""
    loss_fn, params = _quad_problem()
    tx = popt.scale_by_kron_whiten(preconditioner_update_probability=0.0,
                                   preconditioner_init_scale=1.0)
    state = tx.init(params)
    grads = jax.grad(loss_fn)(params)
    u1, s1 = tx.update(grads, state, params)
    u2, s2 = tx.update(grads, s1, params)
    for a, b in zip(s1.precond[0].q, s2.precond[0].q):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finite_diff_hvp_matches_exact():
    loss_fn, params = _quad_problem()
    vs = popt.rand_like_tree(jax.random.key(0), params)
    _, h1 = popt.hvp_exact(loss_fn, params, vs)
    _, h2 = popt.hvp_finite_diff(loss_fn, params, vs)
    np.testing.assert_allclose(np.asarray(h1["w"]), np.asarray(h2["w"]),
                               rtol=1e-3, atol=1e-2)


def test_state_is_checkpointable_pytree():
    """State must round-trip through flatten/unflatten and host transfer —
    the reference's optimizer state is not serializable (SURVEY.md §5)."""
    loss_fn, params = _quad_problem()
    opt = popt.kron_whiten(learning_rate=1e-3, momentum=0.9)
    state = opt.init(params)
    grads = jax.grad(loss_fn)(params)
    _, state = opt.update(grads, state, params)
    flat, treedef = jax.tree_util.tree_flatten(state)
    assert all(isinstance(x, jax.Array) for x in flat)
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(np.asarray(x)) for x in flat])
    _, state2 = opt.update(grads, restored, params)  # still usable


def test_bf16_preconditioner_dtype():
    loss_fn, params = _quad_problem()
    opt = popt.kron_whiten(learning_rate=1e-2, preconditioner_dtype=jnp.bfloat16,
                           lr_preconditioner=0.1, norm_k=128)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(50):
        params, state = step(params, state)
    assert np.isfinite(float(loss_fn(params)))
    kron_state = state[0].precond[0] if isinstance(state, tuple) else state.precond[0]
    assert kron_state.q[0].dtype == jnp.bfloat16
    assert kron_state.lips[0].dtype == jnp.float32


def test_weight_decay_modes():
    """Classic wd preconditions (g + wd*p); decoupled adds wd*p to the
    whitened update (reference ddp wrapper :117-122)."""
    def loss_fn(p):
        return 0.5 * jnp.sum(p * p * jnp.linspace(1.0, 10.0, 16))

    p = jnp.ones(16)
    g = jax.grad(loss_fn)(p)
    outs = {}
    for mode in ("decoupled", "classic"):
        opt = popt.kron_whiten(1e-2, weight_decay=0.1, weight_decay_mode=mode,
                               preconditioner_init_scale=1.0)
        u, _ = jax.jit(opt.update)(g, opt.init(p), p)
        outs[mode] = np.asarray(u)
    assert np.all(np.isfinite(outs["decoupled"]))
    assert np.all(np.isfinite(outs["classic"]))
    assert not np.allclose(outs["decoupled"], outs["classic"])
    with pytest.raises(ValueError):
        popt.kron_whiten(1e-2, weight_decay=0.1, weight_decay_mode="bogus")


def test_hyperparameter_schedules():
    """lr_preconditioner and preconditioner_update_probability accept
    optax-style schedules — the jit-able form of the reference's mutable
    class attrs annealed by the demos (misc/gpt2.py:440, misc/vit.py:362)."""
    loss_fn, params = _quad_problem()
    opt = popt.kron_whiten(
        optax.linear_schedule(0.1, 0.0, 500), momentum=0.9,
        preconditioner_init_scale=1.0,
        lr_preconditioner=optax.linear_schedule(0.5, 0.05, 300),
        preconditioner_update_probability=optax.linear_schedule(1.0, 0.1, 300))
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(500):
        params, state = step(params, state)
    assert float(loss_fn(params)) < 1e-4


def test_psgd_metrics():
    """Observability: psgd_metrics extracts jit-safe health scalars from
    plain, chained, momentum, and LRA states (SURVEY.md §5 gap upstream)."""
    import psgd_torch_tpu.optim as popt
    from psgd_torch_tpu.utils import psgd_metrics

    p = {"w": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}
    g = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.1, p)
    opt = popt.kron_whiten(learning_rate=1e-3, momentum=0.9,
                           preconditioner_init_scale=1.0)
    state = opt.init(p)

    @jax.jit
    def step(g, s):
        u, s = opt.update(g, s)
        return u, s, psgd_metrics(s, u, per_leaf=True)

    u, state, m = step(g, state)
    u, state, m = step(g, state)
    assert float(m["step"]) == 2
    assert float(m["L_max"]) > 0 and float(m["q_abs_max"]) > 0
    assert float(m["update_rms"]) > 0 and float(m["momentum_rms"]) > 0
    assert any(k.startswith("L_max/") for k in m)

    opt2 = popt.lra_whiten(learning_rate=1e-3)
    s2 = opt2.init(p)
    u2, s2 = jax.jit(opt2.update)(g, s2)
    m2 = psgd_metrics(s2, u2)
    assert "update_rms" in m2 and float(m2["step"]) == 1


def test_onthefly_init_scale_gated_to_step0():
    """With preconditioner_init_scale=None, the mean|g|^4 sweep over every
    gradient leaf must live inside a count==0 lax.cond branch, not the main
    trace — step 1+ must not pay ~one HBM pass over the gradients for a
    multiplier of 1 (VERDICT r2 weak #3)."""
    tx = popt.scale_by_kron_whiten()  # init scale on the fly
    params = {"w": jnp.ones((8, 8)), "b": jnp.ones(8)}
    state = tx.init(params)
    jaxpr = jax.make_jaxpr(lambda g, s: tx.update(g, s))(params, state)

    def has_pow4(jx):
        return any(e.primitive.name == "integer_pow" and e.params.get("y") == 4
                   for e in jx.eqns)

    def sub_jaxprs(jx):
        for e in jx.eqns:
            for v in e.params.values():
                if hasattr(v, "jaxpr"):
                    yield v.jaxpr
                elif isinstance(v, (list, tuple)):
                    for b in v:
                        if hasattr(b, "jaxpr"):
                            yield b.jaxpr

    assert not has_pow4(jaxpr.jaxpr), \
        "|g|^4 reduction traced unconditionally in the update"
    # sanity: the sweep does exist somewhere (inside the count==0 branch)
    def anywhere(jx):
        if has_pow4(jx):
            return True
        return any(anywhere(s) for s in sub_jaxprs(jx))
    assert anywhere(jaxpr.jaxpr), "on-the-fly init sweep disappeared entirely"


def test_norm_k_auto_resolution():
    """norm_k=None resolves from the preconditioner dtype: 32 for fp32+,
    128 for bf16/half (reference psgd.py:48-49)."""
    from psgd_torch_tpu.ops.linalg import resolve_norm_k
    assert resolve_norm_k(None, jnp.float32) == 32
    assert resolve_norm_k(None, jnp.float64) == 32
    assert resolve_norm_k(None, jnp.bfloat16) == 128
    assert resolve_norm_k(None, jnp.float16) == 128
    assert resolve_norm_k(None, jnp.complex64) == 32
    assert resolve_norm_k(64, jnp.bfloat16) == 64  # explicit wins

    # integration: a bf16-Q transform with the default norm_k runs
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0,
                                   preconditioner_dtype=jnp.bfloat16)
    p = {"w": jnp.zeros((16, 8), jnp.float32)}
    s = tx.init(p)
    g = {"w": jnp.ones((16, 8), jnp.float32)}
    u, s = jax.jit(tx.update)(g, s)
    assert jnp.all(jnp.isfinite(u["w"]))


def test_kron_newton_hvp_dtype_may_differ_from_params():
    """An hvp_fn may return Hvps in a wider dtype than the params (f32
    Hvps over bf16 params is a common stabilization); the lazy-Hvp gate's
    skip branch must match those avals, not the params'."""
    params = {"w": jnp.zeros((8, 4), jnp.bfloat16)}

    def hvp_fn(p, v):
        pf = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), p)
        vf = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), v)
        loss = lambda q: jnp.sum(q["w"].astype(jnp.float32) ** 2)
        g, hv = jax.jvp(jax.grad(loss), (pf,), (vf,))
        return g, hv

    opt = popt.kron_newton(learning_rate=1e-2, preconditioner_init_scale=1.0,
                           preconditioner_update_probability=0.5)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        g = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32) * 2, p)
        up, s = opt.update(g, s, p, hvp_fn=hvp_fn)
        return optax.apply_updates(p, up), s

    for _ in range(4):
        params, state = step(params, state)
    assert jnp.isfinite(params["w"].astype(jnp.float32)).all()


def test_lra_newton_hvp_dtype_may_differ_from_params():
    params = {"w": jnp.zeros((16,), jnp.bfloat16)}

    def hvp_fn(p, v):
        loss = lambda q: jnp.sum(q["w"].astype(jnp.float32) ** 2)
        pf = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), p)
        vf = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), v)
        return jax.jvp(jax.grad(loss), (pf,), (vf,))

    opt = popt.lra_newton(learning_rate=1e-2, rank_of_approximation=2,
                          preconditioner_init_scale=1.0,
                          preconditioner_update_probability=0.5)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        g = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32) * 2, p)
        up, s = opt.update(g, s, p, hvp_fn=hvp_fn)
        return optax.apply_updates(p, up), s

    for _ in range(4):
        params, state = step(params, state)
    assert jnp.isfinite(params["w"].astype(jnp.float32)).all()


def test_composes_with_optax_multi_transform():
    """The production partition recipe: PSGD-Kron on matrix params, AdamW
    on 1-D params (norms/biases), via optax.multi_transform."""
    params = {"dense": {"w": jnp.zeros((8, 4))}, "norm": {"b": jnp.zeros((4,))}}
    tgt = jax.random.normal(jax.random.key(0), (8, 4))

    def loss(p):
        return (jnp.sum((p["dense"]["w"] - tgt) ** 2)
                + jnp.sum((p["norm"]["b"] - 1.0) ** 2))

    tx = optax.multi_transform(
        {"psgd": popt.kron_whiten(learning_rate=optax.linear_schedule(0.1, 0.0, 300),
                                  preconditioner_init_scale=1.0),
         "adamw": optax.adamw(1e-1)},
        {"dense": {"w": "psgd"}, "norm": {"b": "adamw"}})
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s

    l0 = float(loss(params))
    for _ in range(300):
        params, state = step(params, state)
    assert float(loss(params)) < 1e-3 * l0


def test_composes_with_optax_multisteps():
    """Gradient accumulation: optax.MultiSteps(kron_whiten, k) — PSGD's
    pytree state must survive the wrapped zero-update steps."""
    params = {"w": jnp.zeros((8, 4))}
    tgt = jax.random.normal(jax.random.key(0), (8, 4))

    def loss(p):
        return jnp.sum((p["w"] - tgt) ** 2)

    tx = optax.MultiSteps(
        popt.kron_whiten(learning_rate=optax.linear_schedule(0.1, 0.0, 100),
                         preconditioner_init_scale=1.0),
        every_k_schedule=4)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s

    l0 = float(loss(params))
    for _ in range(400):
        params, state = step(params, state)
    assert float(loss(params)) < 1e-3 * l0
