"""optax-ecosystem composability of the PSGD transforms.

The reference's optimizers are closure classes (psgd.py:516, :832) that
cannot compose with a gradient-accumulation or multi-optimizer harness;
here the transforms are ordinary optax GradientTransformations, so the
standard wrappers must just work.  These tests pin that contract:

  * optax.MultiSteps(kron_whiten) — gradient accumulation: k micro-steps
    reproduce the one-big-batch trajectory exactly (the PSGD PRNG stream
    and count advance only at accumulation boundaries);
  * optax.multi_transform — the production mixed recipe (PSGD on matrix
    leaves, Adam on vectors/scalars) trains, and each partition's state
    matches its solo-optimizer counterpart;
  * optax.apply_if_finite — a non-finite gradient leaves params and the
    PSGD state untouched (composes with utils.failsafe).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import psgd_torch_tpu.optim as popt


def _quadratic_problem(key, n=8):
    a = jax.random.normal(key, (n, n)) / jnp.sqrt(n)
    h = a @ a.T + 0.1 * jnp.eye(n)
    params = {"w": jax.random.normal(jax.random.fold_in(key, 1), (n, n)),
              "b": jax.random.normal(jax.random.fold_in(key, 2), (n,))}

    def loss_fn(p, x):
        r = p["w"] @ x + p["b"][:, None]
        return jnp.mean(jnp.sum(r * (h @ r), axis=0))

    return params, loss_fn


def test_multisteps_matches_mean_gradient_trajectory():
    key = jax.random.key(0)
    params0, loss_fn = _quadratic_problem(key)
    k = 4
    opt = popt.kron_whiten(learning_rate=1e-2,
                           preconditioner_init_scale=1.0,
                           preconditioner_update_probability=1.0)

    xs = [jax.random.normal(jax.random.fold_in(key, 10 + i), (8, 16))
          for i in range(2 * k)]

    # big-batch reference: one update per mean gradient over each window
    p_ref = params0
    s_ref = opt.init(params0)
    for w in range(2):
        grads = [jax.grad(loss_fn)(p_ref, x) for x in xs[w * k:(w + 1) * k]]
        g = jax.tree_util.tree_map(
            lambda *t: sum(t[1:], t[0]) / len(t), *grads)
        u, s_ref = opt.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)

    # accumulated: optax.MultiSteps drives the same windows micro-step-wise
    ms = optax.MultiSteps(opt, every_k_schedule=k)
    p = params0
    s = ms.init(params0)
    for x in xs:
        g = jax.grad(loss_fn)(p, x)
        u, s = ms.update(g, s, p)
        p = optax.apply_updates(p, u)

    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-8)


def test_multi_transform_psgd_matrices_adam_vectors():
    """The mixed production recipe: PSGD-Kron whitening on >=2-D leaves,
    Adam on the rest, via vanilla optax.multi_transform."""
    key = jax.random.key(1)
    params0, loss_fn = _quadratic_problem(key)
    labels = jax.tree_util.tree_map(
        lambda x: "psgd" if x.ndim >= 2 else "adam", params0)
    kron = popt.kron_whiten(learning_rate=1e-2,
                            preconditioner_init_scale=1.0,
                            preconditioner_update_probability=1.0)
    adam = optax.adam(1e-2)
    opt = optax.multi_transform({"psgd": kron, "adam": adam}, labels)

    x = jax.random.normal(jax.random.fold_in(key, 3), (8, 16))

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p, x)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    p, s = params0, opt.init(params0)
    l0 = float(loss_fn(p, x))
    for _ in range(50):
        p, s, loss = step(p, s)
    assert float(loss) < 0.2 * l0

    # the partitioned trajectories equal their solo counterparts run on
    # the same joint path (state bookkeeping is not entangled)
    ps, ss = params0, opt.init(params0)
    solo = params0
    sk = kron.init({"w": params0["w"]})
    sa = adam.init({"b": params0["b"]})
    for _ in range(3):
        g = jax.grad(loss_fn)(ps, x)
        u, ss = opt.update(g, ss, ps)
        ps = optax.apply_updates(ps, u)

        g2 = jax.grad(loss_fn)(solo, x)
        uk, sk = kron.update({"w": g2["w"]}, sk, {"w": solo["w"]})
        ua, sa = adam.update({"b": g2["b"]}, sa, {"b": solo["b"]})
        solo = {"w": optax.apply_updates({"w": solo["w"]}, uk)["w"],
                "b": optax.apply_updates({"b": solo["b"]}, ua)["b"]}
        np.testing.assert_allclose(np.asarray(ps["w"]),
                                   np.asarray(solo["w"]),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ps["b"]),
                                   np.asarray(solo["b"]),
                                   rtol=1e-6, atol=1e-8)


def test_apply_if_finite_shields_psgd_state():
    key = jax.random.key(2)
    params0, loss_fn = _quadratic_problem(key)
    opt = optax.apply_if_finite(
        popt.kron_whiten(learning_rate=1e-2, preconditioner_init_scale=1.0,
                         preconditioner_update_probability=1.0),
        max_consecutive_errors=3)
    x = jax.random.normal(jax.random.fold_in(key, 3), (8, 16))
    p, s = params0, opt.init(params0)
    g = jax.grad(loss_fn)(p, x)
    u, s = opt.update(g, s, p)
    p1 = optax.apply_updates(p, u)
    inner_count_1 = int(s.inner_state[0].count)

    bad = jax.tree_util.tree_map(lambda t: jnp.full_like(t, jnp.nan), g)
    u, s = opt.update(bad, s, p1)
    p2 = optax.apply_updates(p1, u)
    # params unchanged, inner PSGD count not advanced, error counted
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s.inner_state[0].count) == inner_count_1
    assert int(s.notfinite_count) == 1
    assert bool(jnp.all(jnp.isfinite(
        jax.tree_util.tree_leaves(p2)[0])))
