"""Closure-style class API tests (reference L2 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_torch_tpu.optim import classes

import pytest as _pytest

pytestmark = _pytest.mark.slow


def rosenbrock(x):
    x1, x2 = x[0::2], x[1::2]
    return jnp.sum(100.0 * (x2 - x1 ** 2) ** 2 + (1.0 - x1) ** 2)


def test_dense_newton_class_rosenbrock():
    params = jnp.zeros(50)
    opt = classes.DenseNewton(params, lr_params=1.0, lr_preconditioner=0.5,
                              momentum=0.9)
    for _ in range(1500):
        loss, params = opt.step(rosenbrock, params)
    assert float(loss) < 1e-7, float(loss)


def test_kron_whiten_class_with_batch_args_and_annealing():
    h = jnp.diag(10.0 ** jnp.linspace(-1, 1, 12))
    w_star = jax.random.normal(jax.random.key(0), (12, 4))

    def loss_fn(w, scale):
        d = w - w_star
        return 0.5 * jnp.sum(d * (h @ d)) * scale

    params = jnp.zeros((12, 4))
    opt = classes.KronWhiten(params, lr_params=0.05,
                             preconditioner_init_scale=1.0)
    for i in range(300):
        # mutable-on-the-fly hyperparameters (reference docstring contract)
        opt.lr_params = 0.05 * (1.0 - i / 300)
        if i == 150:
            opt.preconditioner_update_probability = 0.5  # rebuild path
        loss, params = opt.step(loss_fn, params, jnp.asarray(1.0))
    assert float(loss) < 1e-3, float(loss)


def test_kron_newton_class_finite_diff():
    h = jnp.diag(10.0 ** jnp.linspace(-1, 1, 10))

    def loss_fn(w):
        return 0.5 * w @ (h @ w)

    params = jnp.ones(10)
    opt = classes.KronNewton(params, lr_params=0.5, grad_clip_max_norm=10.0,
                             exact_hessian_vector_product=False)
    for _ in range(200):
        loss, params = opt.step(loss_fn, params)
    assert float(loss) < 1e-6, float(loss)


def test_lra_classes_run():
    def loss_fn(w):
        return 0.5 * jnp.sum(w ** 2 * jnp.linspace(0.1, 10.0, w.size))

    params = jnp.ones(30)
    opt = classes.LRANewton(params, rank_of_approximation=5, lr_params=0.5,
                            grad_clip_max_norm=10.0)
    for _ in range(300):
        loss, params = opt.step(loss_fn, params)
    assert float(loss) < 1e-5, float(loss)

    params2 = jnp.ones(30)
    opt2 = classes.LRAWhiten(params2, rank_of_approximation=5, lr_params=0.02)
    l0 = float(loss_fn(params2))
    for _ in range(300):
        loss2, params2 = opt2.step(loss_fn, params2)
    assert float(loss2) < 0.1 * l0


def test_all_hyperparameters_mutable():
    """Assigning ANY constructor hyperparameter takes effect on the next
    step (reference contract; previously only a subset rebuilt the
    transform)."""
    def loss_fn(p):
        return jnp.sum(p ** 2 * jnp.linspace(1.0, 5.0, 8))

    opt = classes.KronWhiten(jnp.ones(8), preconditioner_init_scale=1.0,
                             lr_params=0.1)
    p = jnp.ones(8)
    _, p1 = opt.step(loss_fn, p)
    # clamp everything: the update must now be elementwise-bounded by 1e-4
    opt.grad_clip_max_amps = (1e-5, 1e-5)
    _, p2 = opt.step(loss_fn, p)
    assert float(jnp.max(jnp.abs(p2 - p))) <= 0.1 * 1e-5 + 1e-12
    assert float(jnp.max(jnp.abs(p1 - p))) > 1e-4


def test_jit_cache_bounded():
    """A fresh lambda per step triggers the recompile warning and cache
    reset instead of unbounded growth."""
    import warnings

    opt = classes.KronWhiten(jnp.ones(4), preconditioner_init_scale=1.0)
    p = jnp.ones(4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        for i in range(10):
            _, p = opt.step(lambda x, _i=i: jnp.sum(x ** 2), p)
    assert len(opt._jit_cache) <= opt._MAX_JIT_CACHE
    assert any("recompil" in str(x.message) for x in w)


def test_step_has_aux_tuple_closure():
    """Reference closures may return a tuple with the loss first
    (psgd.py:594-596): has_aux=True accepts (loss, aux) and returns it."""
    h = jnp.diag(jnp.linspace(0.5, 5.0, 8))

    def loss_fn(w):
        loss = 0.5 * w @ (h @ w)
        return loss, {"resid": w - 1.0, "n": jnp.sum(w)}

    params = jnp.ones(8)
    opt = classes.KronWhiten(params, lr_params=0.2,
                             preconditioner_init_scale=1.0)
    for i in range(200):
        opt.lr_params = 0.2 * (1.0 - i / 200)  # whitened updates need anneal
        prev = params
        (loss, aux), params = opt.step(loss_fn, params, has_aux=True)
    assert float(loss) < 1e-3, float(loss)
    assert set(aux) == {"resid", "n"}
    # aux is evaluated at the pre-step params (the closure's input)
    np.testing.assert_allclose(float(aux["n"]), float(jnp.sum(prev)),
                               rtol=1e-6)


def test_step_has_aux_newton_hvp():
    """has_aux composes with the Hvp (Newton) path: the scalar view feeds
    the Hessian-vector product while aux is returned untouched."""
    h = jnp.diag(10.0 ** jnp.linspace(-1, 1, 10))

    def loss_fn(w):
        return 0.5 * w @ (h @ w), jnp.max(jnp.abs(w))

    params = jnp.ones(10)
    opt = classes.KronNewton(params, lr_params=0.5, grad_clip_max_norm=10.0)
    for _ in range(300):
        prev = params
        (loss, amax), params = opt.step(loss_fn, params, has_aux=True)
    assert float(loss) < 1e-6, float(loss)
    np.testing.assert_allclose(float(amax), float(jnp.max(jnp.abs(prev))),
                               rtol=1e-5)
