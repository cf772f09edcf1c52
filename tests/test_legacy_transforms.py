"""Optax-transform tests for the legacy preconditioner families (the
reference's deprecated classes LRA/UVd, XMat, Newton, Affine — each with
preconditioner_type 'Newton'|'whitening', preconditioned...py:756-2244)."""

import jax
import jax.numpy as jnp
import optax
import pytest

import psgd_torch_tpu.optim as popt


def _quad():
    h = jnp.diag(10.0 ** jnp.linspace(-1, 1, 32))
    w_star = jax.random.normal(jax.random.key(0), (32,))

    def loss_fn(w):
        d = w.reshape(-1) - w_star
        return 0.5 * jnp.sum(d * (h @ d))

    return loss_fn


CASES = [
    ("xmat-whiten", popt.xmat, {}, False, (32,)),
    ("xmat-newton", popt.xmat, {"preconditioner_type": "Newton"}, True, (32,)),
    ("splu-whiten", popt.splu, {"rank": 5}, False, (32,)),
    ("splu-newton", popt.splu,
     {"rank": 5, "preconditioner_type": "Newton"}, True, (32,)),
    ("newton_inv", popt.newton_inv,
     {"preconditioner_type": "Newton"}, True, (32,)),
    ("uvd-whiten", popt.uvd, {"rank": 5}, False, (32,)),
    ("uvd-newton", popt.uvd,
     {"rank": 5, "preconditioner_type": "Newton"}, True, (32,)),
    ("affine-whiten", popt.affine, {}, False, (8, 4)),
    ("affine-newton", popt.affine,
     {"preconditioner_type": "Newton"}, True, (8, 4)),
]


@pytest.mark.parametrize("name,factory,kw,newton,shape", CASES)
def test_legacy_transform_converges(name, factory, kw, newton, shape):
    loss_fn = _quad()
    opt = factory(optax.linear_schedule(0.5, 0.0, 500), momentum=0.9,
                  grad_clip_max_norm=10.0, **kw)
    w = jnp.zeros(shape)
    state = opt.init(w)

    @jax.jit
    def step(w, state):
        grads = jax.grad(loss_fn)(w)
        kwu = {"hvp_fn": popt.make_hvp_fn(loss_fn)} if newton else {}
        updates, state = opt.update(grads, state, w, **kwu)
        return optax.apply_updates(w, updates), state

    for _ in range(500):
        w, state = step(w, state)
    final = float(loss_fn(w))
    assert final < 1e-3, f"{name}: {final}"


def test_step_normalizer_first_order():
    loss_fn = _quad()
    opt = popt.xmat(optax.linear_schedule(0.5, 0.0, 400),
                    step_normalizer="1st", momentum=0.9,
                    grad_clip_max_norm=10.0)
    w = jnp.zeros(32)
    state = opt.init(w)

    @jax.jit
    def step(w, state):
        grads = jax.grad(loss_fn)(w)
        updates, state = opt.update(grads, state, w)
        return optax.apply_updates(w, updates), state

    for _ in range(400):
        w, state = step(w, state)
    assert float(loss_fn(w)) < 1e-2


def test_bad_preconditioner_type():
    with pytest.raises(ValueError):
        popt.scale_by_xmat(preconditioner_type="bogus")
    with pytest.raises(ValueError):
        popt.scale_by_affine(preconditioner_type="bogus")


def test_splu_tiny_model_rank_clamped():
    """SPLU rank is clamped to n-1 for tiny parameter vectors."""
    opt = popt.splu(0.1, rank=10)
    w = jnp.zeros(6)
    state = opt.init(w)  # must not raise
    g = jnp.ones(6)
    u, _ = jax.jit(opt.update)(g, state, w)
    assert jnp.all(jnp.isfinite(u))
