"""Torch <-> JAX parameter interop (migration path for reference users)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from psgd_torch_tpu.utils import torch_interop as ti


def test_round_trip_state_dict():
    m = torch.nn.Sequential(torch.nn.Linear(4, 8), torch.nn.Linear(8, 2))
    sd = m.state_dict()
    params = ti.from_torch(sd)
    assert params["0"]["weight"].shape == (8, 4)
    back = ti.to_torch(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(sd[k]), np.asarray(back[k]))
    m.load_state_dict(back)  # torch accepts the exported mapping


def test_dtype_cast_and_flat():
    sd = {"w": torch.ones(3, 3, dtype=torch.float32)}
    p = ti.from_torch(sd, nest=False, dtype=jnp.bfloat16)
    assert p["w"].dtype == jnp.bfloat16


def test_train_torch_weights_with_psgd():
    """End-to-end migration: take a torch module's weights, train them with
    kron_whiten in JAX, export back, and verify the torch module's loss
    dropped."""
    import optax
    import psgd_torch_tpu.optim as popt

    torch.manual_seed(0)
    m = torch.nn.Linear(6, 4)
    x = torch.randn(64, 6)
    w_true = torch.randn(6, 4)
    y = x @ w_true + 0.7

    def torch_loss():
        return float(((m(x) - y) ** 2).mean())

    l0 = torch_loss()
    params = ti.from_torch(m.state_dict())
    xj, yj = jnp.asarray(x.numpy()), jnp.asarray(y.numpy())

    def loss_fn(p):
        pred = xj @ p["weight"].T + p["bias"]
        return jnp.mean((pred - yj) ** 2)

    opt = popt.kron_whiten(learning_rate=0.05, preconditioner_init_scale=1.0,
                           momentum=0.9)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(200):
        params, state, _ = step(params, state)

    m.load_state_dict(ti.to_torch(params))
    l1 = torch_loss()
    assert l1 < 0.05 * l0, (l0, l1)


def test_grads_from_torch():
    m = torch.nn.Linear(3, 2)
    out = m(torch.ones(5, 3)).sum()
    out.backward()
    g = ti.grads_from_torch(m)
    assert g["weight"].shape == (2, 3) and g["bias"].shape == (2,)
