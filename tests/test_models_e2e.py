"""End-to-end training tests on the demo models (reference demo parity:
XOR success = loss < 0.1; tiny-GPT2/LeNet/ViT losses must descend)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import gpt2, lenet5, rnn, vit

import pytest as _pytest

pytestmark = _pytest.mark.slow


def test_lenet5_synthetic_classification():
    key = jax.random.key(0)
    params = lenet5.init_lenet5(jax.random.fold_in(key, 1))
    # whitening normalizes update amplitude: the stable operating point is an
    # Adam-like lr (reference default lr_params=1e-3, psgd.py:539)
    opt = popt.kron_whiten(learning_rate=2e-3, momentum=0.9,
                           preconditioner_init_scale=1.0)
    state = opt.init(params)

    @jax.jit
    def step(params, state, images, labels):
        loss, grads = jax.value_and_grad(lenet5.loss_lenet5)(params, images, labels)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for i in range(250):
        images, labels = lenet5.synthetic_mnist(jax.random.fold_in(key, 100 + i), 128)
        params, state, loss = step(params, state, images, labels)
        losses.append(float(loss))
    tail = sum(losses[-25:]) / 25
    assert tail < 0.3, f"LeNet tail loss {tail} ({losses[:2]} -> {losses[-2:]})"
    images, labels = lenet5.synthetic_mnist(jax.random.fold_in(key, 9999), 512)
    acc = float(jnp.mean(jnp.argmax(lenet5.apply_lenet5(params, images), -1) == labels))
    assert acc > 0.9, f"LeNet test accuracy {acc}"


@pytest.mark.parametrize("cell", ["rnn", "lstm"])
def test_xor_problem_kron_newton(cell):
    """Delayed-XOR (seq 16 for test speed; reference uses 50+ and succeeds
    where first-order optimizers fail).  Success: loss < 0.1."""
    seq_len, batch = 16, 128
    key = jax.random.key(42)
    if cell == "rnn":
        params = rnn.init_rnn(jax.random.fold_in(key, 1), dim_hidden=20)
        apply_fn = rnn.apply_rnn
    else:
        params = rnn.init_lstm(jax.random.fold_in(key, 1), dim_hidden=20)
        apply_fn = rnn.apply_lstm

    def loss_fn(p, xs, target):
        return rnn.xor_loss(apply_fn(p, xs), target)

    # reference settings: KronWhiten(init_scale=1.0, lr_params=1e-3,
    # lr_preconditioner=0.01), train until loss < 0.1
    # (rnn_xor...py:56-67); slightly hotter lr for test budget.
    opt = popt.kron_whiten(learning_rate=3e-3, preconditioner_init_scale=1.0,
                           lr_preconditioner=0.05)
    state = opt.init(params)

    @jax.jit
    def step(params, state, xs, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, target)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    success = False
    for i in range(4000):
        xs, target = rnn.xor_batch(jax.random.fold_in(key, 1000 + i), batch, seq_len)
        params, state, loss = step(params, state, xs, target)
        if float(loss) < 0.1:
            success = True
            break
    assert success, f"{cell} XOR never reached loss < 0.1 (last {float(loss)})"


def test_hvp_through_scan():
    """The Newton path must differentiate through lax.scan (SURVEY.md §7
    hard-parts list: Hvp-through-scan)."""
    key = jax.random.key(7)
    params = rnn.init_lstm(key, dim_hidden=8)
    xs, target = rnn.xor_batch(jax.random.fold_in(key, 1), 16, 12)

    def loss_fn(p):
        return rnn.xor_loss(rnn.apply_lstm(p, xs), target)

    vs = popt.rand_like_tree(jax.random.fold_in(key, 2), params)
    grads, hvs = popt.hvp_exact(loss_fn, params, vs)
    _, hvs_fd = popt.hvp_finite_diff(loss_fn, params, vs)
    for a, b in zip(jax.tree_util.tree_leaves(hvs),
                    jax.tree_util.tree_leaves(hvs_fd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2, rtol=0.1)


def test_gpt2_tiny_trains_with_scanned_layers():
    cfg = gpt2.tiny_config(n_layer=2, n_embd=64, n_head=4, vocab_size=256,
                           block_size=32, compute_dtype=jnp.float32)
    key = jax.random.key(3)
    params = gpt2.init_gpt2(jax.random.fold_in(key, 0), cfg)
    mask = gpt2.scanned_layers_mask(params)
    opt = popt.kron_whiten(learning_rate=1e-3, momentum=0.9,
                           preconditioner_max_skew=2.0, scanned_layers=mask)
    state = opt.init(params)

    @jax.jit
    def step(params, state, toks, tgts):
        loss, grads = jax.value_and_grad(gpt2.loss_gpt2)(params, toks, tgts, cfg)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for i in range(60):
        toks, tgts = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 50 + i),
                                             16, 32, cfg.vocab_size)
        params, state, loss = step(params, state, toks, tgts)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1.0, f"GPT2 tiny: {losses[0]} -> {losses[-1]}"


def test_scanned_layers_match_per_layer_semantics():
    """A stacked (L, m, n) leaf with scanned_layers=True must produce exactly
    the same updates as L separate (m, n) leaves."""
    l, m, n = 3, 8, 6
    key = jax.random.key(9)
    w = jax.random.normal(key, (l, m, n))
    g = jax.random.normal(jax.random.fold_in(key, 1), (l, m, n))

    tx_stacked = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0,
                                           scanned_layers={"w": True}, seed=5)
    s1 = tx_stacked.init({"w": w})
    u1, s1 = tx_stacked.update({"w": g}, s1)

    # per-layer reference: same seed so the balance/update draws differ only
    # in the per-leaf fold_in — compare Q structure and descent direction
    # qualitatively per layer instead of bitwise.
    tx_single = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0, seed=5)
    for i in range(l):
        s2 = tx_single.init({"w": w[i]})
        u2, s2 = tx_single.update({"w": g[i]}, s2)
        q_stacked = [q[i] for q in s1.precond[0].q]
        q_single = list(s2.precond[0].q)
        for a, b in zip(q_stacked, q_single):
            assert a.shape == b.shape
        # the whitening direction must agree in sign pattern strongly
        cos = float(jnp.sum(u1["w"][i] * u2["w"]) /
                    (jnp.linalg.norm(u1["w"][i]) * jnp.linalg.norm(u2["w"])))
        assert cos > 0.95, f"layer {i}: cosine {cos}"


def test_vit_tiny_trains():
    cfg = vit.ViTConfig(dim=64, depth=2, heads=4, compute_dtype=jnp.float32)
    key = jax.random.key(5)
    params = vit.init_vit(jax.random.fold_in(key, 0), cfg)
    opt = popt.kron_whiten(learning_rate=3e-3, momentum=0.9,
                           preconditioner_max_skew=2.0,
                           scanned_layers=vit.scanned_layers_mask(params))
    state = opt.init(params)

    @jax.jit
    def step(params, state, images, labels):
        loss, grads = jax.value_and_grad(vit.loss_vit)(params, images, labels, cfg)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for i in range(80):
        images, labels = vit.synthetic_cifar(jax.random.fold_in(key, 100 + i), 32)
        params, state, loss = step(params, state, images, labels)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], f"ViT: {losses[0]} -> {losses[-1]}"
