"""Recurrent models for the delayed-XOR problem (the reference's hard
long-horizon benchmark: lstm_with_xor_problem.py and
rnn_xor_problem_general_purpose_preconditioner.py).

The task: a sequence of (value, marker) pairs; exactly two positions are
marked; the target is XOR of the two marked values — unlearnable for most
first-order optimizers at seq_len ~ 50+ with plain RNNs.  Success criterion
in the reference: loss < 0.1 (lstm_with_xor_problem.py:72-74).

Both cells run under lax.scan; Hvp-through-scan works with jax.jvp (the
Newton path requirement, SURVEY.md §7 build order step 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_rnn(key: jax.Array, dim_in: int = 2, dim_hidden: int = 30,
             dim_out: int = 1, dtype=jnp.float32) -> dict:
    """Input block 0.1*randn, recurrent block orthogonal (essential for
    gradient flow over long horizons — reference get_rand_orth,
    rnn_xor_problem_general_purpose_preconditioner.py:33-44), bias zero."""
    k1, k2, k3 = jax.random.split(key, 3)
    w_in = 0.1 * jax.random.normal(k1, (dim_in, dim_hidden))
    w_rec, _ = jnp.linalg.qr(jax.random.normal(k2, (dim_hidden, dim_hidden)))
    w1 = jnp.concatenate([w_in, w_rec, jnp.zeros((1, dim_hidden))])
    w2 = jnp.concatenate([0.1 * jax.random.normal(k3, (dim_hidden, dim_out)),
                          jnp.zeros((1, dim_out))])
    return {"w1": w1.astype(dtype), "w2": w2.astype(dtype)}


def apply_rnn(params: dict, xs: jax.Array) -> jax.Array:
    """xs: (T, B, dim_in) -> (B, dim_out); tanh RNN, readout on last state."""
    t, b, _ = xs.shape
    dim_hidden = params["w1"].shape[1]
    h0 = jnp.zeros((b, dim_hidden), xs.dtype)
    w1, b1 = params["w1"][:-1], params["w1"][-1]
    w2, b2 = params["w2"][:-1], params["w2"][-1]

    def cell(h, x):
        h = jnp.tanh(jnp.concatenate([x, h], axis=1) @ w1 + b1)
        return h, None

    h, _ = jax.lax.scan(cell, h0, xs)
    return h @ w2 + b2


def init_lstm(key: jax.Array, dim_in: int = 2, dim_hidden: int = 30,
              dim_out: int = 1, dtype=jnp.float32) -> dict:
    """LSTM with all four gates in one affine param (reference builds a
    custom LSTM cell, lstm_with_xor_problem.py:23-45)."""
    k1, k2 = jax.random.split(key)
    fan = dim_in + dim_hidden
    w = jax.random.normal(k1, (fan + 1, 4 * dim_hidden)) * fan ** -0.5
    w = w.at[-1].set(0.0)
    # forget-gate bias 1 for gradient flow over long horizons
    w = w.at[-1, dim_hidden:2 * dim_hidden].set(1.0)
    w2 = jax.random.normal(k2, (dim_hidden + 1, dim_out)) * dim_hidden ** -0.5
    return {"w_gates": w.astype(dtype), "w_out": w2.astype(dtype)}


def apply_lstm(params: dict, xs: jax.Array) -> jax.Array:
    t, b, _ = xs.shape
    dim_hidden = params["w_out"].shape[0] - 1
    wg, bg = params["w_gates"][:-1], params["w_gates"][-1]
    w2, b2 = params["w_out"][:-1], params["w_out"][-1]
    h0 = jnp.zeros((b, dim_hidden), xs.dtype)
    c0 = jnp.zeros((b, dim_hidden), xs.dtype)

    def cell(carry, x):
        h, c = carry
        z = jnp.concatenate([x, h], axis=1) @ wg + bg
        i, f, g, o = jnp.split(z, 4, axis=1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), None

    (h, _), _ = jax.lax.scan(cell, (h0, c0), xs)
    return h @ w2 + b2


def xor_batch(key: jax.Array, batch_size: int, seq_len: int):
    """Delayed-XOR data (reference generate_train_data,
    lstm_with_xor_problem.py:47-60): values in {±1}, two random marked
    positions (one in the first half, one in the second half per the classic
    construction), target = XOR of marked values."""
    kv, k1, k2 = jax.random.split(key, 3)
    values = jnp.sign(jax.random.normal(kv, (seq_len, batch_size)))
    values = jnp.where(values == 0, 1.0, values)
    i = jax.random.randint(k1, (batch_size,), 0, seq_len // 2)
    j = jax.random.randint(k2, (batch_size,), seq_len // 2, seq_len)
    pos = jnp.arange(seq_len)[:, None]
    marker = ((pos == i[None]) | (pos == j[None])).astype(values.dtype)
    xs = jnp.stack([values, marker], axis=-1)  # (T, B, 2)
    va = jnp.take_along_axis(values, i[None], axis=0)[0]
    vb = jnp.take_along_axis(values, j[None], axis=0)[0]
    target = (va * vb)[:, None]  # XOR in ±1 encoding
    return xs, target


def xor_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Logistic loss in the ±1 encoding (reference train_criterion,
    lstm_with_xor_problem.py:63-65)."""
    return -jnp.mean(jnp.log(jax.nn.sigmoid(logits * target) + 1e-30))
