"""Delayed-XOR with a vanilla tanh RNN and KronWhiten (parity with
reference rnn_xor_problem_general_purpose_preconditioner.py: success is
loss < 0.1, a regime where first-order optimizers fail)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import rnn


def main(seq_len=50, batch=128, dim_hidden=30):
    key = jax.random.key(0)
    params = rnn.init_rnn(jax.random.fold_in(key, 1), dim_hidden=dim_hidden)

    def loss_fn(p, xs, target):
        return rnn.xor_loss(rnn.apply_rnn(p, xs), target)

    # reference settings (rnn_xor...py:56-57)
    opt = popt.kron_whiten(learning_rate=1e-3, preconditioner_init_scale=1.0,
                           lr_preconditioner=0.01)
    state = opt.init(params)

    @jax.jit
    def step(params, state, xs, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, target)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for i in range(100_000):
        xs, target = rnn.xor_batch(jax.random.fold_in(key, 10 + i), batch, seq_len)
        params, state, loss = step(params, state, xs, target)
        if i % 500 == 0:
            print(f"iter {i}: loss {float(loss):.4f}")
        if float(loss) < 0.1:
            print(f"Successful at iteration {i} (loss {float(loss):.4f})")
            break


if __name__ == "__main__":
    main()
