"""Delayed-XOR, the long-horizon recurrence benchmark where first-order
optimizers fail.  Two parity modes:

  --cell rnn  (default): vanilla tanh RNN + KronWhiten — the reference's
      rnn_xor_problem_general_purpose_preconditioner.py:53-68.
  --cell lstm: custom LSTM + KronNewton with exact Hessian-vector products —
      the reference's lstm_with_xor_problem.py:55-74 (which drives the
      functional Kron API with double-backward Hvps; here jax.jvp over grad).

Success = loss < 0.1 (reference threshold).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import rnn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default="rnn", choices=["rnn", "lstm"])
    ap.add_argument("--seq_len", type=int, default=50)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--max_iters", type=int, default=100_000)
    args = ap.parse_args()

    key = jax.random.key(0)
    if args.cell == "rnn":
        params = rnn.init_rnn(jax.random.fold_in(key, 1), dim_hidden=30)
        apply_fn = rnn.apply_rnn
        # reference settings (rnn_xor...py:56-57)
        opt = popt.kron_whiten(learning_rate=1e-3,
                               preconditioner_init_scale=1.0,
                               lr_preconditioner=0.01)
        newton = False
    else:
        params = rnn.init_lstm(jax.random.fold_in(key, 1), dim_hidden=30)
        apply_fn = rnn.apply_lstm
        # the reference LSTM demo fits a Newton-type Kron preconditioner
        # with exact Hvps (lstm_with_xor_problem.py:59-66)
        opt = popt.kron_newton(learning_rate=0.02, preconditioner_init_scale=1.0,
                               lr_preconditioner=0.1, grad_clip_max_norm=10.0)
        newton = True

    def loss_fn(p, xs, target):
        return rnn.xor_loss(apply_fn(p, xs), target)

    state = opt.init(params)

    @jax.jit
    def step(params, state, xs, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, target)
        kw = ({"hvp_fn": popt.make_hvp_fn(loss_fn, xs, target)}
              if newton else {})
        updates, state = opt.update(grads, state, params, **kw)
        return optax.apply_updates(params, updates), state, loss

    lv = float("nan")
    for i in range(args.max_iters):
        xs, target = rnn.xor_batch(jax.random.fold_in(key, 10 + i),
                                   args.batch, args.seq_len)
        params, state, loss = step(params, state, xs, target)
        lv = float(loss)
        if i % 500 == 0:
            print(f"iter {i}: loss {lv:.4f}")
        if lv < 0.1:
            print(f"SOLVED: loss {lv:.4f} < 0.1 at iter {i} ({args.cell})")
            return
    print(f"not solved within {args.max_iters} iters (loss {lv:.4f})")


if __name__ == "__main__":
    main()
