"""'Hello world': minimize the 100-dim coupled Rosenbrock function with the
dense Newton-type preconditioner (parity with reference hello_psgd.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt


def rosenbrock(x):
    x1, x2 = x[0::2], x[1::2]
    return jnp.sum(100.0 * (x2 - x1 ** 2) ** 2 + (1.0 - x1) ** 2)


def main():
    params = jnp.zeros(100)
    opt = popt.dense_newton(learning_rate=1.0, lr_preconditioner=0.5,
                            momentum=0.9)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(rosenbrock)(params)
        updates, state = opt.update(grads, state, params,
                                    hvp_fn=popt.make_hvp_fn(rosenbrock))
        return optax.apply_updates(params, updates), state, loss

    for i in range(2000):
        params, state, loss = step(params, state)
        if i % 200 == 0 or i == 1999:
            print(f"iter {i:5d}  f = {float(loss):.3e}")


if __name__ == "__main__":
    main()
