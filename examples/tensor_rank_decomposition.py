"""Tensor-rank (CP) decomposition: the reference's showcase comparing all
Newton-type preconditioners (demo_usage_of_all_preconditioners.py:13-193).

Decompose a rank-10 target T[i,j,k] = sum_r x[r,i] y[r,j] z[r,k] with
(I, J, K) = (20, 50, 100), comparing SGD, DenseNewton, LRANewton and
KronNewton in loss-vs-iteration.  Every optimizer runs the same jitted
step; PSGD variants get exact Hvps via jax.jvp (optim.hvp.make_hvp_fn).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt

R, I, J, K = 10, 20, 50, 100
NUM_ITERS = 2000


def make_problem(key):
    k1, k2 = jax.random.split(key)
    truth = [jax.random.normal(jax.random.fold_in(k1, i), (R, s))
             for i, s in enumerate((I, J, K))]
    target = jnp.einsum("ri,rj,rk->ijk", *truth)
    init = [jax.random.normal(jax.random.fold_in(k2, i), (R, s))
            for i, s in enumerate((I, J, K))]

    def loss_fn(xyz):
        err = target - jnp.einsum("ri,rj,rk->ijk", *xyz)
        return jnp.sum(err * err)

    return loss_fn, init


def run(name, opt, loss_fn, params, newton=False):
    state = opt.init(params)
    hvp_fn = popt.make_hvp_fn(loss_fn) if newton else None

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        kw = {"hvp_fn": hvp_fn} if newton else {}
        updates, state = opt.update(grads, state, params, **kw)
        return optax.apply_updates(params, updates), state, loss

    params, state, _ = step(params, state)  # compile outside the clock
    t0 = time.time()
    losses = []
    for _ in range(NUM_ITERS):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    dt = time.time() - t0
    print(f"{name:>14s}: final loss {losses[-1]:.3e}  "
          f"min {min(losses):.3e}  ({dt:.1f}s, {1e3*dt/NUM_ITERS:.2f} ms/it)")
    return losses


def run_lbfgs(loss_fn, params):
    """optax.lbfgs baseline (the reference compares against LM-BFGS,
    demo_usage_of_all_preconditioners.py:40-60) with its linesearch."""
    opt = optax.lbfgs()
    state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def step(params, state):
        loss, grads = value_and_grad(params, state=state)
        updates, state = opt.update(grads, state, params, value=loss,
                                    grad=grads, value_fn=loss_fn)
        return optax.apply_updates(params, updates), state, loss

    params, state, _ = step(params, state)
    t0 = time.time()
    losses = []
    for _ in range(NUM_ITERS):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    dt = time.time() - t0
    print(f"{'L-BFGS':>14s}: final loss {losses[-1]:.3e}  "
          f"min {min(losses):.3e}  ({dt:.1f}s, {1e3*dt/NUM_ITERS:.2f} ms/it)")
    return losses


def main():
    loss_fn, init = make_problem(jax.random.key(0))

    # SGD baseline: diverges easily above lr=1e-4 on this problem
    run("SGD", optax.sgd(1e-4), loss_fn, list(init))

    run_lbfgs(loss_fn, list(init))

    run("DenseNewton",
        popt.dense_newton(learning_rate=0.2, lr_preconditioner=0.5,
                          momentum=0.9, grad_clip_max_norm=10.0),
        loss_fn, list(init), newton=True)

    run("LRANewton",
        popt.lra_newton(learning_rate=0.2, rank_of_approximation=10,
                        lr_preconditioner=0.5, momentum=0.9,
                        grad_clip_max_norm=10.0),
        loss_fn, list(init), newton=True)

    run("KronNewton",
        popt.kron_newton(learning_rate=0.2, lr_preconditioner=0.5,
                         momentum=0.9, grad_clip_max_norm=10.0),
        loss_fn, list(init), newton=True)


if __name__ == "__main__":
    main()
