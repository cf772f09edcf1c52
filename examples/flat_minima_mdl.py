"""Why PSGD generalizes: a description-length (MDL) view — parity with the
reference study misc/how_psgd_generalize.py.

Train the same LeNet5 with Adam and with PSGD-Kron-whitening, then estimate
log det(Hessian) at each solution by fitting a *dummy* LRA preconditioner
with exact Hvp pairs: at the fixed point P = H^-1, so
log det(H) = -2 log det(Q) = -2 (sum log d + log det(I + V^T U)).
A flatter minimum (smaller log det H) needs fewer bits to encode its params —
the information-theoretic account of why PSGD's solutions generalize better
than Adam's at matched train loss.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import lenet5
from psgd_torch_tpu.precond import lra

TRAIN_STEPS = 400
HESS_STEPS = 300
BATCH = 64
RANK = 10


def train(name, opt, key):
    params = lenet5.init_lenet5(jax.random.key(42))
    state = opt.init(params)

    @jax.jit
    def step(params, state, images, labels):
        loss, grads = jax.value_and_grad(lenet5.loss_lenet5)(params, images,
                                                             labels)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for i in range(TRAIN_STEPS):
        kd = jax.random.fold_in(key, i)
        images, labels = lenet5.synthetic_mnist(kd, BATCH)
        params, state, loss = step(params, state, images, labels)
    return params, float(loss)


def estimate_logdet_hessian(params, key):
    """Fit a dummy LRA preconditioner with (v, Hv) pairs at fixed params."""
    import jax.flatten_util
    vec, unravel = jax.flatten_util.ravel_pytree(params)
    st = lra.init_lra(vec.size, RANK, jax.random.fold_in(key, 0), 1.0,
                      jnp.float32)

    images, labels = lenet5.synthetic_mnist(jax.random.fold_in(key, 1), 512)

    def loss_vec(v):
        return lenet5.loss_lenet5(unravel(v), images, labels)

    @jax.jit
    def fit(st, k, lr):
        v = jax.random.normal(k, vec.shape)
        _, hv = jax.jvp(jax.grad(loss_vec), (vec,), (v,))
        return lra.update_lra_newton(st, v, hv, jax.random.fold_in(k, 1),
                                     lr=lr, damping=1e-9)

    for i in range(HESS_STEPS):
        lr = 0.1 * (0.01 ** (i / HESS_STEPS))  # annealed like the reference
        st = fit(st, jax.random.fold_in(key, 100 + i), lr)
    return -2.0 * float(lra.log_det(st))


def main():
    key = jax.random.key(0)
    runs = [
        ("adam", optax.adam(1e-3)),
        ("psgd-kron", popt.kron_whiten(learning_rate=1e-3, momentum=0.9,
                                       preconditioner_max_skew=2.0)),
    ]
    for name, opt in runs:
        params, train_loss = train(name, opt, key)
        logdet_h = estimate_logdet_hessian(params, jax.random.fold_in(key, 7))
        print(f"{name:>10s}: train loss {train_loss:.4f}   "
              f"log det(Hessian) ~ {logdet_h:.1f}   "
              f"(smaller = flatter = shorter description length)")


if __name__ == "__main__":
    main()
