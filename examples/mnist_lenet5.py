"""LeNet5 classification with the *legacy functional* Kron API — parity with
the reference's mnist_with_lenet5.py:53-72, which drives the shape-dispatching
update_precond_kron / precond_grad_kron kernels directly with exact
Hessian-vector products and an lr annealed by (0.01)^(1/(epochs-1)) per epoch.

Runs on synthetic MNIST-like data (no dataset egress in this environment);
swap `synthetic_mnist` for a real loader to reproduce the reference numbers.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from psgd_torch_tpu.models import lenet5
from psgd_torch_tpu.precond import legacy

EPOCHS = 10
STEPS_PER_EPOCH = 100
BATCH = 64


def main():
    key = jax.random.key(0)
    params = lenet5.init_lenet5(key)
    # one (Ql, Qr) pair per affine [W; b] matrix, both sides dense
    qs = [legacy.init_kron_legacy(p.shape) for p in params]

    def loss_fn(params, images, labels):
        return lenet5.loss_lenet5(params, images, labels)

    @jax.jit
    def step(params, qs, lr, key, images, labels):
        k_v, _ = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        # exact Hvp via forward-over-reverse (the reference double-backward)
        vs = [jax.random.normal(jax.random.fold_in(k_v, i), p.shape)
              for i, p in enumerate(params)]
        _, hvs = jax.jvp(lambda p: jax.grad(loss_fn)(p, images, labels),
                         (params,), (vs,))
        qs = [legacy.update_precond_kron(ql, qr, v, h, lr=0.01)
              for (ql, qr), v, h in zip(qs, vs, hvs)]
        pre = [legacy.precond_grad_kron(ql, qr, g)
               for (ql, qr), g in zip(qs, grads)]
        # global-norm trust region (reference mnist_with_lenet5.py:66-68)
        norm = jnp.sqrt(sum(jnp.sum(g * g) for g in pre))
        scale = lr * jnp.minimum(1.0, 10.0 / norm)
        params = [p - scale * g for p, g in zip(params, pre)]
        return params, qs, loss

    lr = 0.1
    for epoch in range(EPOCHS):
        total = 0.0
        for i in range(STEPS_PER_EPOCH):
            kd = jax.random.fold_in(key, epoch * STEPS_PER_EPOCH + i)
            images, labels = lenet5.synthetic_mnist(kd, BATCH)
            params, qs, loss = step(params, qs, lr, kd, images, labels)
            total += float(loss)
        # test accuracy on a held-out synthetic batch
        ti, tl = lenet5.synthetic_mnist(jax.random.key(999), 1000)
        acc = float(jnp.mean(
            jnp.argmax(lenet5.apply_lenet5(params, ti), axis=1) == tl))
        print(f"epoch {epoch + 1:2d}  lr {lr:.4f}  "
              f"train loss {total / STEPS_PER_EPOCH:.4f}  test acc {acc:.3f}")
        lr *= 0.01 ** (1.0 / (EPOCHS - 1))  # reference annealing schedule


if __name__ == "__main__":
    main()
