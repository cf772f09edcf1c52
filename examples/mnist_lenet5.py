"""LeNet5 classification with the *legacy functional* Kron API — parity with
the reference's mnist_with_lenet5.py:53-72, which drives the shape-dispatching
update_precond_kron / precond_grad_kron kernels directly with exact
Hessian-vector products and an lr annealed by (0.01)^(1/(epochs-1)) per epoch.

Data: REAL images by default — the UCI handwritten digits scikit-learn
ships in-package (models/image_data.py; MNIST itself needs a download this
environment cannot do).  Falls back to synthetic data without sklearn.
Comparative Adam-vs-PSGD numbers: tools/run_image_comparisons.py ->
results/lenet5_digits.json.
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


def load_data():
    """(train_batch_fn, test_set): real digits if sklearn is available."""
    try:
        from psgd_torch_tpu.models import image_data
        tr_x, tr_y, te_x, te_y = image_data.load_digits_split()
        x = jnp.asarray(image_data.digits_resized(tr_x, 32, 1))
        y = jnp.asarray(tr_y)
        tx = jnp.asarray(image_data.digits_resized(te_x, 32, 1))
        ty = jnp.asarray(te_y)

        def batch(key, n):
            idx = jax.random.randint(key, (n,), 0, x.shape[0])
            return x[idx], y[idx]

        print(f"data: real UCI digits ({x.shape[0]} train / {tx.shape[0]} test)")
        return batch, (tx, ty)
    except ImportError:
        print("data: synthetic (sklearn not available)")
        return (lambda key, n: lenet5.synthetic_mnist(key, n),
                lenet5.synthetic_mnist(jax.random.key(999), 1000))


def main():
    key = jax.random.key(0)
    batch_fn, (test_x, test_y) = load_data()
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
            images, labels = batch_fn(kd, BATCH)
            params, qs, loss = step(params, qs, lr, kd, images, labels)
            total += float(loss)
        acc = float(jnp.mean(
            jnp.argmax(lenet5.apply_lenet5(params, test_x), axis=1)
            == test_y))
        print(f"epoch {epoch + 1:2d}  lr {lr:.4f}  "
              f"train loss {total / STEPS_PER_EPOCH:.4f}  test acc {acc:.3f}")
        lr *= 0.01 ** (1.0 / (EPOCHS - 1))  # reference annealing schedule


if __name__ == "__main__":
    main()
