"""Quadratic-feature logistic regression with PSGD-LRA vs SGD — parity with
the reference benchmark (misc/mnist_logistic_regression.py:61-173), where
PSGD-LRA outperforms L-BFGS ("the algorithm of choice" for logistic
regression) on a 6.2M-parameter convex problem.

Features are [x, vec(x xᵀ) upper triangle] of downsampled images; synthetic
MNIST-like data stands in for the real dataset (no egress).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import lenet5

EPOCHS = 20
STEPS_PER_EPOCH = 50
BATCH = 256
SIDE = 16  # downsample 32 -> 16 so the quadratic features stay manageable


def featurize(images):
    """[x; upper-tri of x xᵀ] quadratic features (reference :33-43)."""
    b = images.shape[0]
    x = images.reshape(b, 2, SIDE, 2, SIDE, 1).mean(axis=(1, 3)).reshape(b, -1)
    iu = jnp.triu_indices(x.shape[1])
    quad = (x[:, :, None] * x[:, None, :])[:, iu[0], iu[1]]
    return jnp.concatenate([x, quad], axis=1)


def loss_fn(w, feats, labels):
    logits = feats @ w[:-1] + w[-1]
    return -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits), labels[:, None], axis=1))


def run(name, opt, key, n_feat):
    w = jnp.zeros((n_feat + 1, 10))
    state = opt.init(w)

    @jax.jit
    def step(w, state, feats, labels):
        loss, grads = jax.value_and_grad(loss_fn)(w, feats, labels)
        updates, state = opt.update(grads, state, w)
        return optax.apply_updates(w, updates), state, loss

    ti, tl = lenet5.synthetic_mnist(jax.random.key(999), 2000)
    tf = featurize(ti)
    best_err = 1.0
    for epoch in range(EPOCHS):
        total = 0.0
        for i in range(STEPS_PER_EPOCH):
            kd = jax.random.fold_in(key, epoch * STEPS_PER_EPOCH + i)
            images, labels = lenet5.synthetic_mnist(kd, BATCH)
            w, state, loss = step(w, state, featurize(images), labels)
            total += float(loss)
        err = float(jnp.mean(jnp.argmax(tf @ w[:-1] + w[-1], axis=1) != tl))
        best_err = min(best_err, err)
        print(f"[{name}] epoch {epoch + 1:2d}  "
              f"train loss {total / STEPS_PER_EPOCH:.4f}  "
              f"best test err {best_err:.4f}")


def run_lbfgs(key, n_feat):
    """Stochastic L-BFGS baseline ("the algorithm of choice" the reference
    compares PSGD-LRA against, misc/mnist_logistic_regression.py:90)."""
    w = jnp.zeros((n_feat + 1, 10))
    opt = optax.lbfgs(memory_size=10)
    state = opt.init(w)

    @jax.jit
    def step(w, state, feats, labels):
        fn = lambda ww: loss_fn(ww, feats, labels)
        loss, grads = jax.value_and_grad(fn)(w)
        updates, state = opt.update(grads, state, w, value=loss, grad=grads,
                                    value_fn=fn)
        return optax.apply_updates(w, updates), state, loss

    ti, tl = lenet5.synthetic_mnist(jax.random.key(999), 2000)
    tf = featurize(ti)
    best_err = 1.0
    for epoch in range(EPOCHS):
        total = 0.0
        for i in range(STEPS_PER_EPOCH):
            kd = jax.random.fold_in(key, epoch * STEPS_PER_EPOCH + i)
            images, labels = lenet5.synthetic_mnist(kd, BATCH)
            w, state, loss = step(w, state, featurize(images), labels)
            total += float(loss)
        err = float(jnp.mean(jnp.argmax(tf @ w[:-1] + w[-1], axis=1) != tl))
        best_err = min(best_err, err)
        print(f"[lbfgs] epoch {epoch + 1:2d}  "
              f"train loss {total / STEPS_PER_EPOCH:.4f}  "
              f"best test err {best_err:.4f}")


def main():
    n_feat = SIDE * SIDE + (SIDE * SIDE) * (SIDE * SIDE + 1) // 2
    print(f"params: {(n_feat + 1) * 10 / 1e6:.2f}M")
    key = jax.random.key(0)
    run("sgd", optax.sgd(0.5), key, n_feat)
    run_lbfgs(key, n_feat)
    run("psgd-lra",
        popt.lra_whiten(learning_rate=0.05, rank_of_approximation=10,
                        momentum=0.9),
        key, n_feat)


if __name__ == "__main__":
    main()
