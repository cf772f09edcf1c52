"""Tiny-ViT image classification: Adam vs PSGD KronWhiten at the same lr —
parity with the reference benchmark (misc/vit.py:323-363), which shows
PSGD-Kron-whitening beating Adam(W) with identical hyperparameters.

Data: REAL images by default — the UCI handwritten digits scikit-learn
ships in-package, upscaled to the 32x32x3 CIFAR layout (CIFAR-10 itself
needs a download this environment cannot do); falls back to synthetic data
without sklearn.  Comparative numbers: results/vit_digits.json.
The dQ geometry is sweepable like the reference's (misc/vit.py:330).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import vit

EPOCHS = 5
STEPS_PER_EPOCH = 100
BATCH = 128


def load_data():
    try:
        from psgd_torch_tpu.models import image_data
        tr_x, tr_y, te_x, te_y = image_data.load_digits_split()
        x = jnp.asarray(image_data.digits_resized(tr_x, 32, 3))
        y = jnp.asarray(tr_y)
        tx = jnp.asarray(image_data.digits_resized(te_x, 32, 3))
        ty = jnp.asarray(te_y)

        def batch(key, n):
            idx = jax.random.randint(key, (n,), 0, x.shape[0])
            return x[idx], y[idx]

        print(f"data: real UCI digits ({x.shape[0]} train / {tx.shape[0]} test)")
        return batch, (tx, ty)
    except ImportError:
        print("data: synthetic (sklearn not available)")
        return (lambda key, n: vit.synthetic_cifar(key, n),
                vit.synthetic_cifar(jax.random.key(999), 1000))


def run(name, opt, cfg, key, batch_fn, test_set):
    params = vit.init_vit(jax.random.key(42), cfg)
    state = opt.init(params)

    @jax.jit
    def step(params, state, images, labels):
        loss, grads = jax.value_and_grad(vit.loss_vit)(params, images,
                                                       labels, cfg)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for epoch in range(EPOCHS):
        total = 0.0
        for i in range(STEPS_PER_EPOCH):
            kd = jax.random.fold_in(key, epoch * STEPS_PER_EPOCH + i)
            images, labels = batch_fn(kd, BATCH)
            params, state, loss = step(params, state,
                                       images.astype(jnp.float32), labels)
            total += float(loss)
        ti, tl = test_set
        acc = float(jnp.mean(
            jnp.argmax(vit.apply_vit(params, ti, cfg), axis=1) == tl))
        print(f"[{name}] epoch {epoch + 1:2d}  "
              f"train loss {total / STEPS_PER_EPOCH:.4f}  test acc {acc:.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dq", default="Q0.5EQ1.5",
                    help="Kron dQ geometry (reference sweeps this)")
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    cfg = vit.ViTConfig()
    mask = vit.scanned_layers_mask(vit.init_vit(jax.random.key(42), cfg))
    key = jax.random.key(0)

    batch_fn, test_set = load_data()
    run("adam", optax.adam(args.lr), cfg, key, batch_fn, test_set)
    run(f"psgd-kron({args.dq})",
        popt.kron_whiten(learning_rate=args.lr, momentum=0.9,
                         preconditioner_max_skew=2.0, dq=args.dq,
                         scanned_layers=mask),
        cfg, key, batch_fn, test_set)


if __name__ == "__main__":
    main()
