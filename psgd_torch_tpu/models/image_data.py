"""Real image data without network egress.

The reference's image benchmarks use MNIST (mnist_with_lenet5.py) and
CIFAR-10 (misc/vit.py), both of which require downloads.  This environment
has zero egress, so the comparative optimizer results are recorded on the
**UCI handwritten-digits dataset** that scikit-learn ships inside its own
package data (1,797 real 8x8 grayscale digit images, `load_digits`) —
real handwriting, honestly labeled as digits-not-MNIST/CIFAR in every
artifact produced from it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_digits_split(test_frac: float = 0.2, seed: int = 0
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
    """(train_x, train_y, test_x, test_y): real 8x8 digits in [0, 1],
    deterministically shuffled and split."""
    from sklearn.datasets import load_digits
    d = load_digits()
    x = (d.images / 16.0).astype(np.float32)  # (1797, 8, 8)
    y = d.target.astype(np.int32)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(x))
    x, y = x[order], y[order]
    n_test = int(len(x) * test_frac)
    return x[n_test:], y[n_test:], x[:n_test], y[:n_test]


def digits_resized(x: np.ndarray, size: int, channels: int = 1
                   ) -> np.ndarray:
    """Upscale 8x8 digits to (N, size, size, channels) — 32x32x1 for the
    classic LeNet5 input, 32x32x3 for the CIFAR-shaped ViT input."""
    t = jax.image.resize(jnp.asarray(x), (x.shape[0], size, size),
                         "bilinear")
    return np.asarray(jnp.repeat(t[..., None], channels, axis=-1))


def batches(key: jax.Array, x: np.ndarray, y: np.ndarray, batch: int,
            steps: int):
    """Yield `steps` random batches (with replacement across epochs)."""
    n = len(x)
    for i in range(steps):
        idx = jax.random.randint(jax.random.fold_in(key, i), (batch,), 0, n)
        idx = np.asarray(idx)
        yield jnp.asarray(x[idx]), jnp.asarray(y[idx])
