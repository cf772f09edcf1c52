"""LeNet5 convnet (the reference's MNIST demo model,
/root/reference/mnist_with_lenet5.py:23-40), functional JAX.

The reference demo concatenates each layer's weight and bias into one
"affine" matrix so the Kron preconditioner covers both (mnist_with_lenet5.py:24-29);
we keep that convention: each layer is a single [W; b] matrix, and conv
kernels are flattened to (fan_in, fan_out) before the affine view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_lenet5(key: jax.Array, dtype=jnp.float32) -> list:
    """Six affine params: conv1 (1x5x5 -> 6), conv2 (6x5x5 -> 16),
    fc1 (400 -> 120), fc2 (120 -> 84), fc3 (84 -> 10); each with bias row."""
    ks = jax.random.split(key, 5)

    def affine(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), jnp.float32) * (fan_in ** -0.5)
        return jnp.concatenate([w, jnp.zeros((1, fan_out))]).astype(dtype)

    return [
        affine(ks[0], 1 * 5 * 5, 6),
        affine(ks[1], 6 * 5 * 5, 16),
        affine(ks[2], 16 * 5 * 5, 120),
        affine(ks[3], 120, 84),
        affine(ks[4], 84, 10),
    ]


def _conv(x, wb, k, cin, cout):
    """Conv via the affine [W; b] param: W reshaped to HWIO."""
    w = wb[:-1].reshape(cin, k, k, cout).transpose(1, 2, 0, 3)  # HWIO
    b = wb[-1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def apply_lenet5(params: list, images: jax.Array) -> jax.Array:
    """images: (B, 32, 32, 1) (classic 32x32 LeNet input; pad\n    MNIST 28x28 with 2 pixels per side) -> logits (B, 10)."""
    x = images
    x = jax.nn.relu(_conv(x, params[0], 5, 1, 6))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    x = jax.nn.relu(_conv(x, params[1], 5, 6, 16))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    # classic 32x32 LeNet: 32 -conv5-> 28 -pool-> 14 -conv5-> 10 -pool-> 5,
    # flatten (B, 5, 5, 16) -> (B, 400) in channel-major order
    x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
    w, b = params[2][:-1], params[2][-1]
    x = jax.nn.relu(x @ w.astype(x.dtype) + b.astype(x.dtype))
    w, b = params[3][:-1], params[3][-1]
    x = jax.nn.relu(x @ w.astype(x.dtype) + b.astype(x.dtype))
    w, b = params[4][:-1], params[4][-1]
    return x @ w.astype(x.dtype) + b.astype(x.dtype)


def loss_lenet5(params, images, labels):
    logits = apply_lenet5(params, images)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def synthetic_mnist(key: jax.Array, n: int, num_classes: int = 10,
                    image_size: int = 32):
    """Learnable synthetic image-classification data (no dataset egress):
    each class has a fixed random template (constant across batches);
    samples are template + noise."""
    kc, kn = jax.random.split(key, 2)
    # low-frequency templates (8x8 upsampled): local structure a conv can use
    coarse = jax.random.normal(jax.random.key(1234),
                               (num_classes, 8, 8, 1))
    rep = image_size // 8
    templates = jnp.repeat(jnp.repeat(coarse, rep, axis=1), rep, axis=2)
    labels = jax.random.randint(kc, (n,), 0, num_classes)
    noise = 0.5 * jax.random.normal(kn, (n, image_size, image_size, 1))
    images = templates[labels] + noise
    return images, labels
