"""Tiny Vision Transformer (the reference's CIFAR-10 benchmark model,
/root/reference/misc/vit.py:263-321: dim 256, depth 4, heads 8, patch 4).

Same TPU-first construction as models.gpt2: stacked blocks + lax.scan,
bfloat16 compute / float32 params, fused attention.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .gpt2 import _layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 32
    patch_size: int = 4
    num_classes: int = 10
    dim: int = 256
    depth: int = 4
    heads: int = 8
    mlp_ratio: int = 4
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size ** 2


def init_vit(key: jax.Array, cfg: ViTConfig) -> dict:
    d, l = cfg.dim, cfg.depth
    ks = jax.random.split(key, 6)
    pd = cfg.param_dtype

    def norm(k, shape, s=0.02):
        return (s * jax.random.normal(k, shape, jnp.float32)).astype(pd)

    blocks = {
        "ln1_scale": jnp.ones((l, d), pd),
        "ln1_bias": jnp.zeros((l, d), pd),
        "attn_qkv_w": norm(ks[0], (l, d, 3 * d)),
        "attn_qkv_b": jnp.zeros((l, 3 * d), pd),
        "attn_proj_w": norm(ks[1], (l, d, d)),
        "attn_proj_b": jnp.zeros((l, d), pd),
        "ln2_scale": jnp.ones((l, d), pd),
        "ln2_bias": jnp.zeros((l, d), pd),
        "mlp_fc_w": norm(ks[2], (l, d, cfg.mlp_ratio * d)),
        "mlp_fc_b": jnp.zeros((l, cfg.mlp_ratio * d), pd),
        "mlp_proj_w": norm(ks[3], (l, cfg.mlp_ratio * d, d)),
        "mlp_proj_b": jnp.zeros((l, d), pd),
    }
    return {
        "patch_w": norm(ks[4], (cfg.patch_dim, d), cfg.patch_dim ** -0.5),
        "patch_b": jnp.zeros((d,), pd),
        "pos_emb": norm(ks[5], (cfg.num_patches + 1, d), 0.02),
        "cls": jnp.zeros((d,), pd),
        "blocks": blocks,
        "lnf_scale": jnp.ones((d,), pd),
        "lnf_bias": jnp.zeros((d,), pd),
        "head_w": jnp.zeros((d, cfg.num_classes), pd),
        "head_b": jnp.zeros((cfg.num_classes,), pd),
    }


def _patchify(images: jax.Array, p: int) -> jax.Array:
    b, h, w, c = images.shape
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
    return x


def apply_vit(params: dict, images: jax.Array, cfg: ViTConfig) -> jax.Array:
    """images: (B, H, W, 3) -> logits (B, num_classes)."""
    cd = cfg.compute_dtype
    x = _patchify(images.astype(cd), cfg.patch_size)
    x = x @ params["patch_w"].astype(cd) + params["patch_b"].astype(cd)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls"].astype(cd), (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_emb"].astype(cd)[None]

    h, hd = cfg.heads, cfg.dim // cfg.heads

    def block(x, bp):
        y = _layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
        qkv = y @ bp["attn_qkv_w"].astype(cd) + bp["attn_qkv_b"].astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        bb, t, d = q.shape
        att = jax.nn.dot_product_attention(
            q.reshape(bb, t, h, hd), k.reshape(bb, t, h, hd),
            v.reshape(bb, t, h, hd))
        x = x + att.reshape(bb, t, d) @ bp["attn_proj_w"].astype(cd) \
            + bp["attn_proj_b"].astype(cd)
        y = _layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
        y = jax.nn.gelu(y @ bp["mlp_fc_w"].astype(cd) + bp["mlp_fc_b"].astype(cd),
                        approximate=True)
        x = x + y @ bp["mlp_proj_w"].astype(cd) + bp["mlp_proj_b"].astype(cd)
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = _layer_norm(x[:, 0], params["lnf_scale"], params["lnf_bias"])
    logits = x @ params["head_w"].astype(cd) + params["head_b"].astype(cd)
    return logits.astype(jnp.float32)


def loss_vit(params, images, labels, cfg: ViTConfig):
    logits = apply_vit(params, images, cfg)
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def scanned_layers_mask(params: dict) -> dict:
    mask = {k: False for k in params}
    mask["blocks"] = {k: True for k in params["blocks"]}
    return mask


def synthetic_cifar(key: jax.Array, n: int, num_classes: int = 10,
                    image_size: int = 32):
    """Learnable synthetic image data (fixed class templates + noise)."""
    kc, kn = jax.random.split(key, 2)
    coarse = jax.random.normal(jax.random.key(4321), (num_classes, 8, 8, 3))
    rep = image_size // 8
    templates = jnp.repeat(jnp.repeat(coarse, rep, axis=1), rep, axis=2)
    labels = jax.random.randint(kc, (n,), 0, num_classes)
    images = templates[labels] + 0.7 * jax.random.normal(
        kn, (n, image_size, image_size, 3))
    return images, labels
