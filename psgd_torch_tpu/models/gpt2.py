"""GPT-2 style transformer LM, TPU-first (flagship benchmark model).

Functional re-design of the reference's nanoGPT-style demo model
(/root/reference/misc/gpt2.py:100-200): same architecture family (pre-LN
transformer, GELU MLP, learned positional embeddings, weight-tied LM head),
built the TPU way:

  * **Stacked blocks + lax.scan over layers**: all L transformer blocks'
    parameters are stored stacked along a leading layer axis and the forward
    runs one `lax.scan` over them — one compiled block program instead of L
    unrolled copies (compile time O(1) in depth, XLA pipelines it), and the
    PSGD optimizer vmaps its per-layer Q updates over the same axis
    (see optim.transforms ``scanned_layers``).
  * bfloat16 activations with float32 params (canonical TPU mixed precision);
    attention uses ``jax.nn.dot_product_attention`` (fused on TPU).
  * vocab padded to a multiple of 128 so the logits matmul tiles the MXU.
  * optional rematerialization of each block (``remat=True``) to trade
    FLOPs for HBM.

Params are a plain nested dict pytree; `partition_specs` (parallel.gpt2_specs)
gives canonical fsdp/tp shardings.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50304          # 50257 padded up to a multiple of 128
    block_size: int = 1024
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


def tiny_config(**kw) -> GPT2Config:
    """The reference demo scale: 6 layers / 12 heads / 384 embd / block 128
    (misc/gpt2.py:324-331)."""
    base = dict(vocab_size=50304, block_size=128, n_layer=6, n_head=12,
                n_embd=384)
    base.update(kw)
    return GPT2Config(**base)


def gpt2_124m(**kw) -> GPT2Config:
    base = dict(vocab_size=50304, block_size=1024, n_layer=12, n_head=12,
                n_embd=768)
    base.update(kw)
    return GPT2Config(**base)


def gpt2_350m(**kw) -> GPT2Config:
    """GPT-2 medium proportions: the Kron factors include 1024 (attn/embd)
    and 4096 (MLP) — the widths served by the tiled NS kernel path."""
    base = dict(vocab_size=50304, block_size=1024, n_layer=24, n_head=16,
                n_embd=1024)
    base.update(kw)
    return GPT2Config(**base)


def gpt2_774m(**kw) -> GPT2Config:
    """GPT-2 large proportions (36 x 1280, 20 heads): ~1.5x a 16 GB chip's
    AdamW working set in fp32 state, comfortable for PSGD with bf16
    momentum + bf16 Q — the single-chip scale-headroom datapoint."""
    base = dict(vocab_size=50304, block_size=1024, n_layer=36, n_head=20,
                n_embd=1280)
    base.update(kw)
    return GPT2Config(**base)


def init_gpt2(key: jax.Array, cfg: GPT2Config) -> dict:
    """GPT-2 initialization: normal(0, 0.02), residual projections scaled by
    1/sqrt(2 L); biases zero; LM head tied to wte."""
    d, l = cfg.n_embd, cfg.n_layer
    std = 0.02
    resid_std = std / math.sqrt(2 * l)
    ks = jax.random.split(key, 8)
    pd = cfg.param_dtype

    def norm(k, shape, s=std):
        return (s * jax.random.normal(k, shape, jnp.float32)).astype(pd)

    blocks = {
        "ln1_scale": jnp.ones((l, d), pd),
        "ln1_bias": jnp.zeros((l, d), pd),
        "attn_qkv_w": norm(ks[0], (l, d, 3 * d)),
        "attn_qkv_b": jnp.zeros((l, 3 * d), pd),
        "attn_proj_w": norm(ks[1], (l, d, d), resid_std),
        "attn_proj_b": jnp.zeros((l, d), pd),
        "ln2_scale": jnp.ones((l, d), pd),
        "ln2_bias": jnp.zeros((l, d), pd),
        "mlp_fc_w": norm(ks[2], (l, d, 4 * d)),
        "mlp_fc_b": jnp.zeros((l, 4 * d), pd),
        "mlp_proj_w": norm(ks[3], (l, 4 * d, d), resid_std),
        "mlp_proj_b": jnp.zeros((l, d), pd),
    }
    return {
        "wte": norm(ks[4], (cfg.vocab_size, d)),
        "wpe": norm(ks[5], (cfg.block_size, d), 0.01),
        "blocks": blocks,
        "lnf_scale": jnp.ones((d,), pd),
        "lnf_bias": jnp.zeros((d,), pd),
    }


def _layer_norm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _block(x, bp, cfg: GPT2Config):
    """One pre-LN transformer block; bp holds this layer's (unstacked) params."""
    b, t, d = x.shape
    h, hd = cfg.n_head, cfg.head_dim
    cd = cfg.compute_dtype

    y = _layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
    qkv = y @ bp["attn_qkv_w"].astype(cd) + bp["attn_qkv_b"].astype(cd)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, hd)
    k = k.reshape(b, t, h, hd)
    v = v.reshape(b, t, h, hd)
    att = jax.nn.dot_product_attention(q, k, v, is_causal=True)
    att = att.reshape(b, t, d)
    x = x + att @ bp["attn_proj_w"].astype(cd) + bp["attn_proj_b"].astype(cd)

    y = _layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
    y = y @ bp["mlp_fc_w"].astype(cd) + bp["mlp_fc_b"].astype(cd)
    y = jax.nn.gelu(y, approximate=True)
    x = x + y @ bp["mlp_proj_w"].astype(cd) + bp["mlp_proj_b"].astype(cd)
    return x


def apply_gpt2(params: dict, tokens: jax.Array, cfg: GPT2Config) -> jax.Array:
    """Forward pass: (B, T) int tokens -> (B, T, vocab) float32 logits."""
    b, t = tokens.shape
    cd = cfg.compute_dtype
    x = params["wte"][tokens].astype(cd) + params["wpe"][:t].astype(cd)[None]

    block_fn = _block
    if cfg.remat:
        block_fn = jax.checkpoint(_block, static_argnums=(2,))

    def scan_body(x, bp):
        return block_fn(x, bp, cfg), None

    x, _ = jax.lax.scan(scan_body, x, params["blocks"])
    x = _layer_norm(x, params["lnf_scale"], params["lnf_bias"])
    logits = x @ params["wte"].T.astype(cd)  # tied LM head
    return logits.astype(jnp.float32)


def loss_gpt2(params: dict, tokens: jax.Array, targets: jax.Array,
              cfg: GPT2Config) -> jax.Array:
    """Mean cross-entropy next-token loss (float32 logits/softmax)."""
    logits = apply_gpt2(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def scanned_layers_mask(params: dict) -> dict:
    """Pytree of bools marking which leaves are layer-stacked (the PSGD
    transforms vmap their per-layer preconditioners over axis 0 for these)."""
    return {
        "wte": False,
        "wpe": False,
        "blocks": {k: True for k in params["blocks"]},
        "lnf_scale": False,
        "lnf_bias": False,
    }


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def synthetic_lm_batch(key: jax.Array, batch: int, seq_len: int,
                       vocab_size: int, order: int = 2):
    """Synthetic but *learnable* LM data: tokens from a deterministic mixing
    rule plus noise, so optimizers separate on convergence speed (no dataset
    egress in this environment; replaces WikiText-103 in misc/gpt2.py:40-76)."""
    k1, k2 = jax.random.split(key)
    base = jax.random.randint(k1, (batch, seq_len + 1), 0, vocab_size)
    # impose structure: x[t] depends on x[t-1] with high probability
    def mix(carry, inp):
        prev = carry
        tok, coin = inp
        nxt = jnp.where(coin < 0.8, (prev * 31 + 7) % vocab_size, tok)
        return nxt, nxt
    coins = jax.random.uniform(k2, (batch, seq_len + 1))
    _, toks = jax.lax.scan(mix, base[:, 0], (base.T, coins.T))
    toks = toks.T
    return toks[:, :-1], toks[:, 1:]
