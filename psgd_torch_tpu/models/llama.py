"""LLaMA-family decoder LM, TPU-first (modern-architecture flagship).

The reference's model zoo stops at GPT-2/ViT-era architectures
(/root/reference/misc/gpt2.py, misc/vit.py); this adds the architecture
family modern LLM training actually uses — RMSNorm, rotary position
embeddings, SwiGLU MLP, grouped-query attention, no biases — so the
optimizer is exercised on the leaf zoo those models produce:

  * fused ``wqkv`` with UNEQUAL q/k/v output widths under GQA (a
    (d, (h + 2*kv) * head_dim) leaf whose Kron factor is neither square
    nor a power-of-two multiple of d);
  * a fused ``w_gu`` gate+up projection (d, 2 * hidden) and a ``w_down``
    (hidden, d) whose wide ``hidden`` dim (e.g. 5632 at 1.1B) exceeds the
    dense-factor envelope and lands on the max_skew diagonal rule — the
    mixed dense x diag Kron case;
  * RoPE means there is NO learned positional table: every 2-D leaf is a
    matmul weight, the regime the NS kernels are tuned for.

Same TPU idioms as models.gpt2: stacked blocks + one ``lax.scan`` over
layers (compile time O(1) in depth), bf16 activations / f32 params,
vocab a multiple of 128, optional per-block rematerialization.
``parallel.llama_partition_specs`` gives the canonical fsdp/tp layout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000          # multiple of 128 (LLaMA tokenizer size)
    block_size: int = 1024
    n_layer: int = 22
    n_head: int = 32
    n_kv_head: int = 4
    n_embd: int = 2048
    hidden_dim: int = 5632           # SwiGLU width (~8/3 * d, padded)
    rope_theta: float = 10000.0
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False
    tie_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def qkv_dim(self) -> int:
        """Fused q/k/v output width: h*hd + 2*kv*hd (unequal split)."""
        return (self.n_head + 2 * self.n_kv_head) * self.head_dim


def tiny_llama_config(**kw) -> LlamaConfig:
    """Test scale: exercises GQA (4:1), RoPE, SwiGLU, scan, tied head."""
    base = dict(vocab_size=256, block_size=64, n_layer=2, n_head=4,
                n_kv_head=1, n_embd=64, hidden_dim=176, tie_embeddings=True)
    base.update(kw)
    return LlamaConfig(**base)


def llama_1b(**kw) -> LlamaConfig:
    """TinyLlama-1.1B proportions (22 x 2048, 32 q / 4 kv heads, SwiGLU
    5632): the single-chip scale datapoint for the modern family.  The
    5632-wide MLP dims hit the max_skew diagonal rule (5632^2 > numel), so
    its leaves run the dense(2048) x diag(5632) mixed Kron update."""
    base = dict(vocab_size=32000, block_size=1024, n_layer=22, n_head=32,
                n_kv_head=4, n_embd=2048, hidden_dim=5632)
    base.update(kw)
    return LlamaConfig(**base)


def llama_7b(**kw) -> LlamaConfig:
    """LLaMA-7B proportions (32 x 4096, MHA, SwiGLU 11008) — for
    eval_shape / sharding-plan work; 4096 is the top of the tiled NS
    kernel envelope."""
    base = dict(vocab_size=32000, block_size=2048, n_layer=32, n_head=32,
                n_kv_head=32, n_embd=4096, hidden_dim=11008)
    base.update(kw)
    return LlamaConfig(**base)


def init_llama(key: jax.Array, cfg: LlamaConfig) -> dict:
    """LLaMA-style init: normal(0, 0.02) projections with residual outputs
    (wo, w_down) scaled 1/sqrt(2 L); RMSNorm scales at 1; no biases."""
    d, l, hd = cfg.n_embd, cfg.n_layer, cfg.hidden_dim
    std = 0.02
    resid_std = std / math.sqrt(2 * l)
    ks = jax.random.split(key, 6)
    pd = cfg.param_dtype

    def norm(k, shape, s=std):
        return (s * jax.random.normal(k, shape, jnp.float32)).astype(pd)

    blocks = {
        "rms1_scale": jnp.ones((l, d), pd),
        "wqkv": norm(ks[0], (l, d, cfg.qkv_dim)),
        "wo": norm(ks[1], (l, cfg.n_head * cfg.head_dim, d), resid_std),
        "rms2_scale": jnp.ones((l, d), pd),
        "w_gu": norm(ks[2], (l, d, 2 * hd)),
        "w_down": norm(ks[3], (l, hd, d), resid_std),
    }
    params = {
        "wte": norm(ks[4], (cfg.vocab_size, d)),
        "blocks": blocks,
        "rmsf_scale": jnp.ones((d,), pd),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = norm(ks[5], (d, cfg.vocab_size))
    return params


def _rms_norm(x, scale, eps=1e-5):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _rope(x, theta: float):
    """Rotary embedding over the head dim (half-split rotation, f32 angles).

    x: (B, T, H, hd) -> same shape, positions 0..T-1."""
    b, t, h, hd = x.shape
    half = hd // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * freqs[None, :]  # (T, half)
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _block(x, bp, cfg: LlamaConfig):
    """One pre-RMSNorm block: GQA attention with RoPE, then SwiGLU MLP."""
    b, t, d = x.shape
    h, kv, hd = cfg.n_head, cfg.n_kv_head, cfg.head_dim
    cd = cfg.compute_dtype

    y = _rms_norm(x, bp["rms1_scale"])
    qkv = y @ bp["wqkv"].astype(cd)
    q, k, v = jnp.split(qkv, [h * hd, (h + kv) * hd], axis=-1)
    q = _rope(q.reshape(b, t, h, hd), cfg.rope_theta)
    k = _rope(k.reshape(b, t, kv, hd), cfg.rope_theta)
    v = v.reshape(b, t, kv, hd)
    att = jax.nn.dot_product_attention(q, k, v, is_causal=True)  # GQA native
    x = x + att.reshape(b, t, h * hd) @ bp["wo"].astype(cd)

    y = _rms_norm(x, bp["rms2_scale"])
    gu = y @ bp["w_gu"].astype(cd)
    g, u = jnp.split(gu, 2, axis=-1)
    x = x + (jax.nn.silu(g) * u) @ bp["w_down"].astype(cd)
    return x


def apply_llama(params: dict, tokens: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """Forward pass: (B, T) int tokens -> (B, T, vocab) float32 logits."""
    cd = cfg.compute_dtype
    x = params["wte"][tokens].astype(cd)

    block_fn = _block
    if cfg.remat:
        block_fn = jax.checkpoint(_block, static_argnums=(2,))

    def scan_body(x, bp):
        return block_fn(x, bp, cfg), None

    x, _ = jax.lax.scan(scan_body, x, params["blocks"])
    x = _rms_norm(x, params["rmsf_scale"])
    head = (params["wte"].T if cfg.tie_embeddings
            else params["lm_head"]).astype(cd)
    return (x @ head).astype(jnp.float32)


def loss_llama(params: dict, tokens: jax.Array, targets: jax.Array,
               cfg: LlamaConfig) -> jax.Array:
    """Mean cross-entropy next-token loss (float32 logits/softmax)."""
    logits = apply_llama(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def scanned_layers_mask(params: dict) -> dict:
    """Leaves with a leading layer-stack axis (see models.gpt2)."""
    out = {
        "wte": False,
        "blocks": {k: True for k in params["blocks"]},
        "rmsf_scale": False,
    }
    if "lm_head" in params:
        out["lm_head"] = False
    return out


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
