"""Modern-family scale datapoint: TinyLlama-1.1B proportions (22 x 2048,
GQA 32q/4kv, SwiGLU 5632) on one 16 GB v5e chip.

The reference's model zoo stops at GPT-2/ViT (misc/gpt2.py, misc/vit.py);
this measures PSGD-Kron on the leaf zoo modern LLM training actually
produces: a fused wqkv (2048, 2560) dense x dense leaf (2560 lands in the
tiled NS-kernel envelope), square wo (2048, 2048) split-kernel leaves, and
the SwiGLU (2048, 11264)/(5632, 2048) mixed dense x diag leaves from the
max_skew rule.  Records, with blocks remat'd and batch 1 x seq 1024:

  * PSGD step time at p=0.1 and p=1.0 (+ the AdamW ratio when AdamW's
    fp32 state fits; like GPT-2 774M it needs buffer donation at 1.1B);
  * the isolated Q-update + Pg-apply slope time and its MFU.

Writes results/llama_1b_bench.json.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import optax

import bench  # noqa: F401  (path setup precedent; peak-FLOPs tables)
from psgd_torch_tpu.models import llama
import psgd_torch_tpu.optim as popt


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_one_step_bf16_grads(opt, loss_fn):
    """Donated single-step program with the gradients cast to bf16 before
    the optimizer — the reference wrapper's production protocol (bf16
    preconditioner_dtype AND bf16 grads, ddp:41, :124-127).  At 1.1B an
    n-step fori_loop double-buffers its params+state carries (~7 GB of
    HLO-temp copies, OOM on a 16 GB chip); a donated single-step program
    aliases in->out with no copies — exactly what a python training loop
    runs."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def one_step(p, s, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.bfloat16), grads)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    return one_step


def time_chained(one_step, make_args, tokens, targets, k=16, n_outer=3):
    """Per-step time of k CHAINED donated single-step calls: the runtime
    dispatches asynchronously, so host->device latency (~25 ms/call on the
    tunnel) pipelines behind device compute; only the final loss is
    fetched, which transitively depends on every prior step."""
    p, s = make_args()
    p, s, loss = one_step(p, s, tokens, targets)   # compile + warmup
    _ = float(loss)
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        for _i in range(k):
            p, s, loss = one_step(p, s, tokens, targets)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / k)
    return best, float(loss)


def main():
    if os.environ.get("PSGD_BENCH_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; force CPU the conftest way
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}")
    if on_tpu:
        cfg = llama.llama_1b(compute_dtype=jnp.bfloat16, remat=True)
        batch = 1
    else:  # smoke mode
        cfg = llama.tiny_llama_config(compute_dtype=jnp.float32)
        batch = 2
    key = jax.random.key(0)
    params = llama.init_llama(key, cfg)
    n_params = llama.count_params(params)
    log(f"params: {n_params/1e6:.1f}M  batch {batch} x seq {cfg.block_size}")
    tokens = jax.random.randint(jax.random.fold_in(key, 1),
                                (batch, cfg.block_size), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    mask = llama.scanned_layers_mask(params)
    loss_fn = lambda p, x, y: llama.loss_llama(p, x, y, cfg)
    pdt = jnp.bfloat16 if on_tpu else None
    nk = 128 if on_tpu else 32

    def psgd_opt(p_update):
        return popt.kron_whiten(
            learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_update_probability=p_update,
            preconditioner_dtype=pdt, momentum_dtype=pdt,
            norm_k=nk, weight_decay=0.01, scanned_layers=mask)

    # isolated Q-update + Pg-apply: a donated single-update program chained
    # k times (the fori_loop slope method of bench.py double-buffers its
    # carries, which does not fit at 1.1B); slope between two chain lengths
    # removes the constant window overhead.  bf16 params here: the update
    # program carries no grads-producing model, and bf16 params halve the
    # aliased argument footprint (Q math runs in bf16 either way).
    import functools

    tx = popt.scale_by_kron_whiten(preconditioner_max_skew=2.0,
                                   preconditioner_init_scale=1.0,
                                   preconditioner_dtype=pdt, norm_k=nk,
                                   scanned_layers=mask)

    # one donated program: grads + the bf16 casts (wrapper protocol,
    # ddp:124-127).  Donating the f32 params halves the resident footprint
    # vs a bare jax.grad — at 1.1B the non-donated version OOMs a 16 GB
    # chip (4.4 GB params + 4.4 GB grads + bwd temps)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def grads_and_cast(p, x, y):
        g = jax.grad(loss_fn)(p, x, y)
        if on_tpu:
            g = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), g)
            p = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
        return p, g

    params, grads = grads_and_cast(params, tokens, targets)
    jax.block_until_ready(grads)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def one_update(p, g, s):
        u, s = tx.update(g, s)
        p = jax.tree_util.tree_map(
            lambda a, b: a - 1e-3 * b.astype(a.dtype), p, u)
        return p, s

    fetch = jax.jit(lambda p: jnp.sum(
        jax.tree_util.tree_leaves(p)[0].astype(jnp.float32)))

    def chain_updates(k):
        p, s = params, tx.init(params)
        p, s = one_update(p, grads, s)            # compile + warmup
        _ = float(fetch(p))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _i in range(k):
                p, s = one_update(p, grads, s)
            _ = float(fetch(p))  # scalar fetch: the reliable sync on axon
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = (4, 16) if on_tpu else (2, 6)
    tq1, tq2 = chain_updates(k1), chain_updates(k2)
    t_q = max((tq2 - tq1) / (k2 - k1), 0.0)
    log(f"Q-update + Pg-apply: {t_q*1e6:.0f} us/step")
    q_mfu = flops = None
    try:
        c1 = (jax.jit(lambda g, s: tx.update(g, s))
              .lower(grads, tx.init(params)).compile())
        ca = c1.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca["flops"])
        if on_tpu:
            flops += bench.pallas_ns_flops(params, mask, nk, 2.0)
        peak = bench.bf16_peak_flops(dev)
        if peak is not None:
            q_mfu = flops / max(t_q, 1e-12) / peak
            log(f"Q-update MFU: {100*q_mfu:.1f}% ({flops/1e9:.1f} GFLOP/step)")
    except Exception as e:
        log(f"MFU estimate unavailable: {e}")

    opt01, opt1 = psgd_opt(0.1), psgd_opt(1.0)

    def args_of(opt):
        def make():
            p = llama.init_llama(key, cfg)
            return (p, opt.init(p))
        return make

    t01, l01 = time_chained(make_one_step_bf16_grads(opt01, loss_fn),
                            args_of(opt01), tokens, targets)
    log(f"psgd step (p=0.1): {t01*1e3:.2f} ms (loss {l01:.3f})")
    t1, l1 = time_chained(make_one_step_bf16_grads(opt1, loss_fn),
                          args_of(opt1), tokens, targets, k=8)
    log(f"psgd step (p=1.0): {t1*1e3:.2f} ms (loss {l1:.3f})")

    adamw_ms = None
    adamw_err = None
    adamw = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    try:
        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def adamw_step(p, s, x, y):
            loss, g = jax.value_and_grad(loss_fn)(p, x, y)
            u, s = adamw.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        ta, la = time_chained(adamw_step, args_of(adamw), tokens, targets,
                              k=8)
        adamw_ms = round(ta * 1e3, 2)
        log(f"adamw step: {ta*1e3:.2f} ms (loss {la:.3f})")
    except Exception as e:
        adamw_err = f"{type(e).__name__}: {str(e)[:300]}"
        log(f"adamw single-step failed: {adamw_err}")
    import gc
    gc.collect()  # drop any arrays pinned by the exception traceback

    result = {
        "metric": "llama_1b_single_chip",
        "detail": {
            "device": str(dev), "params_m": round(n_params / 1e6, 1),
            "arch": "22x2048 GQA 32q/4kv SwiGLU 5632 (TinyLlama-1.1B "
                    "proportions)",
            "batch": batch, "seq": cfg.block_size, "remat": True,
            "psgd_p0.1_ms": round(t01 * 1e3, 2),
            "psgd_p1.0_ms": round(t1 * 1e3, 2),
            "psgd_steps_per_sec_p0.1": round(1.0 / t01, 3),
            "adamw_ms": adamw_ms,
            "adamw_error": adamw_err,
            "psgd_p0.1_ratio_vs_adamw": (
                None if adamw_ms is None else round(t01 * 1e3 / adamw_ms, 4)),
            "timing": "chained donated single-step calls (async dispatch "
                      "pipelines the ~25 ms/call tunnel latency; final "
                      "loss fetched, which depends on every prior step)",
            "q_update_apply_us": round(t_q * 1e6),
            "q_update_mfu": None if q_mfu is None else round(q_mfu, 4),
            "q_update_gflop_per_step": (
                None if flops is None else round(flops / 1e9, 2)),
            "note": "batch-1 remat regime like the 774M artifact: "
                    "optimizer-bound, documents scale headroom rather than "
                    "the production step ratio (that is the 124M headline). "
                    "PSGD arms use the reference wrapper's bf16-grad "
                    "protocol (ddp:124-127); AdamW keeps its standard fp32 "
                    "state",
        },
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "results" / \
        "llama_1b_bench.json"
    if on_tpu:
        out.write_text(json.dumps(result, indent=1))
        log(f"wrote {out}")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
