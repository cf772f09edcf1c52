"""On-TPU cache_p datapoint in its CLAIMED payoff regime (VERDICT r4 next
#3): f32 preconditioner state at the production operating point (update
probability 0.03-0.1), plus a Newton arm, on GPT-2 124M.

The round-4 headline measured cache_p on the bf16 bandwidth-bound step and
it LOST slightly (1.0129 vs 1.0031, BENCH_r04.json); the docs scope the
payoff to FLOP-bound applies (f32 state, or Newton at low p) but that
regime had no on-chip number.  This measures it:

  * whiten, f32 Q/momentum state (preconditioner_dtype=None on f32 params),
    p in {0.03, 0.1}, cache_p on/off — donated single-step chained timing
    (donation is the documented usage: without it the lax.cond pass-through
    of the unchanged cache costs a copy);
  * newton (exact Hvp), f32 state, p = 0.1, cache_p on/off;
  * the state-memory delta of the cache via utils.state_memory_report.

Writes results/cache_p_tpu.json.
"""

import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.optim.hvp import make_hvp_fn
from psgd_torch_tpu.utils import state_memory_report


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_chained(one_step, make_args, extra, k=32, n_outer=3):
    p, s = make_args()
    p, s, loss = one_step(p, s, *extra)   # compile + warmup
    _ = float(loss)
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        for _i in range(k):
            p, s, loss = one_step(p, s, *extra)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / k)
    return best, float(loss)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}")
    if on_tpu:
        cfg = gpt2.gpt2_124m(compute_dtype=jnp.bfloat16, remat=False)
        batch, k_steps = 4, 32
    else:  # smoke
        cfg = gpt2.tiny_config(n_layer=2, n_embd=128, n_head=4,
                               vocab_size=1024, block_size=64,
                               compute_dtype=jnp.float32)
        batch, k_steps = 4, 4
    key = jax.random.key(0)
    params0 = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params0)
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              batch, cfg.block_size,
                                              cfg.vocab_size)
    loss_fn = lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg)
    nk = 128 if on_tpu else 32

    def whiten_opt(p_update, cached):
        # preconditioner_dtype=None -> Q/L/momentum in the PARAM dtype
        # (f32): the FLOP-bound regime the cache_p docs claim
        return popt.kron_whiten(
            learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_update_probability=p_update,
            norm_k=nk, weight_decay=0.01, scanned_layers=mask,
            cache_p=cached)

    def make_whiten_step(opt):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def one_step(p, s, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss
        return one_step

    def args_of(opt):
        def make():
            p = gpt2.init_gpt2(key, cfg)
            return p, opt.init(p)
        return make

    results = {"device": str(dev), "model": "gpt2_124m",
               "batch": batch, "seq": cfg.block_size,
               "state_dtype": "float32", "chained_steps": k_steps,
               "whiten": {}, "newton": {}}

    for p_up in (0.03, 0.1):
        row = {}
        for cached in (False, True):
            opt = whiten_opt(p_up, cached)
            t, l = time_chained(make_whiten_step(opt), args_of(opt),
                                (tokens, targets), k=k_steps)
            row["cached_ms" if cached else "plain_ms"] = round(t * 1e3, 2)
            log(f"whiten p={p_up} cached={cached}: {t*1e3:.2f} ms "
                f"(loss {l:.3f})")
        row["cached_over_plain"] = round(row["cached_ms"] / row["plain_ms"],
                                         4)
        results["whiten"][f"p{p_up}"] = row

    # state-memory delta of the cache (f32 state)
    for cached in (False, True):
        opt = whiten_opt(0.1, cached)
        st = opt.init(params0)
        rep = state_memory_report(st)
        results[("state_bytes_cached" if cached else "state_bytes_plain")] = rep
        log(f"state report cached={cached}: {rep}")
        del st

    # Newton arm: exact Hvp (jvp-over-grad), f32 state, p = 0.1.  batch
    # halved — the Hvp adds a second backward-sized pass.
    nb = max(batch // 2, 1)
    ntokens, ntargets = tokens[:nb], targets[:nb]

    def newton_opt(cached):
        return popt.kron_newton(
            learning_rate=1e-3, preconditioner_max_skew=2.0,
            preconditioner_init_scale=1.0,
            preconditioner_update_probability=0.1,
            norm_k=nk, scanned_layers=mask, cache_p=cached,
            grad_clip_max_norm=10.0)

    def make_newton_step(opt):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def one_step(p, s, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
            hvp_fn = make_hvp_fn(loss_fn, x, y, exact=True)
            updates, s = opt.update(grads, s, p, hvp_fn=hvp_fn)
            return optax.apply_updates(p, updates), s, loss
        return one_step

    row = {}
    for cached in (False, True):
        opt = newton_opt(cached)
        try:
            t, l = time_chained(make_newton_step(opt), args_of(opt),
                                (ntokens, ntargets), k=max(k_steps // 2, 2))
            row["cached_ms" if cached else "plain_ms"] = round(t * 1e3, 2)
            log(f"newton p=0.1 cached={cached}: {t*1e3:.2f} ms "
                f"(loss {l:.3f})")
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            log(f"newton arm failed: {row['error']}")
            break
    if "plain_ms" in row and "cached_ms" in row:
        row["cached_over_plain"] = round(row["cached_ms"] / row["plain_ms"],
                                         4)
        row["batch"] = nb
    results["newton"]["p0.1"] = row

    out = pathlib.Path(__file__).resolve().parent.parent / "results" / \
        "cache_p_tpu.json"
    if on_tpu:
        out.write_text(json.dumps(results, indent=1))
        log(f"wrote {out}")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
