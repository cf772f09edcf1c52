"""Single-chip scale-headroom datapoint: GPT-2 large proportions (774M,
36 x 1280) on one 16 GB v5e chip.

AdamW's fp32 state (m + v = 6.2 GB) plus fp32 params + grads (6.2 GB) makes
the matched-settings baseline ~12.4 GB before activations — near the chip's
ceiling — while PSGD-Kron with bf16 momentum and bf16 Q factors needs ~8 GB.
The run records, with blocks remat'd and batch 1:

  * PSGD step time at p=0.1 and p=1.0 (and the AdamW ratio if AdamW fits);
  * the isolated Q-update + Pg-apply slope time and its MFU
    (dense factor width 1280 -> monolithic fused NS kernel).

Writes results/gpt2_large_bench.json.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import bench
from psgd_torch_tpu.models import gpt2
import psgd_torch_tpu.optim as popt


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_n_step_donating(opt, loss_fn, n=bench.N_STEPS):
    """bench.make_n_step with params+state donated — at 774M the optimizer
    working sets are HBM-decisive (AdamW fp32 state: params 3.1 GB +
    m 3.1 + v 3.1; without donation in+out copies double that past the
    16 GB ceiling).  Donation matches what a real training loop does."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, state, tokens, targets):
        def body(_, carry):
            p, s, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, tokens, targets)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, loss)

        p, s, loss = jax.lax.fori_loop(
            0, n, body, (params, state, jnp.zeros((), jnp.float32)))
        leaf = jax.tree_util.tree_leaves(p)[0]
        return loss, jnp.sum(leaf.astype(jnp.float32))

    return run


def time_program_fresh(make_args, fn, n_inner=bench.N_STEPS, n_outer=3):
    """time_program for donating programs: rebuilds the (donated) args
    before every call."""
    loss, cs = fn(*make_args())
    _ = float(loss) + float(cs)
    best = float("inf")
    for _ in range(n_outer):
        args = make_args()
        t0 = time.perf_counter()
        loss, cs = fn(*args)
        _ = float(loss) + float(cs)
        best = min(best, (time.perf_counter() - t0) / n_inner)
    return best, float(loss)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}")
    if on_tpu:
        cfg = gpt2.gpt2_774m(compute_dtype=jnp.bfloat16, remat=True)
        batch = 1
    else:  # smoke mode
        cfg = gpt2.tiny_config(n_layer=2, n_embd=128, n_head=4,
                               vocab_size=512, block_size=64,
                               compute_dtype=jnp.float32)
        batch = 2
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    n_params = gpt2.count_params(params)
    log(f"params: {n_params/1e6:.1f}M  batch {batch} x seq {cfg.block_size}")
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              batch, cfg.block_size,
                                              cfg.vocab_size)
    mask = gpt2.scanned_layers_mask(params)
    loss_fn = lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg)
    pdt = jnp.bfloat16 if on_tpu else None
    nk = 128 if on_tpu else 32

    def psgd_opt(p_update):
        return popt.kron_whiten(
            learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_update_probability=p_update,
            preconditioner_dtype=pdt, momentum_dtype=pdt,
            norm_k=nk, weight_decay=0.01, scanned_layers=mask)

    def fresh_params():
        return gpt2.init_gpt2(key, cfg)

    opt01, opt1 = psgd_opt(0.1), psgd_opt(1.0)

    def args_of(opt):
        def make():
            p = fresh_params()
            return (p, opt.init(p), tokens, targets)
        return make

    t01, l01 = time_program_fresh(args_of(opt01),
                                  make_n_step_donating(opt01, loss_fn))
    log(f"psgd step (p=0.1): {t01*1e3:.2f} ms (loss {l01:.3f})")
    t1, l1 = time_program_fresh(args_of(opt1),
                                make_n_step_donating(opt1, loss_fn))
    log(f"psgd step (p=1.0): {t1*1e3:.2f} ms (loss {l1:.3f})")

    adamw_ms = None
    adamw_single_ms = None
    adamw_err = None
    adamw = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    try:
        ta, la = time_program_fresh(args_of(adamw),
                                    make_n_step_donating(adamw, loss_fn))
        adamw_ms = round(ta * 1e3, 2)
        log(f"adamw step: {ta*1e3:.2f} ms (loss {la:.3f})")
    except Exception as e:
        adamw_err = f"{type(e).__name__}: {str(e)[:200]}"
        log(f"adamw n-step loop failed (buffers donated): {adamw_err}")
        # fallback: donated SINGLE-step program (what a python training
        # loop runs); per-call time includes the ~25 ms remote dispatch
        try:
            import functools

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def one_step(p, s, x, y):
                loss, g = jax.value_and_grad(loss_fn)(p, x, y)
                u, s = adamw.update(g, s, p)
                return optax.apply_updates(p, u), s, loss

            p = fresh_params()
            s = adamw.init(p)
            p, s, loss = one_step(p, s, tokens, targets)
            _ = float(loss)
            ts = []
            for _i in range(16):
                t0 = time.perf_counter()
                p, s, loss = one_step(p, s, tokens, targets)
                _ = float(loss)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            adamw_single_ms = round(1e3 * ts[len(ts) // 2], 2)
            log(f"adamw donated single-step: median {adamw_single_ms:.2f} ms "
                "(includes ~25 ms/call dispatch)")
        except Exception as e2:
            log(f"adamw single-step also failed: {type(e2).__name__}: "
                f"{str(e2)[:200]}")

    # isolated Q-update + Pg-apply (slope between two loop lengths)
    tx = popt.scale_by_kron_whiten(preconditioner_max_skew=2.0,
                                   preconditioner_init_scale=1.0,
                                   preconditioner_dtype=pdt, norm_k=nk,
                                   scanned_layers=mask)
    grads = jax.jit(jax.grad(loss_fn))(params, tokens, targets)

    def cksum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree))

    def q_loop(n):
        @jax.jit
        def run(params, grads, state):
            def body(_, carry):
                p, s = carry
                u, s = tx.update(grads, s)
                p = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-3 * b.astype(a.dtype), p, u)
                return p, s
            p, s = jax.lax.fori_loop(0, n, body, (params, state))
            return jnp.zeros(()), cksum(p) + cksum(s.precond)
        return run

    n1, n2 = (8, 32) if on_tpu else (2, 8)
    tq1, _ = bench.time_program(q_loop(n1), (params, grads, tx.init(params)),
                                n_inner=1)
    tq2, _ = bench.time_program(q_loop(n2), (params, grads, tx.init(params)),
                                n_inner=1)
    t_q = max((tq2 - tq1) / (n2 - n1), 0.0)
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

    result = {
        "metric": "gpt2_774m_single_chip",
        "detail": {
            "device": str(dev), "params_m": round(n_params / 1e6, 1),
            "batch": batch, "seq": cfg.block_size, "remat": True,
            "psgd_p0.1_ms": round(t01 * 1e3, 2),
            "psgd_p1.0_ms": round(t1 * 1e3, 2),
            "psgd_steps_per_sec_p0.1": round(1.0 / t01, 3),
            "adamw_ms": adamw_ms,
            "adamw_single_step_donated_ms": adamw_single_ms,
            "psgd_p0.1_ratio_vs_adamw": (
                None if adamw_ms is None else round(t01 * 1e3 / adamw_ms, 4)),
            "adamw_note": (
                "buffers donated (real-training-loop memory behavior) for "
                "both optimizers" if adamw_ms is not None else
                "memory: AdamW's fp32 state needs buffer donation to fit at "
                "all at this scale (non-donated in+out copies = 18.6 GB > "
                "16 GB HBM, RESOURCE_EXHAUSTED verified); its donated "
                "n-step fori_loop program crashes this environment's "
                "remote compile helper, so the recorded AdamW number is "
                "the donated SINGLE-step program incl. ~25 ms/call "
                "dispatch. Regime note: at batch 1 the model FLOPs "
                "(~4.8 TF fwd+bwd) are comparable to PSGD's exprP apply "
                "(~4 TF matmuls), so the step ratio is optimizer-bound "
                "here — the production comparison at batch 4 is the 124M "
                "headline (1.003x); PSGD's bf16 state leaves ~7 GB of "
                "activation headroom AdamW does not have"),
            "q_update_apply_us": round(t_q * 1e6),
            "q_update_mfu": None if q_mfu is None else round(q_mfu, 4),
            "q_update_gflop_per_step": (
                None if flops is None else round(flops / 1e9, 2)),
        },
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "results" / \
        "gpt2_large_bench.json"
    if on_tpu:
        out.write_text(json.dumps(result, indent=1))
        log(f"wrote {out}")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
