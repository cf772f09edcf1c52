"""Headline benchmark: GPT-2 124M PSGD-Kron step time vs AdamW (optax).

Target (BASELINE.md): PSGD-Kron step time <= 1.15x AdamW with matching loss
curve.  The headline value is measured at the reference's production
operating point (preconditioner_update_probability = 0.1; the reference
anneals 1.0 -> 0.01, misc/gpt2.py:440); the always-update p=1.0 cost is in
`detail`.

Timing design: N training steps inside ONE jitted lax.fori_loop, and the
result forced to host with float() — the axon TPU runtime dispatches
asynchronously and `block_until_ready` alone under-reports, so per-call
wall-clock of a multi-step program with a scalar fetch is the only reliable
clock.

Prints ONE JSON line:
  {"metric": ..., "value": <psgd_step/adamw_step ratio at p=0.1>,
   "unit": "x", "vs_baseline": <value / 1.15, < 1.0 means target met>}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

N_STEPS = 8  # steps per timed program


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_n_step(opt, loss_fn, n=N_STEPS):
    @jax.jit
    def run(params, state, tokens, targets):
        def body(_, carry):
            p, s, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, tokens, targets)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, loss)

        p, s, loss = jax.lax.fori_loop(
            0, n, body, (params, state, jnp.zeros((), jnp.float32)))
        # checksum ties the timing to the full parameter update
        leaf = jax.tree_util.tree_leaves(p)[0]
        return loss, jnp.sum(leaf.astype(jnp.float32))

    return run


def time_program(fn, args, n_inner=N_STEPS, n_outer=3):
    loss, cs = fn(*args)
    _ = float(loss) + float(cs)  # warmup: compile + first run
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        loss, cs = fn(*args)
        _ = float(loss) + float(cs)
        best = min(best, (time.perf_counter() - t0) / n_inner)
    return best, float(loss)


def main():
    import psgd_torch_tpu.optim as popt
    from psgd_torch_tpu.models import gpt2

    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform == "tpu"

    if on_tpu:
        cfg = gpt2.gpt2_124m(compute_dtype=jnp.bfloat16, remat=False)
        batch, seq = 4, cfg.block_size
    else:  # CPU smoke mode
        cfg = gpt2.tiny_config(n_layer=2, n_embd=128, n_head=4,
                               vocab_size=1024, block_size=64,
                               compute_dtype=jnp.float32)
        batch, seq = 4, cfg.block_size

    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    n_params = gpt2.count_params(params)
    log(f"params: {n_params/1e6:.1f}M  batch {batch} x seq {seq}")
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              batch, seq, cfg.vocab_size)
    mask = gpt2.scanned_layers_mask(params)
    loss_fn = lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg)

    pdt = jnp.bfloat16 if on_tpu else None
    nk = 128 if on_tpu else 32

    # --- AdamW baseline (reference gpt2 demo settings, misc/gpt2.py:400-413)
    adamw = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    t_adamw, l_adamw = time_program(make_n_step(adamw, loss_fn),
                                    (params, adamw.init(params), tokens, targets))
    log(f"adamw step: {t_adamw*1e3:.2f} ms (loss {l_adamw:.3f})")

    def psgd_opt(p_update):
        return popt.kron_whiten(
            learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_update_probability=p_update,
            preconditioner_dtype=pdt, momentum_dtype=pdt,
            norm_k=nk, weight_decay=0.01,
            scanned_layers=mask)

    # --- PSGD at the production operating point (p_update = 0.1)
    opt01 = psgd_opt(0.1)
    t_psgd01, l_psgd01 = time_program(make_n_step(opt01, loss_fn),
                                      (params, opt01.init(params), tokens, targets))
    log(f"psgd step (p=0.1): {t_psgd01*1e3:.2f} ms (loss {l_psgd01:.3f})")

    # --- PSGD updating Q every step (p_update = 1.0)
    opt1 = psgd_opt(1.0)
    t_psgd1, l_psgd1 = time_program(make_n_step(opt1, loss_fn),
                                    (params, opt1.init(params), tokens, targets))
    log(f"psgd step (p=1.0): {t_psgd1*1e3:.2f} ms (loss {l_psgd1:.3f})")

    # --- isolated Q-update + Pg-apply (the primary kernel metric).
    # Checksums cover EVERY update and state leaf (a partial checksum lets
    # XLA dead-code-eliminate most of the work), and the cost is measured as
    # the slope between two loop lengths (the remote-runtime dispatch has a
    # fixed ~25 ms per-call latency that a single timing would absorb).
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
        def run(grads, state):
            def body(_, carry):
                s, acc = carry
                u, s = tx.update(grads, s)
                return s, acc + cksum(u)
            s, acc = jax.lax.fori_loop(
                0, n, body, (state, jnp.zeros((), jnp.float32)))
            return jnp.zeros(()), acc + cksum(s.precond)
        return run

    n1, n2 = (8, 64) if on_tpu else (2, 8)
    t1, _ = time_program(q_loop(n1), (grads, tx.init(params)), n_inner=1)
    t2, _ = time_program(q_loop(n2), (grads, tx.init(params)), n_inner=1)
    t_q = max((t2 - t1) / (n2 - n1), 0.0)
    log(f"Q-update + Pg-apply: {t_q*1e6:.0f} us/step "
        f"({100*t_q/t_adamw:.1f}% of an adamw step)")

    # MFU of the Q-update + apply program (NS-iteration MFU/chip).
    # XLA cost analysis counts a while-loop body once regardless of trip
    # count, so lower the single-step update program directly.
    try:
        c1 = (jax.jit(lambda g, s: tx.update(g, s))
              .lower(grads, tx.init(params)).compile())
        ca = c1.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_step = float(ca["flops"])
        peak = 197e12 if "v5 lite" in str(dev) else 459e12  # bf16 peak
        q_mfu = flops_per_step / max(t_q, 1e-12) / peak
        log(f"Q-update MFU: {100*q_mfu:.1f}% "
            f"({flops_per_step/1e9:.1f} GFLOP/step)")
    except Exception as e:  # cost_analysis is best-effort across backends
        q_mfu, flops_per_step = None, None
        log(f"MFU estimate unavailable: {e}")

    ratio = t_psgd01 / t_adamw
    result = {
        "metric": "gpt2_124m_psgd_kron_step_time_ratio_vs_adamw",
        "value": round(ratio, 4),
        "unit": "x",
        "vs_baseline": round(ratio / 1.15, 4),
        "detail": {
            "device": str(dev),
            "params_m": round(n_params / 1e6, 1),
            "batch": batch, "seq": seq,
            "adamw_ms": round(t_adamw * 1e3, 2),
            "psgd_p0.1_ms": round(t_psgd01 * 1e3, 2),
            "psgd_p1.0_ms": round(t_psgd1 * 1e3, 2),
            "psgd_p1.0_ratio": round(t_psgd1 / t_adamw, 4),
            "q_update_apply_us": round(t_q * 1e6),
            "q_update_mfu": None if q_mfu is None else round(q_mfu, 4),
            "q_update_gflop_per_step": (
                None if flops_per_step is None else round(flops_per_step / 1e9, 2)),
            "psgd_steps_per_sec": round(1.0 / t_psgd01, 3),
            "note": "p=0.1 is the reference's production operating point "
                    "(update prob annealed 1.0->0.01, misc/gpt2.py:440)",
        },
    }
    print(json.dumps(result), flush=True)


def convergence(n_steps: int = 300):
    """`python bench.py --convergence`: train GPT-2 with AdamW and PSGD-Kron
    at the reference's matched settings (misc/gpt2.py:400-413; PSGD lr =
    Adam lr / sqrt((1+beta)/(1-beta)) = 1e-3/4) on the synthetic LM corpus
    and compare end-of-run train loss — the 'matching loss curve' half of the
    BASELINE.md target.  Fresh batch per step, loss averaged over the last
    quarter of training."""
    import psgd_torch_tpu.optim as popt
    from psgd_torch_tpu.models import gpt2

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        cfg = gpt2.gpt2_124m(compute_dtype=jnp.bfloat16, remat=False)
        batch = 4
    else:
        cfg = gpt2.tiny_config(n_layer=2, n_embd=128, n_head=4,
                               vocab_size=1024, block_size=64,
                               compute_dtype=jnp.float32)
        batch, n_steps = 4, min(n_steps, 60)
    key = jax.random.key(0)
    params0 = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params0)
    pdt = jnp.bfloat16 if on_tpu else None

    def run(opt):
        state = opt.init(params0)

        @jax.jit
        def step(params, state, i):
            tokens, targets = gpt2.synthetic_lm_batch(
                jax.random.fold_in(jax.random.key(1), i), batch,
                cfg.block_size, cfg.vocab_size)
            loss, grads = jax.value_and_grad(gpt2.loss_gpt2)(
                params, tokens, targets, cfg)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss

        params, tail = params0, []
        for i in range(n_steps):
            params, state, loss = step(params, state, i)
            if i >= (3 * n_steps) // 4:
                tail.append(float(loss))
        return sum(tail) / len(tail)

    adamw = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    l_adamw = run(adamw)
    log(f"adamw   loss (last quarter mean): {l_adamw:.4f}")

    psgd = popt.kron_whiten(
        learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
        preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
        # the reference's production recipe anneals the update probability
        # from 1.0 down over training (misc/gpt2.py:440)
        preconditioner_update_probability=optax.linear_schedule(
            1.0, 0.1, max(n_steps // 2, 1)),
        preconditioner_dtype=pdt, momentum_dtype=pdt,
        norm_k=128 if on_tpu else 32, weight_decay=0.01,
        scanned_layers=mask)
    l_psgd = run(psgd)
    log(f"psgd    loss (last quarter mean): {l_psgd:.4f}")

    result = {
        "metric": "gpt2_convergence_psgd_vs_adamw_loss_ratio",
        "value": round(l_psgd / l_adamw, 4),
        "unit": "x (<= 1.0 means PSGD at or below AdamW loss)",
        "vs_baseline": round((l_psgd / l_adamw) / 1.0, 4),
        "detail": {"device": str(dev), "steps": n_steps, "batch": batch,
                   "adamw_loss": round(l_adamw, 4),
                   "psgd_loss": round(l_psgd, 4)},
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if "--convergence" in sys.argv:
        convergence()
    else:
        main()
