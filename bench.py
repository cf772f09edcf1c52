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

import pathlib
import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

N_STEPS = 8  # steps per timed program


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pallas_ns_flops(params, scanned_layers, norm_k: int,
                    max_skew: float) -> float:
    """Analytical FLOPs of the fused Pallas NS-tail kernels for one Q update
    (invisible to XLA cost_analysis): 6 n^3 + 16 k n^2 per dense factor."""
    import jax
    from psgd_torch_tpu.precond import kron as kron_p

    leaves = jax.tree_util.tree_leaves(params)
    flags = [bool(f) for f in jax.tree_util.tree_leaves(scanned_layers)]
    total = 0.0
    for leaf, f in zip(leaves, flags):
        shape = tuple(s for s in (leaf.shape[1:] if f else leaf.shape)
                      if s != 1)
        plan = kron_p.make_kron_plan(shape, max_skew=max_skew)
        reps = leaf.shape[0] if f else 1
        for n, diag in zip(plan.shape, plan.is_diag):
            if not diag and kron_p._fused_ns_enabled(n, jnp.bfloat16):
                total += reps * (6.0 * n ** 3 + 16.0 * norm_k * n ** 2)
    return total


def bf16_peak_flops(dev) -> float | None:
    """Per-chip bf16 peak FLOP/s for known TPU generations; None if the
    device is unrecognized (MFU then reported as unavailable rather than
    assuming a v5p peak)."""
    s = str(dev).lower()
    table = [
        ("v5 lite", 197e12), ("v5e", 197e12),      # v5e
        ("v5p", 459e12), ("v5", 459e12),            # v5p (after v5e checks)
        ("v6 lite", 918e12), ("v6e", 918e12),       # trillium
        ("v4", 275e12),
        ("v3", 123e12),
        ("v2", 45e12),
    ]
    for name, peak in table:
        if name in s:
            return peak
    return None


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


def time_interleaved(fns_args, n_inner=N_STEPS, n_outer=6):
    """Best-of-n timing with the programs interleaved per round, so slow
    drift in the remote-TPU round-trip (several ms over minutes) cancels in
    the ratios instead of landing on whichever program ran later."""
    losses = []
    for fn, args in fns_args:  # warmup: compile + first run
        loss, cs = fn(*args)
        _ = float(loss) + float(cs)
        losses.append(float(loss))
    best = [float("inf")] * len(fns_args)
    for _ in range(n_outer):
        for i, (fn, args) in enumerate(fns_args):
            t0 = time.perf_counter()
            loss, cs = fn(*args)
            _ = float(loss) + float(cs)
            best[i] = min(best[i], (time.perf_counter() - t0) / n_inner)
    return best, losses


def main(medium: bool = False):
    """Headline 124M comparison; ``--medium`` reruns it at GPT-2 350M
    proportions (24 x 1024 embd; dense Kron factors 1024) and records the
    result to results/gpt2_medium_bench.json — the full-model evidence that
    the step-ratio and Q-update MFU survive model growth."""
    import psgd_torch_tpu.optim as popt
    from psgd_torch_tpu.models import gpt2

    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform == "tpu"

    if on_tpu:
        # medium: 24 layers of un-remat'd bf16 activations (~24x144M temps)
        # exceed a single v5e chip's HBM, so remat the blocks there; the
        # ratio is still apples-to-apples (both optimizers pay the recompute)
        remat = medium
        cfg = (gpt2.gpt2_350m if medium else gpt2.gpt2_124m)(
            compute_dtype=jnp.bfloat16, remat=remat)
        batch, seq = (2 if medium else 4), cfg.block_size
    else:  # CPU smoke mode
        remat = False
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
    # vs PSGD at the production operating point (p=0.1) and at p=1.0, all
    # timed interleaved so remote-runtime drift cancels in the ratios
    adamw = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)

    def psgd_opt(p_update, **kw):
        return popt.kron_whiten(
            learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_update_probability=p_update,
            preconditioner_dtype=pdt, momentum_dtype=pdt,
            norm_k=nk, weight_decay=0.01,
            scanned_layers=mask, **kw)

    # share_fit_apply reuses the fit's P·m product as the update, saving one
    # exprP chain per fit step — the interesting operating point is p=1.0
    # (every step fits; early training in the reference's annealed recipe)
    opt01, opt1 = psgd_opt(0.1), psgd_opt(1.0)
    arms = [
        ("adamw", adamw),
        ("psgd_p0.1", opt01),
        ("psgd_p1.0", opt1),
    ]
    if medium:
        # 350M: the production-asymptote datapoint (p = 0.01, the
        # reference's end-of-anneal operating point, misc/gpt2.py:440);
        # the 124M-specific variant arms are dropped for HBM headroom
        arms.append(("psgd_p0.01", psgd_opt(0.01)))
    else:
        arms += [
            # share_fit_apply reuses the fit's P·m product as the update,
            # saving one exprP chain per fit step — interesting at p=1.0
            # (every step fits) and at the production point
            ("psgd_p1.0_shared", psgd_opt(1.0, share_fit_apply=True,
                                          update_preconditioner_first=False)),
            # pipelined_fit: the Q fit reads only the previous step's
            # momentum, so XLA may overlap it with forward/backward
            ("psgd_p1.0_pipelined", psgd_opt(1.0, pipelined_fit=True)),
            # cache_p: P_i = Q_i^H Q_i cached after each fit — the apply on
            # the ~90% non-fit steps at p=0.1 is a single factor pass
            ("psgd_p0.1_cached", psgd_opt(0.1, cache_p=True)),
            ("psgd_p0.1_shared", psgd_opt(0.1, share_fit_apply=True,
                                          update_preconditioner_first=False)),
        ]
    times, losses = time_interleaved([
        (make_n_step(opt, loss_fn),
         (params, opt.init(params), tokens, targets))
        for _, opt in arms])
    t_of = dict(zip([n for n, _ in arms], times))
    l_of = dict(zip([n for n, _ in arms], losses))
    for name, _ in arms:
        log(f"{name} step: {t_of[name]*1e3:.2f} ms (loss {l_of[name]:.3f})")
    t_adamw, t_psgd01, t_psgd1 = (t_of["adamw"], t_of["psgd_p0.1"],
                                  t_of["psgd_p1.0"])

    # --- isolated Q-update + Pg-apply (the primary kernel metric).
    # The loop body mirrors a real optimizer step: update + apply to a
    # carried parameter tree.  Every output is consumed (params and state are
    # loop carries, so XLA cannot elide any work), and the update tensor
    # fuses into the parameter write exactly as in a real train step — no
    # artificial checksum traffic (the old cksum-per-iter design added
    # ~0.5 ms/step of reduction reads) and no artificial materialization.
    # One checksum outside the loop pins the final values; the slope between
    # two loop lengths removes it along with the ~25 ms remote-dispatch
    # latency.
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

    n1, n2 = (8, 64) if on_tpu else (2, 8)
    t1, _ = time_program(q_loop(n1), (params, grads, tx.init(params)), n_inner=1)
    t2, _ = time_program(q_loop(n2), (params, grads, tx.init(params)), n_inner=1)
    t_q = max((t2 - t1) / (n2 - n1), 0.0)
    log(f"Q-update + Pg-apply: {t_q*1e6:.0f} us/step "
        f"({100*t_q/t_adamw:.1f}% of an adamw step)")

    # --- second datapoint: GPT-2 large proportions (n_embd = 1280, dense
    # factors above the r2 kernel envelope of 1024) — shows the headline
    # Q-update MFU survives model growth (VERDICT r2 item 2; measured in
    # the medium run too since r5 — VERDICT r4 next #6)
    wide = None
    if on_tpu:
        cfg_w = gpt2.tiny_config(n_layer=4, n_head=20, n_embd=1280,
                                 block_size=256, vocab_size=50304,
                                 compute_dtype=jnp.bfloat16)
        params_w = gpt2.init_gpt2(jax.random.fold_in(key, 7), cfg_w)
        mask_w = gpt2.scanned_layers_mask(params_w)
        tok_w, tgt_w = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 8),
                                               2, cfg_w.block_size,
                                               cfg_w.vocab_size)
        grads_w = jax.jit(jax.grad(
            lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg_w)))(
                params_w, tok_w, tgt_w)
        tx_w = popt.scale_by_kron_whiten(
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_dtype=pdt, norm_k=nk, scanned_layers=mask_w)

        def q_loop_w(n):
            @jax.jit
            def run(params, grads, state):
                def body(_, carry):
                    p, s = carry
                    u, s = tx_w.update(grads, s)
                    p = jax.tree_util.tree_map(
                        lambda a, b: a - 1e-3 * b.astype(a.dtype), p, u)
                    return p, s
                p, s = jax.lax.fori_loop(0, n, body, (params, state))
                return jnp.zeros(()), cksum(p) + cksum(s.precond)
            return run

        tw1, _ = time_program(q_loop_w(n1), (params_w, grads_w,
                                             tx_w.init(params_w)), n_inner=1)
        tw2, _ = time_program(q_loop_w(n2), (params_w, grads_w,
                                             tx_w.init(params_w)), n_inner=1)
        t_qw = max((tw2 - tw1) / (n2 - n1), 0.0)
        try:
            cw = (jax.jit(lambda g, s: tx_w.update(g, s))
                  .lower(grads_w, tx_w.init(params_w)).compile())
            caw = cw.cost_analysis()
            if isinstance(caw, list):
                caw = caw[0]
            fw = float(caw["flops"]) + pallas_ns_flops(params_w, mask_w,
                                                       nk, 2.0)
            peak_w = bf16_peak_flops(dev)
            mfu_w = None if peak_w is None else fw / max(t_qw, 1e-12) / peak_w
        except Exception:
            fw, mfu_w = None, None
        log(f"Q-update (wide, embd 1280): {t_qw*1e6:.0f} us/step, MFU "
            f"{'n/a' if mfu_w is None else f'{100*mfu_w:.1f}%'}")
        wide = {"n_embd": 1280, "n_layer": cfg_w.n_layer,
                "q_update_apply_us": round(t_qw * 1e6),
                "q_update_mfu": None if mfu_w is None else round(mfu_w, 4),
                "q_update_gflop_per_step": (
                    None if fw is None else round(fw / 1e9, 2))}

    # MFU of the Q-update + apply program (NS-iteration MFU/chip).
    # XLA cost analysis counts a while-loop body once regardless of trip
    # count, so lower the single-step update program directly.  Work done
    # inside Pallas kernels is invisible to cost_analysis (reported as a
    # ~0-flop custom call), so the fused NS-tail FLOPs are added back
    # analytically: per dense factor of size n run through the kernel,
    # step + two Procrustes products = 6 n^3, two subspace norm bounds
    # (2 half-iterations x 2 dots of (k, n)x(n, n)) = 16 k n^2.
    try:
        c1 = (jax.jit(lambda g, s: tx.update(g, s))
              .lower(grads, tx.init(params)).compile())
        ca = c1.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_step = float(ca["flops"])
        flops_per_step += pallas_ns_flops(params, mask, nk, 2.0) if on_tpu else 0.0
        peak = bf16_peak_flops(dev)
        if peak is None:
            q_mfu = None
            log(f"Q-update: {flops_per_step/1e9:.1f} GFLOP/step "
                f"(MFU unavailable: unrecognized device {dev})")
        else:
            q_mfu = flops_per_step / max(t_q, 1e-12) / peak
            log(f"Q-update MFU: {100*q_mfu:.1f}% "
                f"({flops_per_step/1e9:.1f} GFLOP/step)")
    except Exception as e:  # cost_analysis is best-effort across backends
        q_mfu, flops_per_step = None, None
        log(f"MFU estimate unavailable: {e}")

    ratio = t_psgd01 / t_adamw
    result = {
        "metric": ("gpt2_350m_psgd_kron_step_time_ratio_vs_adamw" if medium
                   else "gpt2_124m_psgd_kron_step_time_ratio_vs_adamw"),
        "value": round(ratio, 4),
        "unit": "x",
        "vs_baseline": round(ratio / 1.15, 4),
        "detail": {
            "device": str(dev),
            "params_m": round(n_params / 1e6, 1),
            "batch": batch, "seq": seq, "remat": remat,
            "adamw_ms": round(t_adamw * 1e3, 2),
            **{f"{name}_ms": round(t_of[name] * 1e3, 2)
               for name, _ in arms if name != "adamw"},
            **{f"{name}_ratio": round(t_of[name] / t_adamw, 4)
               for name, _ in arms if name not in ("adamw", "psgd_p0.1")},
            "q_update_apply_us": round(t_q * 1e6),
            "q_update_mfu": None if q_mfu is None else round(q_mfu, 4),
            "q_update_gflop_per_step": (
                None if flops_per_step is None else round(flops_per_step / 1e9, 2)),
            "psgd_steps_per_sec": round(1.0 / t_psgd01, 3),
            "wide_1280": wide,
            "note": "p=0.1 is the reference's production operating point "
                    "(update prob annealed 1.0->0.01, misc/gpt2.py:440)",
        },
    }
    if medium:
        out = pathlib.Path(__file__).parent / "results" / "gpt2_medium_bench.json"
        try:
            out.write_text(json.dumps(result, indent=1))
            log(f"wrote {out}")
        except OSError as e:
            log(f"could not write {out}: {e}")
    print(json.dumps(result), flush=True)


def convergence(n_steps: int = 1000, data_seed: int = 1,
                anneal: bool = False, sweep: bool = False,
                only_arm: str = None, merge_only: bool = False):
    """`python bench.py --convergence [steps]`: train GPT-2 with AdamW and
    PSGD-Kron at the reference's matched settings (misc/gpt2.py:400-413;
    PSGD lr = Adam lr / sqrt((1+beta)/(1-beta)) = 1e-3/4) on the committed
    REAL-TEXT corpus (data/corpus.txt.gz — license prose + open-source
    Python sources; see tools/make_corpus.py.  The reference's number is
    WikiText-103, unavailable here without egress) and compare train and
    held-out losses — the 'matching loss curve' half of the BASELINE.md
    target.  Fresh random-window batch per step; train loss averaged over
    the last quarter; val loss on fixed held-out windows.

    ``--sweep`` is the headline protocol (VERDICT r4 next #1): AdamW is
    swept over lr in {3e-4, 1e-3} x {fixed, cosine-decay} and PSGD (also
    given fixed and cosine arms at the reference-scaled lr) is compared
    against the BEST AdamW arm by held-out loss — so "PSGD wins" cannot be
    an artifact of one mistuned AdamW operating point."""
    import psgd_torch_tpu.optim as popt
    from psgd_torch_tpu.models import gpt2, lm_data

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
    train_toks, val_toks, vocab_used = lm_data.load_tokens(cfg.vocab_size)
    log(f"corpus: {train_toks.size/1e6:.2f}M train tokens, "
        f"{val_toks.size/1e3:.0f}k val, vocab used {vocab_used}")
    key = jax.random.key(0)
    params0 = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params0)
    pdt = jnp.bfloat16 if on_tpu else None

    def run(opt):
        state = opt.init(params0)

        @jax.jit
        def step(params, state, tokens, targets):
            loss, grads = jax.value_and_grad(gpt2.loss_gpt2)(
                params, tokens, targets, cfg)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss

        @jax.jit
        def eval_loss(params, tokens, targets):
            return gpt2.loss_gpt2(params, tokens, targets, cfg)

        params, tail, curve = params0, [], []
        t_start = None  # start the clock after step 0 (compile excluded)
        for i in range(n_steps):
            tokens, targets = lm_data.corpus_batch(
                jax.random.fold_in(jax.random.key(data_seed), i), train_toks,
                batch, cfg.block_size)
            params, state, loss = step(params, state, tokens, targets)
            if i % max(n_steps // 20, 1) == 0:
                curve.append((i, round(float(loss), 4)))
            if i >= (3 * n_steps) // 4:
                tail.append(float(loss))
            if i == 0:
                float(loss)  # sync: compile + first step done
                t_start = time.perf_counter()
        jax.block_until_ready(params)
        wall_s = time.perf_counter() - t_start
        vt, vy = lm_data.corpus_batch(jax.random.key(999), val_toks,
                                      8, cfg.block_size)
        vloss = float(eval_loss(params, vt, vy))
        return sum(tail) / len(tail), vloss, curve, wall_s

    # --anneal gives BOTH optimizers the same cosine lr decay (to 10% of
    # peak) — guards the comparison against "AdamW only plateaued because
    # its lr stayed fixed"; the default matches the reference's constant-lr
    # protocol (misc/gpt2.py:400-413)
    def lr_of(peak, cosine=None):
        if not (anneal if cosine is None else cosine):
            return peak
        return optax.cosine_decay_schedule(peak, n_steps, alpha=0.1)

    def make_psgd(lr):
        return popt.kron_whiten(
            learning_rate=lr, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            # the reference's production recipe anneals the update
            # probability from 1.0 down over training (misc/gpt2.py:440)
            preconditioner_update_probability=optax.linear_schedule(
                1.0, 0.1, max(n_steps // 2, 1)),
            preconditioner_dtype=pdt, momentum_dtype=pdt,
            norm_k=128 if on_tpu else 32, weight_decay=0.01,
            scanned_layers=mask)

    if sweep:
        # the 6 arms leak ~15-20 GB of host memory each through the axon
        # client, so a single process running all of them gets OOM-killed:
        # --arm=<name> runs ONE arm (its own process) and saves a partial
        # under results/_sweep_arms/; --merge assembles the artifact once
        # all six partials exist.  `tools/run_convergence_sweep.sh` drives
        # the whole protocol.
        arm_defs = []
        for lr in (1e-3, 3e-4):
            for cosine in (False, True):
                arm_defs.append((
                    f"adamw_lr{lr:g}_{'cosine' if cosine else 'fixed'}",
                    "adamw", dict(lr=lr, cosine=cosine)))
        for cosine in (False, True):
            arm_defs.append((
                f"psgd_lr{1e-3/4:g}_{'cosine' if cosine else 'fixed'}",
                "psgd", dict(cosine=cosine)))

        def build(kind, meta):
            if kind == "adamw":
                return optax.adamw(lr_of(meta["lr"], meta["cosine"]),
                                   b1=0.9, b2=0.95, weight_decay=0.01)
            return make_psgd(lr_of(1e-3 / 4, meta["cosine"]))

        arm_dir = pathlib.Path(__file__).parent / "results" / "_sweep_arms"
        arm_dir.mkdir(parents=True, exist_ok=True)

        def arm_path(name):
            return arm_dir / f"{name}_s{n_steps}_seed{data_seed}.json"

        adamw_arms, psgd_arms = [], []
        for name, kind, meta in arm_defs:
            if only_arm is not None and name != only_arm:
                continue
            if merge_only or (only_arm is None and arm_path(name).exists()):
                rec = json.loads(arm_path(name).read_text())
            else:
                l, v, c, w = run(build(kind, meta))
                log(f"{name}: train {l:.4f}  val {v:.4f}  wall {w:.1f}s")
                rec = dict(name=name, kind=kind, train=l, val=v, curve=c,
                           wall=w, **meta)
                arm_path(name).write_text(json.dumps(rec))
                log(f"saved arm partial: {arm_path(name)}")
            (adamw_arms if kind == "adamw" else psgd_arms).append(rec)
        if only_arm is not None:
            return  # single-arm process: partial saved, merge comes later
        if not adamw_arms or not psgd_arms:
            raise SystemExit(
                f"sweep merge needs at least one adamw and one psgd arm "
                f"partial in {arm_dir} "
                f"(have {len(adamw_arms)} adamw + {len(psgd_arms)} psgd)")
        if len(adamw_arms) + len(psgd_arms) < 6:
            log(f"sweep merge: only {len(adamw_arms)} adamw + "
                f"{len(psgd_arms)} psgd arms available — the best-of-N "
                f"counts in the artifact reflect what actually ran")
        best_adamw = min(adamw_arms, key=lambda a: a["val"])
        best_psgd = min(psgd_arms, key=lambda a: a["val"])
        log(f"best adamw arm: {best_adamw['name']}  "
            f"best psgd arm: {best_psgd['name']}")
        l_adamw, v_adamw = best_adamw["train"], best_adamw["val"]
        c_adamw, w_adamw = best_adamw["curve"], best_adamw["wall"]
        l_psgd, v_psgd = best_psgd["train"], best_psgd["val"]
        c_psgd, w_psgd = best_psgd["curve"], best_psgd["wall"]
    else:
        adamw = optax.adamw(lr_of(1e-3), b1=0.9, b2=0.95, weight_decay=0.01)
        l_adamw, v_adamw, c_adamw, w_adamw = run(adamw)
        log(f"adamw  train loss (last quarter mean): {l_adamw:.4f}  "
            f"val: {v_adamw:.4f}  wall {w_adamw:.1f}s")
        log(f"adamw  curve: {c_adamw}")

        l_psgd, v_psgd, c_psgd, w_psgd = run(make_psgd(lr_of(1e-3 / 4)))
        log(f"psgd   train loss (last quarter mean): {l_psgd:.4f}  "
            f"val: {v_psgd:.4f}  wall {w_psgd:.1f}s")
        log(f"psgd   curve: {c_psgd}")

    result = {
        "metric": ("gpt2_convergence_psgd_vs_best_adamw_loss_ratio" if sweep
                   else "gpt2_convergence_psgd_vs_adamw_loss_ratio"),
        "value": round(l_psgd / l_adamw, 4),
        "unit": "x (<= 1.0 means PSGD at or below AdamW loss)",
        "vs_baseline": round((l_psgd / l_adamw) / 1.0, 4),
        "detail": {"device": str(dev), "steps": n_steps, "batch": batch,
                   "data": "real text (data/corpus.txt.gz: license prose + "
                           "open-source python sources; WikiText-103 "
                           "unavailable without egress)",
                   "tokens_seen": n_steps * batch * cfg.block_size,
                   "corpus_tokens": int(train_toks.size),
                   "epochs_over_corpus": round(
                       n_steps * batch * cfg.block_size / train_toks.size, 1),
                   "data_seed": data_seed,
                   "adamw_train_loss": round(l_adamw, 4),
                   "psgd_train_loss": round(l_psgd, 4),
                   "adamw_val_loss": round(v_adamw, 4),
                   "psgd_val_loss": round(v_psgd, 4),
                   "val_ratio": round(v_psgd / v_adamw, 4),
                   "adamw_wall_s": round(w_adamw, 1),
                   "psgd_wall_s": round(w_psgd, 1),
                   "adamw_curve": c_adamw, "psgd_curve": c_psgd},
    }
    # time-to-quality: first curve point where PSGD is at or below AdamW's
    # final train loss (the wall-clock-win framing of the reference's
    # "matching loss curve" claim, since step times are ~equal — see the
    # headline step-ratio metric)
    hit = next((s for s, l in c_psgd if l <= l_adamw), None)
    if hit is not None:
        result["detail"]["psgd_steps_to_adamw_final_train_loss"] = hit
        result["detail"]["steps_to_quality_ratio"] = round(hit / n_steps, 3)
        # wall-clock framing: PSGD seconds to reach AdamW's final train
        # loss, over AdamW's full-run seconds.  Extrapolated from PSGD's
        # RUN-AVERAGE step time; its first `hit` steps run at p ~ 1 (the
        # update-probability anneal) and are up to ~4% slower per step at
        # 124M, so the true ratio is up to that much higher.
        result["detail"]["wallclock_to_quality_ratio"] = round(
            (hit / n_steps) * w_psgd / w_adamw, 3)
        result["detail"]["wallclock_to_quality_note"] = (
            "extrapolated from PSGD's run-average step time; early steps "
            "run at update probability ~1 and are up to ~4% slower")
    if sweep:
        result["detail"]["protocol"] = (
            f"PSGD (best of {len(psgd_arms)} arms at the reference-scaled "
            f"lr 1e-3/4: fixed/cosine) vs BEST-of-{len(adamw_arms)} AdamW "
            "arm (lr {3e-4, 1e-3} x {fixed, cosine to 10%}), selected by "
            "held-out loss")
        result["detail"]["adamw_arms"] = [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in a.items() if k != "curve"} for a in adamw_arms]
        result["detail"]["psgd_arms"] = [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in a.items() if k != "curve"} for a in psgd_arms]
        result["detail"]["best_adamw_arm"] = best_adamw["name"]
        result["detail"]["best_psgd_arm"] = best_psgd["name"]
    name = ("gpt2_convergence.json" if data_seed == 1
            else f"gpt2_convergence_seed{data_seed}.json")
    if anneal:
        name = name.replace(".json", "_annealed.json")
        result["detail"]["lr_schedule"] = "cosine to 10% over the run (both optimizers)"
    out = pathlib.Path(__file__).parent / "results" / name
    try:
        out.write_text(json.dumps(result, indent=1))
        log(f"wrote {out}")
    except OSError as e:  # read-only checkout: still print the metric
        log(f"could not write {out}: {e}")
    print(json.dumps(result), flush=True)


def _backend_watchdog(seconds: int = 300):
    """The axon TPU tunnel can hang indefinitely at backend init when it is
    down (jax.devices() blocks in C with the GIL released).  Arm a daemon
    timer that, if the first device query has not completed in ``seconds``,
    prints one parseable JSON error line and hard-exits — so the driver
    records a failure instead of a hang."""
    import os
    import threading

    done = threading.Event()

    def fire():
        if done.wait(seconds):
            return
        print(json.dumps({
            "metric": "gpt2_124m_psgd_kron_step_time_ratio_vs_adamw",
            "value": None, "unit": "x", "vs_baseline": None,
            "error": f"TPU backend init did not complete in {seconds}s "
                     "(axon tunnel down?)"}), flush=True)
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    jax.devices()  # blocks here if the tunnel is down
    done.set()


if __name__ == "__main__":
    _backend_watchdog()
    if "--convergence" in sys.argv:
        extra = [a for a in sys.argv[1:] if a.isdigit()]
        seed = 1
        for a in sys.argv[1:]:
            if a.startswith("--seed="):
                seed = int(a.split("=", 1)[1])
        arm = None
        for a in sys.argv[1:]:
            if a.startswith("--arm="):
                arm = a.split("=", 1)[1]
        convergence(int(extra[0]) if extra else 1000, data_seed=seed,
                    anneal="--anneal" in sys.argv,
                    sweep="--sweep" in sys.argv, only_arm=arm,
                    merge_only="--merge" in sys.argv)
    elif "--medium" in sys.argv:
        main(medium=True)
    else:
        main()
