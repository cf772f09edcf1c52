"""Schedule evidence for ``pipelined_fit`` (VERDICT r4 next #4).

The claim (optim/transforms.py `kron_whiten` docstring): with
``pipelined_fit=True`` the Q fit reads only the PREVIOUS step's momentum,
so it has zero data dependency on the current forward/backward and XLA's
latency-hiding scheduler is free to interleave it with them.  Round 4 had
no measurement behind this.  This tool extracts the evidence directly from
the compiled TPU executable's instruction SCHEDULE (the post-scheduling
HLO is the execution order on TPU — ``is_scheduled=true``):

  * compile the full GPT-2 124M train step at a literal update
    probability of 1.0 (the `always_fit` specialization drops the lax.cond
    around the fit — a cond is a separate HLO computation, i.e. a
    scheduling barrier, so this is what makes overlap POSSIBLE at all);
  * tag positions: fit ops carry the ``psgd_q_fit`` named_scope in their
    metadata (fusions are classified by their fused computation's body),
    backward ops carry ``transpose(jvp``;
  * report, for pipelined_fit on and off: the fraction of fit ops the
    scheduler placed BEFORE the last backward op, and the schedule span of
    the fit region vs the backward region — plus wall-clock step times.

Honest scope (recorded in the artifact): on ONE chip the TPU core executes
the scheduled ops serially, so interleaving does not change single-chip
step time (bench.py measures ~noise); the interleaved schedule is the
property that lets the fit's collectives (stack/factor-sharded Q) run as
async ops under compute when the state is sharded.  Writes
results/pipelined_fit_overlap.json.
"""

import functools
import json
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import gpt2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_CALLS = re.compile(r"(?:calls=|to_apply=|body=|condition=)%?([\w.\-]+)")
_BRANCHES = re.compile(r"branch_computations=\{([^}]*)\}")


def split_computations(hlo: str):
    """Map computation name -> body text; also return the ENTRY body."""
    comps, entry = {}, None
    name, lines = None, []
    for line in hlo.splitlines():
        m = re.match(r"^(ENTRY )?%?([\w.\-]+) .*\{", line)
        if m and not line.startswith(" "):
            name, is_entry, lines = m.group(2), bool(m.group(1)), []
            comps[name] = lines
            if is_entry:
                entry = lines
            continue
        if name is not None:
            if line.startswith("}"):
                name = None
            else:
                lines.append(line)
    return {k: "\n".join(v) for k, v in comps.items()}, entry


_DOT = re.compile(r" = \S+ (?:dot|convolution)\(")


def _refs_of(text):
    refs = [m.group(1) for m in _CALLS.finditer(text)]
    for m in _BRANCHES.finditer(text):
        refs += [r.strip().lstrip("%") for r in m.group(1).split(",")]
    return refs


def _line_weights(line):
    """MXU ops (dot/convolution) on one instruction line, split by the
    metadata tag.  Matmuls are where the fit's and backward's time actually
    goes — cheap grad-independent prep (noise synthesis, constants, eye
    broadcasts) is excluded so the baseline does not look 'overlapped' for
    free."""
    if not _DOT.search(line):
        return 0, 0
    if "psgd_q_fit" in line:
        return 1, 0
    if "transpose(jvp" in line:
        return 0, 1
    return 0, 0


def _transitive_weights(comps):
    """(fit_dots, bwd_dots) per computation, counting through fusions,
    calls, while bodies, and conditional branches (scan lowers the layer
    stack to a while — fwd/bwd matmuls live in its body, not in ENTRY)."""
    memo = {}

    def weigh(name, stack=()):
        if name in memo:
            return memo[name]
        if name in stack:       # recursion guard (should not happen in HLO)
            return (0, 0)
        f = b = 0
        for line in comps.get(name, "").splitlines():
            lf, lb = _line_weights(line)
            f, b = f + lf, b + lb
            for ref in _refs_of(line):
                if ref in comps:
                    rf, rb = weigh(ref, stack + (name,))
                    f, b = f + rf, b + rb
        memo[name] = (f, b)
        return memo[name]

    for name in comps:
        weigh(name)
    return memo


def classify(entry_lines, comps):
    """Per scheduled-instruction MXU-op weights: (fit_dots, bwd_dots)."""
    trans = _transitive_weights(comps)
    weights, n = [], 0
    for line in entry_lines:
        if " = " not in line:
            continue
        n += 1
        f, b = _line_weights(line)
        for ref in _refs_of(line):
            if ref in trans:
                f, b = f + trans[ref][0], b + trans[ref][1]
        weights.append((f, b))
    return weights, n


def schedule_metrics(compiled):
    comps, entry = split_computations(compiled.as_text())
    if entry is None:
        raise RuntimeError("no ENTRY computation found")
    weights, n = classify(entry, comps)
    fit_total = sum(f for f, _ in weights)
    bwd_total = sum(b for _, b in weights)
    if not fit_total or not bwd_total:
        raise RuntimeError(f"classification found fit_dots={fit_total} "
                           f"bwd_dots={bwd_total}")
    fit_pos = [i for i, (f, _) in enumerate(weights) if f]
    bwd_pos = [i for i, (_, b) in enumerate(weights) if b]
    last_bwd = max(bwd_pos)
    before = sum(f for i, (f, _) in enumerate(weights) if i < last_bwd)
    return {
        "entry_ops": n,
        "fit_dots": fit_total,
        "bwd_dots": bwd_total,
        "fit_dot_span": [min(fit_pos), max(fit_pos)],
        "bwd_dot_span": [min(bwd_pos), max(bwd_pos)],
        "fit_dots_before_bwd_end": before,
        "fit_overlap_fraction": round(before / fit_total, 4),
    }


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}")
    if on_tpu:
        cfg = gpt2.gpt2_124m(compute_dtype=jnp.bfloat16, remat=False)
        batch = 4
    else:
        cfg = gpt2.tiny_config(n_layer=2, n_embd=128, n_head=4,
                               vocab_size=1024, block_size=64,
                               compute_dtype=jnp.float32)
        batch = 4
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params)
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              batch, cfg.block_size,
                                              cfg.vocab_size)
    pdt = jnp.bfloat16 if on_tpu else None
    nk = 128 if on_tpu else 32

    def make_opt(pipelined):
        return popt.kron_whiten(
            learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_update_probability=1.0,  # literal: cond-free fit
            preconditioner_dtype=pdt, momentum_dtype=pdt,
            norm_k=nk, weight_decay=0.01, scanned_layers=mask,
            pipelined_fit=pipelined)

    results = {"device": str(dev), "model": "gpt2_124m" if on_tpu
               else "gpt2_tiny_smoke", "batch": batch,
               "update_probability": 1.0,
               "scope_note": (
                   "schedule indices from the compiled executable "
                   "(is_scheduled=true => execution order).  What this "
                   "shows: (1) the pipelined fit region is cond-free and "
                   "entry-level schedulable (always_fit at literal p=1.0) "
                   "with its backward-dot dependencies EMPTY — the bwd "
                   "dots complete in a tight early window and nothing "
                   "forces the fit after them, whereas the baseline fit's "
                   "placement is pinned by per-leaf grad dataflow; (2) the "
                   "single-chip cost of pipelining is ~zero (step_ms "
                   "delta).  What it does NOT show: a latency-hiding win — "
                   "one serial core has no idle unit to hide the fit in, "
                   "and the multi-chip collective overlap this enables is "
                   "not measurable in this single-chip environment; the "
                   "flag's mesh benefit is EXPERIMENTAL until profiled on "
                   "real multi-chip hardware.")}
    for pipelined in (False, True):
        opt = make_opt(pipelined)
        state = opt.init(params)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, s, x, y):
            loss, grads = jax.value_and_grad(gpt2.loss_gpt2)(p, x, y, cfg)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        compiled = step.lower(params, state, tokens, targets).compile()
        met = schedule_metrics(compiled)
        # wall-clock (chained, donated)
        p, s = jax.tree_util.tree_map(jnp.copy, (params, state))
        p, s, loss = compiled(p, s, tokens, targets)
        _ = float(loss)
        best = float("inf")
        for _outer in range(3):
            t0 = time.perf_counter()
            for _i in range(16):
                p, s, loss = compiled(p, s, tokens, targets)
            _ = float(loss)
            best = min(best, (time.perf_counter() - t0) / 16)
        met["step_ms"] = round(best * 1e3, 2)
        results["pipelined" if pipelined else "baseline"] = met
        log(f"pipelined={pipelined}: {met}")

    b, pl = results["baseline"], results["pipelined"]
    results["summary"] = {
        "baseline_fit_overlap_fraction": b["fit_overlap_fraction"],
        "pipelined_fit_overlap_fraction": pl["fit_overlap_fraction"],
        "step_ms_delta": round(pl["step_ms"] - b["step_ms"], 2),
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "results" / \
        "pipelined_fit_overlap.json"
    if on_tpu:
        out.write_text(json.dumps(results, indent=1))
        log(f"wrote {out}")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
