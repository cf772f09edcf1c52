"""Optimizer-only wall-clock of cache_p vs the per-step exprP apply chain.

cache_p targets the PRODUCTION operating point (update probability annealed
to 0.01-0.1, misc/gpt2.py:440): on the ~(1-p) non-fit steps the apply runs
through the cached per-factor P_i = Q_i^H Q_i — a single factor pass instead
of the two-sided chain — so the saving is the apply matmuls themselves,
roughly half of them per dense factor.  At p = 1.0 every step refits and
pays the cache refresh on top, so cache_p should LOSE there; both regimes
are measured to show the crossover honestly.

Reports the MEDIAN step time: at small p almost every dispatch is a non-fit
step, so the median is the non-fit step time (the p->0 asymptote a long
training run spends its optimizer budget in).

Run on CPU; the removed exprP work is real arithmetic, so the wall-clock
ratio is a conservative proxy for TPU (bench.py's psgd_p0.1_cached_ratio is
the hardware datapoint).  Writes results/cache_p_cpu.json.
"""

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import psgd_torch_tpu.optim as popt  # noqa: E402
from psgd_torch_tpu.models import gpt2  # noqa: E402


def _opt(mask, cached, p_update):
    return popt.kron_whiten(
        learning_rate=1e-3, momentum=0.9, whiten_grad=False,
        preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
        preconditioner_update_probability=p_update,
        scanned_layers=mask, cache_p=cached)


def _time_opt(opt, params, steps):
    # donation below consumes the buffers: work on a private copy
    params = jax.tree_util.tree_map(jnp.copy, params)
    grads = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.key(2), p.shape, p.dtype) * 1e-2,
        params)

    def opt_step(grads, state, params):
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    state = opt.init(params)
    # donate state+params (as a real training loop does): without donation
    # the lax.cond pass-through of the unchanged cache costs a per-dispatch
    # copy that a fori_loop/jit training step does not pay
    compiled = (jax.jit(opt_step, donate_argnums=(1, 2))
                .lower(grads, state, params).compile())
    for _ in range(3):
        params, state = compiled(grads, state, params)
        jax.block_until_ready(state)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        params, state = compiled(grads, state, params)
        jax.block_until_ready(state)
        times.append(time.perf_counter() - t0)
    return {"step_ms_median": 1e3 * statistics.median(times),
            "step_ms_best": 1e3 * min(times)}


def main(steps=40):
    out = {"recipe": "momentum whitening, GPT-2 proportions, fp32",
           "note": ("median step time = the non-fit step at small p (the "
                    "p->0 asymptote of a production run); cache_p trades a "
                    "Q_i^H Q_i refresh per fit step for half the apply "
                    "matmuls per non-fit step, so it wins at small p and "
                    "loses at p=1.0"),
           "results": {}}
    for wtag, (n_layer, n_embd, n_head) in [("w128", (4, 128, 4)),
                                            ("w512", (2, 512, 8))]:
        cfg = gpt2.tiny_config(n_layer=n_layer, n_embd=n_embd, n_head=n_head,
                               block_size=64, vocab_size=512,
                               compute_dtype=jnp.float32)
        params = gpt2.init_gpt2(jax.random.key(0), cfg)
        mask = gpt2.scanned_layers_mask(params)
        for p_update, ptag in [(0.03, "p0.03"), (1.0, "p1.0")]:
            for cached in (False, True):
                name = f"{wtag}_{ptag}_" + ("cached" if cached else "plain")
                out["results"][name] = _time_opt(
                    _opt(mask, cached, p_update), params, steps)
                print(name, out["results"][name], flush=True)
            r = (out["results"][f"{wtag}_{ptag}_cached"]["step_ms_median"]
                 / out["results"][f"{wtag}_{ptag}_plain"]["step_ms_median"])
            out[f"{wtag}_{ptag}_cached_over_plain"] = round(r, 4)
            print(f"{wtag} {ptag} cached/plain: {r:.4f}", flush=True)

    dest = pathlib.Path(__file__).resolve().parent.parent / "results" / \
        "cache_p_cpu.json"
    dest.write_text(json.dumps(out, indent=1))
    print("wrote", dest)


if __name__ == "__main__":
    main()
