"""Optimizer-only wall-clock of share_fit_apply vs the separate apply.

Measures the PSGD whiten optimizer alone (fit + apply on fixed grads, no
fwd/bwd) at preconditioner_update_probability=1.0 — the operating point the
feature targets (every step fits, so every step saves one exprP chain) — in
two configurations:

  * replicated: plain transform on one whole model tree;
  * production: the SCALING_r03 layout (stack_sharding over fsdp +
    factor_sharding for the embeddings) on the 8-device virtual mesh.

Run on CPU (virtual 8-device mesh); the saved exprP work is real arithmetic,
so the CPU wall-clock ratio is a conservative proxy for the TPU ratio (on
TPU the exprP chain is MXU-bound and the saving is the same fraction of the
Q-update+apply time).

Writes results/share_fit_apply_cpu.json.
"""

import contextlib
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
from jax.sharding import NamedSharding, PartitionSpec as PS  # noqa: E402

import psgd_torch_tpu.optim as popt  # noqa: E402
from psgd_torch_tpu.models import gpt2  # noqa: E402
from psgd_torch_tpu.parallel import (gpt2_partition_specs, make_mesh,  # noqa: E402
                                     named_shardings, psgd_state_specs)


def _opt(mask, share, mesh=None, p_specs=None, n_layer=None):
    kw = dict(learning_rate=1e-3, momentum=0.9, whiten_grad=False,
              update_preconditioner_first=False,
              preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
              preconditioner_update_probability=1.0,
              scanned_layers=mask, share_fit_apply=share)
    if mesh is not None:
        if n_layer % mesh.shape["fsdp"] == 0:
            kw["stack_sharding"] = (mesh, "fsdp")
        kw["factor_sharding"] = (mesh, p_specs)
    return popt.kron_whiten(**kw)


def _time_opt(opt, params, state, steps, out_sh=None, mesh=None):
    grads = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.key(2), p.shape, p.dtype) * 1e-2,
        params)
    if out_sh is not None:
        grads = jax.tree_util.tree_map(
            lambda g, p: jax.device_put(g, p.sharding), grads, params)

    def opt_step(grads, state, params):
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    ctx = mesh if mesh is not None else contextlib.nullcontext()
    with ctx:
        jitted = (jax.jit(opt_step, out_shardings=out_sh) if out_sh
                  else jax.jit(opt_step))
        compiled = jitted.lower(grads, state, params).compile()
        for _ in range(2):
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


def main(steps=20):
    cfg = gpt2.tiny_config(n_layer=4, n_embd=128, n_head=4, block_size=64,
                           vocab_size=512, compute_dtype=jnp.float32)
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params)
    out = {"config": {"n_layer": cfg.n_layer, "n_embd": cfg.n_embd,
                      "update_probability": 1.0,
                      "recipe": "momentum whitening, unbiased order"},
           "note": ("the saving is the exprP apply chain, whose share of "
                    "the optimizer grows with factor width (it is "
                    "O(numel * sum n) vs the fit's O(n^3) tails) — the "
                    "width-512 replicated row shows the trend; the TPU "
                    "bench's psgd_p1.0_shared_ratio at GPT-2 124M widths "
                    "is the hardware datapoint"),
           "results": {}}

    # replicated, single logical tree — at the toy width and at 512 (the
    # exprP fraction, and hence the saving, grows with width)
    for tag, prm, msk in [("replicated", params, mask)]:
        for share in (False, True):
            opt = _opt(msk, share)
            state = opt.init(prm)
            name = "shared" if share else "unshared"
            out["results"][f"{tag}_{name}"] = _time_opt(
                opt, prm, state, steps)
            print(tag, name, out["results"][f"{tag}_{name}"], flush=True)

    cfg_w = gpt2.tiny_config(n_layer=2, n_embd=512, n_head=8, block_size=64,
                             vocab_size=512, compute_dtype=jnp.float32)
    params_w = gpt2.init_gpt2(jax.random.fold_in(key, 5), cfg_w)
    mask_w = gpt2.scanned_layers_mask(params_w)
    for share in (False, True):
        opt = _opt(mask_w, share)
        state = opt.init(params_w)
        name = "shared" if share else "unshared"
        out["results"]["replicated512_" + name] = _time_opt(
            opt, params_w, state, max(steps // 2, 5))
        print("replicated512", name, out["results"]["replicated512_" + name],
              flush=True)

    # production sharded layout (SCALING_r03 mesh): dp1 x fsdp4 x tp2
    mesh = make_mesh(8, axis_names=("dp", "fsdp", "tp"),
                     axis_sizes=(1, 4, 2))
    p_specs = gpt2_partition_specs()
    for share in (False, True):
        opt = _opt(mask, share, mesh=mesh, p_specs=p_specs,
                   n_layer=cfg.n_layer)
        state = opt.init(params)
        s_specs = psgd_state_specs(p_specs, state, scanned_layers=mask,
                                   stack_axis="fsdp",
                                   factor_sharding_params=params, mesh=mesh)
        pp = jax.device_put(params, named_shardings(mesh, p_specs))
        ss = jax.device_put(state, named_shardings(mesh, s_specs))
        out_sh = (named_shardings(mesh, p_specs),
                  named_shardings(mesh, s_specs))
        name = "shared" if share else "unshared"
        out["results"]["production_" + name] = _time_opt(
            opt, pp, ss, steps, out_sh=out_sh, mesh=mesh)
        print("production", name, out["results"]["production_" + name],
              flush=True)

    for layout in ("replicated", "replicated512", "production"):
        u = out["results"][layout + "_unshared"]["step_ms_median"]
        s = out["results"][layout + "_shared"]["step_ms_median"]
        out[layout + "_shared_over_unshared"] = round(s / u, 4)
        print(layout, "shared/unshared:", round(s / u, 4), flush=True)

    dest = pathlib.Path(__file__).resolve().parent.parent / "results" / \
        "share_fit_apply_cpu.json"
    dest.write_text(json.dumps(out, indent=1))
    print("wrote", dest)


if __name__ == "__main__":
    main()
