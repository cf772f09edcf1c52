"""Measured scaling evidence on the PRODUCTION sharded layout.

Runs the exact configuration of examples/train_gpt2_sharded.py
(gpt2_partition_specs + stack_sharding + factor_sharding) on the 8-device
virtual CPU mesh and records, for the FULL train step (fwd + bwd + PSGD
update + apply):

  * wall-clock step time, sharded optimizer vs replicated optimizer
    (same model/data sharding; only the Q-update placement differs);
  * per-device collective bytes/step from the compiled HLO, split by op;
  * per-device compiled FLOPs (the scaling diagnostic used by the tests);
  * an adamw reference program for context.

The replicated-vs-sharded wall-clock on a CPU mesh under-sells the sharded
path (XLA:CPU serializes collectives and its "MXU" is scalar code), so the
JSON also carries an ICI-time estimate of the communication at TPU link
bandwidth next to the MXU time the sharding saves — the quantity that
decides the layout on hardware.

Usage: python tools/measure_scaling.py [--steps 30] [--out SCALING_r04.json]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if not os.environ.get("PSGD_SCALING_TPU"):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("PSGD_SCALING_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as PS

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.parallel import (gpt2_partition_specs, make_mesh,
                                     named_shardings, psgd_state_specs)
from psgd_torch_tpu.utils.profiling import collective_bytes


def build(mesh, cfg, mask, p_specs, mode):
    """mode: 'sharded' (production layout), 'replicated' (Q work
    replicated), 'adamw' (reference), or the production-recipe variants
    'sharded_shared' (momentum whitening + share_fit_apply — the
    dryrun_multichip recipe) and 'sharded_pipelined' (momentum whitening +
    pipelined_fit: the fit and its collectives are data-independent of the
    backward pass)."""
    if mode == "adamw":
        return optax.adamw(1e-3, weight_decay=1e-2)
    stack_axis = ("fsdp" if cfg.n_layer % mesh.shape["fsdp"] == 0 else None)
    kw = dict(learning_rate=1e-3, momentum=0.9, preconditioner_max_skew=2.0,
              preconditioner_init_scale=1.0,
              preconditioner_update_probability=1.0,  # isolate the Q work
              scanned_layers=mask)
    if mode.startswith("sharded"):
        if stack_axis:
            kw["stack_sharding"] = (mesh, stack_axis)
        kw["factor_sharding"] = (mesh, p_specs)
    if mode == "sharded_shared":
        kw.update(whiten_grad=False, share_fit_apply=True,
                  update_preconditioner_first=False)
    elif mode == "sharded_pipelined":
        kw.update(whiten_grad=False, pipelined_fit=True)
    return popt.kron_whiten(**kw)


def _setup(mesh, cfg, mask, p_specs, mode):
    """Shared preamble: optimizer, placed params/state, state specs."""
    opt = build(mesh, cfg, mask, p_specs, mode)
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    state = opt.init(params)
    stack_axis = ("fsdp" if cfg.n_layer % mesh.shape["fsdp"] == 0 else None)
    if mode.startswith("sharded"):
        s_specs = psgd_state_specs(p_specs, state, scanned_layers=mask,
                                   stack_axis=stack_axis,
                                   factor_sharding_params=params, mesh=mesh)
    else:
        s_specs = psgd_state_specs(p_specs, state)
    params = jax.device_put(params, named_shardings(mesh, p_specs))
    state = jax.device_put(state, named_shardings(mesh, s_specs))
    return opt, key, params, state, s_specs


def _cost_summary(compiled, times):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "step_ms_median": 1e3 * statistics.median(times),
        "step_ms_best": 1e3 * min(times),
        "flops_per_device": float(ca.get("flops", float("nan"))),
        "collective_bytes_per_device": collective_bytes(compiled),
        "collective_bytes_by_op": collective_bytes(compiled, per_op=True),
    }


def measure(mesh, cfg, mask, p_specs, mode, steps, batch):
    opt, key, params, state, s_specs = _setup(mesh, cfg, mask, p_specs, mode)
    d_shard = NamedSharding(mesh, PS("dp", None))
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              batch, cfg.block_size,
                                              cfg.vocab_size)
    tokens = jax.device_put(tokens, d_shard)
    targets = jax.device_put(targets, d_shard)

    def train_step(params, state, tokens, targets):
        loss, grads = jax.value_and_grad(gpt2.loss_gpt2)(params, tokens,
                                                         targets, cfg)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    # pin output shardings to the input layout so the AOT-compiled step can
    # be fed its own outputs
    out_sh = (named_shardings(mesh, p_specs),
              named_shardings(mesh, s_specs),
              NamedSharding(mesh, PS()))
    with mesh:
        compiled = jax.jit(train_step, out_shardings=out_sh).lower(
            params, state, tokens, targets).compile()
        # warmup (2) + timed steps
        for _ in range(2):
            params, state, loss = compiled(params, state, tokens, targets)
            jax.block_until_ready(loss)
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            params, state, loss = compiled(params, state, tokens, targets)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)

    out = _cost_summary(compiled, times)
    out["final_loss"] = float(loss)
    return out


def measure_optimizer_only(mesh, cfg, mask, p_specs, mode, steps):
    """Wall-clock of the OPTIMIZER alone (PSGD fit + apply on fixed grads,
    no fwd/bwd): the work this library owns.  On the 1-core virtual mesh
    XLA:CPU executes every virtual device serially, so replicated Q work
    costs n_devices x one fit while the sharded path costs ~one fit +
    collectives -- the same arithmetic ratio real chips see in parallel."""
    opt, key, params, state, s_specs = _setup(mesh, cfg, mask, p_specs, mode)
    grads = jax.tree_util.tree_map(
        lambda p: jax.device_put(
            jax.random.normal(jax.random.fold_in(key, 2), p.shape, p.dtype)
            * 1e-2, p.sharding),
        params)

    def opt_step(grads, state, params):
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    out_sh = (named_shardings(mesh, p_specs), named_shardings(mesh, s_specs))
    with mesh:
        compiled = jax.jit(opt_step, out_shardings=out_sh).lower(
            grads, state, params).compile()
        for _ in range(2):
            params, state = compiled(grads, state, params)
            jax.block_until_ready(state)
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            params, state = compiled(grads, state, params)
            jax.block_until_ready(state)
            times.append(time.perf_counter() - t0)

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "step_ms_median": 1e3 * statistics.median(times),
        "step_ms_best": 1e3 * min(times),
        "flops_per_device": float(ca.get("flops", float("nan"))),
        "collective_bytes_per_device": collective_bytes(compiled),
        "collective_bytes_by_op": collective_bytes(compiled, per_op=True),
    }


def measure_abstract_124m(mesh, batch=2):
    """Compile-only (AOT, ShapeDtypeStruct args) measurement of the FULL
    124M train step on the production layout: per-device FLOPs + collective
    bytes, sharded vs replicated optimizer.  No 124M buffers materialize."""
    cfg = gpt2.gpt2_124m(compute_dtype=jnp.float32)
    shapes = jax.eval_shape(lambda k: gpt2.init_gpt2(k, cfg),
                            jax.random.key(0))
    mask = gpt2.scanned_layers_mask(shapes)
    p_specs = gpt2_partition_specs()

    def one(mode):
        opt = build(mesh, cfg, mask, p_specs, mode)
        state_shapes = jax.eval_shape(opt.init, shapes)
        stack_axis = ("fsdp" if cfg.n_layer % mesh.shape["fsdp"] == 0
                      else None)
        if mode == "sharded":
            s_specs = psgd_state_specs(p_specs, state_shapes,
                                       scanned_layers=mask,
                                       stack_axis=stack_axis,
                                       factor_sharding_params=shapes,
                                       mesh=mesh)
        else:
            s_specs = psgd_state_specs(p_specs, state_shapes)

        def ab(sds, spec):
            return jax.ShapeDtypeStruct(sds.shape, sds.dtype,
                                        sharding=NamedSharding(mesh, spec))

        p_abs = jax.tree_util.tree_map(ab, dict(shapes), dict(p_specs))
        s_abs = jax.tree_util.tree_map(ab, state_shapes, s_specs)
        d_abs = jax.ShapeDtypeStruct(
            (batch, cfg.block_size), jnp.int32,
            sharding=NamedSharding(mesh, PS("dp", None)))

        def train_step(params, state, tokens, targets):
            loss, grads = jax.value_and_grad(gpt2.loss_gpt2)(
                params, tokens, targets, cfg)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss

        with mesh:
            compiled = jax.jit(train_step).lower(p_abs, s_abs, d_abs,
                                                 d_abs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {
            "flops_per_device": float(ca.get("flops", float("nan"))),
            "collective_bytes_per_device": collective_bytes(compiled),
            "collective_bytes_by_op": collective_bytes(compiled,
                                                       per_op=True),
        }

    out = {}
    for mode in ("replicated", "sharded"):
        out[mode] = one(mode)
        print(f"124M {mode:10s}: "
              f"{out[mode]['flops_per_device']/1e9:8.2f} GFLOP/dev, "
              f"{out[mode]['collective_bytes_per_device']/1e6:7.2f} "
              f"MB coll/dev")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip-124m", action="store_true")
    ap.add_argument("--out", default="SCALING_r04.json")
    args = ap.parse_args()

    mesh = make_mesh()
    n_dev = mesh.devices.size
    # the exact model of examples/train_gpt2_sharded.py (fp32 on CPU)
    cfg = gpt2.tiny_config(n_layer=4, n_head=4, n_embd=128, block_size=64,
                           vocab_size=512, compute_dtype=jnp.float32)
    params = gpt2.init_gpt2(jax.random.key(0), cfg)
    mask = gpt2.scanned_layers_mask(params)
    p_specs = gpt2_partition_specs()

    results = {}
    for mode in ("adamw", "replicated", "sharded", "sharded_shared",
                 "sharded_pipelined"):
        results[mode] = measure(mesh, cfg, mask, p_specs, mode, args.steps,
                                args.batch)
        print(f"{mode:10s}: {results[mode]['step_ms_median']:8.2f} ms/step, "
              f"{results[mode]['flops_per_device']/1e9:7.2f} GFLOP/dev, "
              f"{results[mode]['collective_bytes_per_device']/1e6:6.2f} "
              f"MB coll/dev")

    opt_only = {"results": {}}
    for mode in ("replicated", "sharded"):
        opt_only["results"][mode] = measure_optimizer_only(
            mesh, cfg, mask, p_specs, mode, args.steps)
        r = opt_only["results"][mode]
        print(f"opt-only {mode:10s}: {r['step_ms_median']:8.2f} ms/step, "
              f"{r['flops_per_device']/1e9:7.2f} GFLOP/dev, "
              f"{r['collective_bytes_per_device']/1e6:6.2f} MB coll/dev")
    opt_only["sharded_vs_replicated"] = {
        "step_time_ratio": (opt_only["results"]["sharded"]["step_ms_median"]
                            / opt_only["results"]["replicated"]
                            ["step_ms_median"])}

    rep, sh = results["replicated"], results["sharded"]
    extra_bytes = (sh["collective_bytes_per_device"]
                   - rep["collective_bytes_per_device"])
    flops_saved = rep["flops_per_device"] - sh["flops_per_device"]
    # v5e ICI ~45 GB/s/link usable, v5p ~100 GB/s; MXU bf16 ~197 TFLOP/s
    # (v5e) at the bench's measured 63% MFU for this kernel mix
    ici_est_us = extra_bytes / 45e9 * 1e6
    mxu_est_us = flops_saved / (197e12 * 0.63) * 1e6
    out = {
        "mesh": dict(zip(mesh.axis_names,
                         (int(s) for s in mesh.devices.shape))),
        "n_devices": int(n_dev),
        "platform": jax.devices()[0].platform,
        "model": {"n_layer": cfg.n_layer, "n_embd": cfg.n_embd,
                  "block_size": cfg.block_size,
                  "vocab_size": cfg.vocab_size, "batch": args.batch},
        "update_probability": 1.0,
        "results": results,
        "optimizer_only": opt_only,
        "sharded_vs_replicated": {
            "step_time_ratio": (sh["step_ms_median"]
                                / rep["step_ms_median"]),
            "flops_ratio": (sh["flops_per_device"]
                            / rep["flops_per_device"]),
            "extra_collective_bytes_per_device": extra_bytes,
            "tpu_estimate_note": (
                "extra ICI time at 45 GB/s (v5e) vs MXU time saved at 63% "
                "MFU of 197 TFLOP/s bf16 — the on-hardware tradeoff the CPU "
                "wall-clock cannot show"),
            "ici_extra_us_est_v5e": ici_est_us,
            "mxu_saved_us_est_v5e": mxu_est_us,
        },
    }
    if not args.skip_124m:
        m124 = measure_abstract_124m(mesh)
        rep4, sh4 = m124["replicated"], m124["sharded"]
        extra4 = (sh4["collective_bytes_per_device"]
                  - rep4["collective_bytes_per_device"])
        saved4 = rep4["flops_per_device"] - sh4["flops_per_device"]
        m124["sharded_vs_replicated"] = {
            "flops_ratio": (sh4["flops_per_device"]
                            / rep4["flops_per_device"]),
            "extra_collective_bytes_per_device": extra4,
            "ici_extra_us_est_v5e": extra4 / 45e9 * 1e6,
            "mxu_saved_us_est_v5e": saved4 / (197e12 * 0.63) * 1e6,
        }
        out["gpt2_124m_compile_only"] = m124
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    print(f"sharded/replicated step time: "
          f"{out['sharded_vs_replicated']['step_time_ratio']:.3f}x; "
          f"extra collectives {extra_bytes/1e6:.2f} MB/dev/step; "
          f"est ICI {ici_est_us:.0f} us vs MXU saved {mxu_est_us:.0f} us")


if __name__ == "__main__":
    main()
