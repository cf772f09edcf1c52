"""Measure the dense-factor NS-tail update across factor widths on TPU.

The fused Pallas kernel (ops.pallas_kernels.fused_ns_update) holds ~7 n x n
fp32 intermediates in VMEM, which caps n.  This tool measures, per width n:

  * the fused kernel (where it compiles),
  * the XLA fallback path (norm bound + L + step + procrustes_step2),

with slope timing (two fori_loop lengths; axon has ~25 ms fixed call
latency) and DCE-proof loop-carried checksums, and reports us + MFU.  It
decides the kernel envelope (`ns_update_supported`) and documents whether
the fallback is acceptable at LLaMA-class widths (VERDICT r2 item 2).

Usage: PSGD_BENCH=1 python tools/bench_ns_widths.py [--sizes 768,1024,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# persistent compile cache (same location as the test suite's): the sweep is
# dominated by cold XLA compiles otherwise
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from psgd_torch_tpu.ops.linalg import norm_lower_bound_spd, procrustes_step2

PEAK_BF16 = 197e12  # v5e MXU
PEAK_F32 = PEAK_BF16 / 2


def log(*a):
    print(*a, flush=True)


def slope_time(make_loop, args, n1=4, n2=24):
    f1, f2 = jax.jit(make_loop(n1)), jax.jit(make_loop(n2))
    float(f1(*args))
    float(f2(*args))
    best = float("inf")
    for rep in range(6):
        t0 = time.perf_counter(); float(f1(*args)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(*args)); tb = time.perf_counter() - t0
        slope = (tb - ta) / (n2 - n1)
        if slope > 0:
            best = min(best, slope)
        if rep >= 2 and best < float("inf"):
            break
    if best == float("inf"):
        raise RuntimeError("slope timing unreliable (non-positive slopes)")
    return best


def ns_flops(b, n, k):
    # 3 full matmuls (step, rq, rrq) + ~8 thin k x n x n (bounds)
    return b * (3 * 2 * n ** 3 + 8 * 2 * k * n * n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="768,1024,1280,1536,2048,3072,4096")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--json", default=None,
                    help="write per-width results to this JSON file")
    ap.add_argument("--force-path", default="auto",
                    choices=["auto", "split", "tiled"],
                    help="override the kernel-path dispatch above the "
                         "monolith width (for split-vs-tiled comparisons)")
    args = ap.parse_args()
    if args.force_path != "auto":
        import psgd_torch_tpu.ops.pallas_kernels as pk
        lim = 10 ** 9 if args.force_path == "split" else 0
        pk._NS_SINGLE_MAX = pk._NS_SINGLE_MAX_F32 = 0
        pk._NS_SPLIT_MAX = pk._NS_SPLIT_MAX_F32 = lim
    records = []
    dt = jnp.dtype(args.dtype)
    norm_k = 128 if dt == jnp.dtype(jnp.bfloat16) else 32
    peak = PEAK_BF16 if dt == jnp.dtype(jnp.bfloat16) else PEAK_F32
    dev = jax.devices()[0]
    log(f"device: {dev}, dtype {dt}, norm_k {norm_k}")

    for n in [int(s) for s in args.sizes.split(",")]:
        b = max(1, (12 * 768) // n)  # keep total work meaningful
        key = jax.random.key(n)
        a = jax.random.normal(key, (b, n, n), jnp.float32) / n ** 0.5
        term1 = (jnp.einsum("bij,bkj->bik", a, a)
                 + 0.1 * jnp.eye(n)).astype(dt)
        q = (jnp.eye(n) * 0.9 + 0.02 * jax.random.normal(
            jax.random.key(1), (b, n, n))).astype(dt)
        lips = jnp.ones((b,), jnp.float32)
        term2 = jnp.full((b,), float(n), jnp.float32)
        flops = ns_flops(b, n, norm_k)

        def xla_one(t1, qq, l, kk):
            ell = norm_lower_bound_spd(t1, kk, k=norm_k) + float(n)
            l2 = jnp.maximum(0.9 * l + 0.1 * ell, ell)
            q1 = qq - (0.1 / l2).astype(qq.dtype) * (
                t1 @ qq - jnp.asarray(float(n), qq.dtype) * qq)
            return procrustes_step2(q1, jax.random.fold_in(kk, 1),
                                    norm_k=norm_k), l2

        def mk_xla(iters):
            def run(t1, qq, l):
                def body(i, carry):
                    acc, = carry
                    t1p = t1 * (1.0 + 0.0 * acc).astype(t1.dtype)
                    keys = jax.vmap(lambda j: jax.random.fold_in(
                        jax.random.key(5), j + i))(jnp.arange(b))
                    nq, nl = jax.vmap(xla_one)(t1p, qq, l, keys)
                    return (acc + jnp.sum(nq.astype(jnp.float32))
                            + jnp.sum(nl),)
                acc, = jax.lax.fori_loop(0, iters, body,
                                         (jnp.zeros((), jnp.float32),))
                return acc
            return run

        t_xla = slope_time(mk_xla, (term1, q, lips))
        log(f"n={n:5d} b={b:2d}  xla   : {t_xla*1e6:9.0f} us  "
            f"{flops/1e9:7.1f} GF  MFU {flops/t_xla/peak*100:5.1f}%")
        rec = {"n": n, "b": b, "dtype": str(dt), "gflop": round(flops / 1e9, 1),
               "xla_us": round(t_xla * 1e6),
               "xla_mfu": round(flops / t_xla / peak, 4)}
        records.append(rec)

        from psgd_torch_tpu.ops.pallas_kernels import fused_ns_update
        seeds = jnp.stack([jnp.arange(b, dtype=jnp.int32),
                           jnp.arange(b, dtype=jnp.int32) + 7], -1)

        def mk_pl(iters):
            def run(t1, qq, l):
                def body(i, carry):
                    acc, = carry
                    t1p = t1 * (1.0 + 0.0 * acc).astype(t1.dtype)
                    nq, nl = fused_ns_update(t1p, qq, l, term2,
                                             seeds + i, 0.1, 0.9, k=norm_k)
                    return (acc + jnp.sum(nq.astype(jnp.float32))
                            + jnp.sum(nl),)
                acc, = jax.lax.fori_loop(0, iters, body,
                                         (jnp.zeros((), jnp.float32),))
                return acc
            return run

        try:
            t_pl = slope_time(mk_pl, (term1, q, lips))
            log(f"n={n:5d} b={b:2d}  pallas: {t_pl*1e6:9.0f} us  "
                f"{flops/1e9:7.1f} GF  MFU {flops/t_pl/peak*100:5.1f}%  "
                f"(xla/pallas {t_xla/t_pl:.2f}x)")
            rec.update(pallas_us=round(t_pl * 1e6),
                       pallas_mfu=round(flops / t_pl / peak, 4),
                       speedup=round(t_xla / t_pl, 2))
        except Exception as e:
            log(f"n={n:5d} b={b:2d}  pallas: does not compile "
                f"({type(e).__name__}: {str(e)[:120]})")
            rec.update(pallas_us=None)

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "norm_k": norm_k,
                       "peak_flops": peak, "results": records}, f, indent=1)
        log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
