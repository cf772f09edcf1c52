"""Ablate the non-matmul overhead of the 124M Q-update+apply on the TPU.

profile_q.py shows ~1.4 ms/step of the 6.8 ms Q-update unaccounted for by
the exprP/term1/NS phases.  This script times the full transform update
under targeted ablations to attribute it:

  base      : the bench configuration (bf16 Q, clip (2, 10), fp32 grads in)
  noclip    : grad_clip_max_amps = (inf, inf)   -> cost of the amp clip
  bf16grads : grads pre-cast to bf16            -> cost of the fp32->bf16 cast
  both      : both ablations together

Timing: slope between two fori_loop lengths (memory: axon ~25 ms dispatch
latency; everything loop-carried so nothing DCEs).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.optim import transforms as T


def cksum(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def slope_time(make_loop, args, n1=8, n2=64):
    f1, f2 = jax.jit(make_loop(n1)), jax.jit(make_loop(n2))
    float(f1(*args))
    float(f2(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(*args)); tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    return max(best, 0.0)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    cfg = gpt2.gpt2_124m(compute_dtype=jnp.bfloat16)
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params)
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              4, cfg.block_size,
                                              cfg.vocab_size)
    grads = jax.jit(jax.grad(lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg)))(
        params, tokens, targets)
    grads_bf16 = jax.tree_util.tree_map(
        lambda g: g.astype(jnp.bfloat16), grads)

    def tx_of(clip):
        return T.scale_by_kron_whiten(
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            preconditioner_dtype=jnp.bfloat16, norm_k=128,
            grad_clip_max_amps=clip, scanned_layers=mask)

    def mk_full(tx):
        def make(n):
            def run(g_in, state_in):
                def body(_, carry):
                    s, acc = carry
                    u, s = tx.update(g_in, s)
                    return s, acc + cksum(u)
                s, acc = jax.lax.fori_loop(
                    0, n, body, (state_in, jnp.zeros((), jnp.float32)))
                return acc + cksum(s.precond)
            return run
        return make

    inf = float("inf")
    cases = [
        ("base", tx_of((2.0, 10.0)), grads),
        ("noclip", tx_of((inf, inf)), grads),
        ("bf16grads", tx_of((2.0, 10.0)), grads_bf16),
        ("both", tx_of((inf, inf)), grads_bf16),
    ]
    base = None
    for name, tx, g in cases:
        t = slope_time(mk_full(tx), (g, tx.init(params)))
        if base is None:
            base = t
        print(f"{name:10s}: {t*1e6:7.0f} us/step  "
              f"(delta vs base {1e6*(t-base):+6.0f} us)", flush=True)


if __name__ == "__main__":
    main()
