"""Capture a jax.profiler device trace of one Q-update step (if the axon
runtime supports it) and of a 8-iteration loop."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.optim import transforms as T


def main():
    cfg = gpt2.gpt2_124m(compute_dtype=jnp.bfloat16)
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params)
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              4, cfg.block_size, cfg.vocab_size)
    grads = jax.jit(jax.grad(lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg)))(
        params, tokens, targets)
    tx = T.scale_by_kron_whiten(preconditioner_max_skew=2.0,
                                preconditioner_init_scale=1.0,
                                preconditioner_dtype=jnp.bfloat16, norm_k=128,
                                scanned_layers=mask)
    state = tx.init(params)

    @jax.jit
    def loop(grads, state):
        def body(_, carry):
            s, acc = carry
            u, s = tx.update(grads, s)
            acc = acc + sum(jnp.sum(x.astype(jnp.float32))
                            for x in jax.tree_util.tree_leaves(u))
            return s, acc
        s, acc = jax.lax.fori_loop(0, 8, body, (state, jnp.zeros((), jnp.float32)))
        return acc + sum(jnp.sum(x.astype(jnp.float32))
                         for x in jax.tree_util.tree_leaves(s.precond))

    print("warm:", float(loop(grads, state)))
    with jax.profiler.trace("/tmp/qtrace"):
        print("traced:", float(loop(grads, state)))
    print("done")


if __name__ == "__main__":
    main()
