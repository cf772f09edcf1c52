"""Train GPT-2 with PSGD Kron momentum-whitening vs AdamW (parity with
reference misc/gpt2.py: same optimizer settings; the committed real-text
corpus data/corpus.txt.gz by default in place of WikiText-103 — no dataset
egress in this environment; --data synthetic for the mixing-rule stream).

Run:  python examples/train_gpt2.py [--steps N] [--model tiny|124m]
      [--opt psgd|adamw] [--data corpus|synthetic]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.utils import StepTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--model", default="tiny", choices=["tiny", "124m"])
    ap.add_argument("--opt", default="psgd", choices=["psgd", "adamw"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--data", default="corpus", choices=["corpus", "synthetic"])
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = (gpt2.gpt2_124m() if args.model == "124m" else
           gpt2.tiny_config(compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32))

    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    if args.data == "corpus":
        from psgd_torch_tpu.models import lm_data
        train_toks, _, vocab_used = lm_data.load_tokens(cfg.vocab_size)
        print(f"corpus: {train_toks.size/1e6:.2f}M tokens, vocab {vocab_used}")

        def batch_fn(k):
            return lm_data.corpus_batch(k, train_toks, args.batch,
                                        cfg.block_size)
    else:
        def batch_fn(k):
            return gpt2.synthetic_lm_batch(k, args.batch, cfg.block_size,
                                           cfg.vocab_size)
    print(f"{gpt2.count_params(params)/1e6:.1f}M params, "
          f"block {cfg.block_size}, device {jax.devices()[0]}")

    if args.opt == "adamw":
        # reference AdamW settings: lr 1e-3, wd 0.01 (misc/gpt2.py:400-407)
        opt = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.01)
    else:
        # reference PSGD settings: momentum whitening, lr = adam_lr / 4,
        # max_skew 2 (misc/gpt2.py:409-413)
        pdt = jnp.bfloat16 if on_tpu else None
        opt = popt.kron_whiten(
            learning_rate=1e-3 / 4, momentum=0.9, whiten_grad=False,
            preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
            # production recipe: anneal the update probability 1.0 -> 0.1
            # over the first half of training (misc/gpt2.py:440)
            preconditioner_update_probability=optax.linear_schedule(
                1.0, 0.1, max(args.steps // 2, 1)),
            weight_decay=0.01,
            preconditioner_dtype=pdt, momentum_dtype=pdt,
            norm_k=128 if on_tpu else 32,
            scanned_layers=gpt2.scanned_layers_mask(params))
    state = opt.init(params)

    loss_fn = lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg)

    @jax.jit
    def step(params, state, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    timer = StepTimer()
    timer.start()
    for i in range(args.steps):
        tokens, targets = batch_fn(jax.random.fold_in(key, 10_000 + i))
        params, state, loss = step(params, state, tokens, targets)
        lv = float(loss)  # force host sync so the timer is honest
        timer.mark()
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i:5d}  loss {lv:.4f}  "
                  f"({timer.steps_per_sec():.2f} steps/s)")


if __name__ == "__main__":
    main()
