"""Affine-wrapped layers driven by the legacy Affine preconditioner.

Reference parity for the two affine-wrapping demos:
  * misc/affine_wrapping_F_conv2d.py:141 — conv/linear layers expressed as
    affine maps [vectorized patch, 1] @ W so one kron(Q2, Q1) preconditioner
    covers weight+bias per layer; LeNet5 classification, SGD vs PSGD-Affine.
  * misc/affine_wrapping_VF_rnn_tanh.py:186-189 — a tanh RNN's input+recur+
    bias as one affine param; delayed-XOR with psgd.Affine.

The repo's models already use the [W; b] affine convention
(models/lenet5.py, models/rnn.py), so "wrapping" is the natural state here;
this example drives ``optim.legacy_transforms.affine`` (whitening mode, one
kron(Q2, Q1) per affine matrix) end-to-end on both models.

  python examples/affine_wrapped_layers.py --model lenet5
  python examples/affine_wrapped_layers.py --model rnn
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from psgd_torch_tpu.models import lenet5, rnn
from psgd_torch_tpu.optim import legacy_transforms as lt
from psgd_torch_tpu.optim.hvp import make_hvp_fn


def run_lenet5(iters: int, batch: int):
    key = jax.random.key(0)
    params0 = lenet5.init_lenet5(key)

    def make_step(opt):
        @jax.jit
        def step(params, state, images, labels):
            loss, grads = jax.value_and_grad(lenet5.loss_lenet5)(
                params, images, labels)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss
        return step

    results = {}
    for name, opt in [
        ("sgd", optax.sgd(0.1, momentum=0.9)),
        # one kron(Q2, Q1) affine preconditioner per [W; b] layer matrix
        # (reference misc/affine_wrapping_F_conv2d.py:141 drives KronWhiten;
        # the Affine class itself is the :186 RNN demo — both covered here)
        ("psgd-affine", lt.affine(learning_rate=0.05,
                                  preconditioner_type="whitening",
                                  lr_preconditioner=0.1,
                                  grad_clip_max_norm=10.0)),
    ]:
        params, state = params0, opt.init(params0)
        step = make_step(opt)
        last = None
        for i in range(iters):
            images, labels = lenet5.synthetic_mnist(
                jax.random.fold_in(key, 100 + i), batch)
            params, state, loss = step(params, state, images, labels)
            last = float(loss)
            if i % 20 == 0:
                print(f"[lenet5/{name}] iter {i}: loss {last:.4f}")
        results[name] = last
        print(f"[lenet5/{name}] final loss {last:.4f}")
    return results


def run_rnn(iters: int, batch: int, seq_len: int):
    key = jax.random.key(1)
    params0 = rnn.init_rnn(key)

    def loss_fn(params, xs, target):
        return rnn.xor_loss(rnn.apply_rnn(params, xs), target)

    # reference settings (affine_wrapping_VF_rnn_tanh.py:153,186-189):
    # NEWTON-type Affine (the class default), lr_params=0.01,
    # grad_clip_max_norm=1.0, batch 128, seq 16, up to 100k iterations.
    # The whitening variant plateaus at the XOR wall; curvature breaks it.
    opt = lt.affine(learning_rate=0.01, preconditioner_type="Newton",
                    lr_preconditioner=0.01, grad_clip_max_norm=1.0)
    params, state = params0, opt.init(params0)

    @jax.jit
    def step(params, state, xs, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, target)
        updates, state = opt.update(
            grads, state, params,
            hvp_fn=make_hvp_fn(loss_fn, xs, target))
        return optax.apply_updates(params, updates), state, loss

    lv = float("nan")
    for i in range(iters):
        xs, target = rnn.xor_batch(jax.random.fold_in(key, 10 + i),
                                   batch, seq_len)
        params, state, loss = step(params, state, xs, target)
        lv = float(loss)
        if i % 200 == 0:
            print(f"[rnn/psgd-affine] iter {i}: loss {lv:.4f}")
        if lv < 0.1:
            print(f"[rnn/psgd-affine] SOLVED: loss {lv:.4f} < 0.1 at iter {i}")
            return lv
    print(f"[rnn/psgd-affine] not solved in {iters} iters (loss {lv:.4f})")
    return lv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["lenet5", "rnn"], default="lenet5")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq_len", type=int, default=16)
    args = ap.parse_args()
    if args.model == "lenet5":
        run_lenet5(args.iters, min(args.batch, 64))
    else:
        # the reference demo budgets up to 100k iterations for this task
        run_rnn(max(args.iters, 20000), args.batch, args.seq_len)


if __name__ == "__main__":
    main()
