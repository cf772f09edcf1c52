"""Fully sharded GPT-2 training: the complete distributed PSGD recipe.

Demonstrates every distributed piece working together on one program:
  * dp/fsdp/tp device mesh (`parallel.make_mesh`; swap in
    `make_multihost_mesh` + jax.distributed.initialize() on a pod),
  * canonical parameter PartitionSpecs (`parallel.gpt2_partition_specs`),
  * ZeRO-style preconditioner partitioning over the layer stack
    (`stack_sharding` on the transform + `stack_axis` on the state specs),
  * orbax checkpointing of the pure-pytree optimizer state.

Runs anywhere: on a CPU host it simulates an 8-device mesh.
  python examples/train_gpt2_sharded.py [--steps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__" and not os.environ.get("JAX_PLATFORMS"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
# (must happen before any backend initialization)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import optax

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.parallel import (gpt2_partition_specs, make_mesh,
                                     named_shardings, sharding_recipe)
from jax.sharding import NamedSharding, PartitionSpec as PS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ckpt_dir", default=None,
                    help="optional orbax checkpoint directory")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint from --ckpt_dir and "
                         "continue training from it")
    ap.add_argument("--share-fit-apply", action="store_true",
                    help="reuse the Q fit's Pg product as the update on fit "
                         "steps (one exprP chain per step; needs momentum "
                         "whitening + unbiased ordering, switched on here)")
    args = ap.parse_args()

    mesh = make_mesh()
    print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = gpt2.tiny_config(
        n_layer=4, n_head=4, n_embd=128, block_size=64, vocab_size=512,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params)

    # sharding_recipe resolves the whole layout from one declaration:
    # ZeRO-style layer-stack Q sharding (auto-picks a dividing mesh axis)
    # plus dim-sharded embedding Q updates, with the state placement
    # guaranteed to match the transform's compute layout.
    p_specs = gpt2_partition_specs()
    recipe = sharding_recipe(mesh, p_specs, params, scanned_layers=mask)
    share_kw = (dict(share_fit_apply=True, whiten_grad=False,
                     update_preconditioner_first=False)
                if args.share_fit_apply else {})
    opt = popt.kron_whiten(
        learning_rate=1e-3, momentum=0.9, preconditioner_max_skew=2.0,
        preconditioner_init_scale=1.0,
        preconditioner_update_probability=optax.linear_schedule(
            1.0, 0.1, max(args.steps // 2, 1)),
        **share_kw, **recipe.transform_kwargs)
    state = opt.init(params)

    params, state = recipe.place(params, state)
    s_specs = recipe.state_specs(state)
    data_shard = NamedSharding(mesh, PS("dp", None))

    start_step = 0
    if args.resume:
        from psgd_torch_tpu.utils import checkpoint as ckpt
        step = ckpt.latest_step(args.ckpt_dir)
        if step is None:
            print(f"no checkpoint under {args.ckpt_dir}; starting fresh")
        else:
            template = {"step": 0, "params": params, "opt_state": state,
                        "extra": {}}
            restored = ckpt.restore_checkpoint(args.ckpt_dir, template, step)
            # restore into the live shardings (fresh-process recipe)
            params = jax.device_put(restored["params"],
                                    named_shardings(mesh, p_specs))
            state = jax.device_put(restored["opt_state"],
                                   named_shardings(mesh, s_specs))
            start_step = int(restored["step"])
            print(f"resumed from step {start_step}")

    @jax.jit
    def train_step(params, state, tokens, targets):
        loss, grads = jax.value_and_grad(gpt2.loss_gpt2)(params, tokens,
                                                         targets, cfg)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    end_step = start_step + args.steps
    with mesh:
        for i in range(start_step, end_step):
            tokens, targets = gpt2.synthetic_lm_batch(
                jax.random.fold_in(key, 100 + i), args.batch, cfg.block_size,
                cfg.vocab_size)
            tokens = jax.device_put(tokens, data_shard)
            targets = jax.device_put(targets, data_shard)
            params, state, loss = train_step(params, state, tokens, targets)
            if i % 10 == 0 or i == end_step - 1:
                print(f"step {i:4d}  loss {float(loss):.4f}")

    if args.ckpt_dir:
        from psgd_torch_tpu.utils import checkpoint as ckpt
        ckpt.save_checkpoint(args.ckpt_dir, end_step, params, state)
        print(f"checkpoint saved to {args.ckpt_dir}/step_{end_step}")


if __name__ == "__main__":
    main()
