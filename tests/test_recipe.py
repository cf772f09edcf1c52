"""sharding_recipe: one declaration must reproduce the manually wired
production layout (transform kwargs + state placement) exactly."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as PS

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.parallel import (ShardingRecipe, gpt2_partition_specs,
                                     make_mesh, named_shardings,
                                     psgd_state_specs, sharding_recipe)

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 simulated devices")]


def _setup(n_layer=4):
    mesh = make_mesh()
    cfg = gpt2.tiny_config(n_layer=n_layer, n_head=2, n_embd=16,
                           block_size=8, vocab_size=64,
                           compute_dtype=jnp.float32)
    params = gpt2.init_gpt2(jax.random.key(1), cfg)
    mask = gpt2.scanned_layers_mask(params)
    return mesh, cfg, params, mask


def test_recipe_matches_manual_configuration():
    """The recipe's two sides must equal the hand-wired production config:
    same transform kwargs, identical state specs pytree."""
    mesh, cfg, params, mask = _setup()
    p_specs = gpt2_partition_specs()
    rec = sharding_recipe(mesh, p_specs, params, scanned_layers=mask)

    assert rec.stack_axis == "fsdp"        # largest dividing axis (4 | 4)
    assert rec.factor_sharded              # wte/wpe dims are sharded
    kw = rec.transform_kwargs
    assert kw["stack_sharding"] == (mesh, "fsdp")
    assert kw["factor_sharding"] == (mesh, p_specs)
    assert kw["scanned_layers"] is mask
    assert kw["dq"] == "Q0.5EQ1.5"

    opt = popt.kron_whiten(learning_rate=1e-3,
                           preconditioner_init_scale=1.0, **kw)
    state = opt.init(params)
    manual = psgd_state_specs(p_specs, state, scanned_layers=mask,
                              stack_axis="fsdp",
                              factor_sharding_params=params, mesh=mesh)
    got = rec.state_specs(state)
    man_l, man_d = jax.tree_util.tree_flatten(manual)
    got_l, got_d = jax.tree_util.tree_flatten(got)
    assert man_d == got_d
    assert man_l == got_l


def test_recipe_place_and_train_step():
    """place() puts params/state on their shardings and the resulting
    sharded train step runs with decreasing loss."""
    mesh, cfg, params, mask = _setup()
    p_specs = gpt2_partition_specs()
    rec = sharding_recipe(mesh, p_specs, params, scanned_layers=mask)
    opt = popt.kron_whiten(learning_rate=1e-3,
                           preconditioner_init_scale=1.0,
                           preconditioner_update_probability=1.0,
                           **rec.transform_kwargs)
    state = opt.init(params)
    params, state = rec.place(params, state)
    assert params["wte"].sharding.spec == p_specs["wte"]

    tok, tgt = gpt2.synthetic_lm_batch(jax.random.key(2), 8, cfg.block_size,
                                       cfg.vocab_size)
    tok = jax.device_put(tok, NamedSharding(mesh, PS("dp", None)))
    tgt = jax.device_put(tgt, NamedSharding(mesh, PS("dp", None)))

    @jax.jit
    def tstep(p, s, a, b):
        l, g = jax.value_and_grad(gpt2.loss_gpt2)(p, a, b, cfg)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    losses = []
    with mesh:
        for _ in range(3):
            params, state, l = tstep(params, state, tok, tgt)
            losses.append(float(l))
    assert losses[-1] < losses[0] and np.isfinite(losses).all()


def test_auto_stack_axis_falls_back_with_warning():
    """No mesh axis divides a 3-layer stack: stack sharding disabled, user
    warned (Q stays replicated — correct, just not partitioned)."""
    mesh, cfg, params, mask = _setup(n_layer=3)
    with pytest.warns(UserWarning, match="stack sharding disabled"):
        rec = sharding_recipe(mesh, gpt2_partition_specs(), params,
                              scanned_layers=mask)
    assert rec.stack_axis is None
    assert "stack_sharding" not in rec.transform_kwargs


def test_explicit_indivisible_axis_raises():
    mesh, cfg, params, mask = _setup(n_layer=3)
    with pytest.raises(ValueError, match="does not divide"):
        sharding_recipe(mesh, gpt2_partition_specs(), params,
                        scanned_layers=mask, stack_axis="fsdp")


def test_unknown_axis_raises():
    mesh, cfg, params, mask = _setup()
    with pytest.raises(ValueError, match="not in mesh axes"):
        sharding_recipe(mesh, gpt2_partition_specs(), params,
                        scanned_layers=mask, stack_axis="nope")


def test_non_shardable_dq_keeps_embedding_state_replicated():
    """For dQ geometries outside DIM_SHARDABLE_DQS the transform does not
    route embeddings through the dim-sharded path — the recipe must keep
    that state replicated so GSPMD is not forced to reshard Q every step
    (the misconfiguration psgd_state_specs warns about)."""
    mesh, cfg, params, mask = _setup()
    rec = sharding_recipe(mesh, gpt2_partition_specs(), params,
                          scanned_layers=mask, dq="EQ")
    assert not rec.factor_sharded
    assert "factor_sharding" not in rec.transform_kwargs
    opt = popt.kron_whiten(learning_rate=1e-3, **rec.transform_kwargs)
    state = opt.init(params)
    specs = rec.state_specs(state)
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_flatten_with_path(params)[0]]
    wte_idx = next(i for i, p in enumerate(paths) if "wte" in p)
    kron_specs = specs[0] if isinstance(specs, tuple) else specs
    wte_q = kron_specs.precond[wte_idx].q
    assert all(s == PS(*([None] * len(s))) or s == PS() for s in wte_q)


def test_mismatched_trees_raise():
    mesh, cfg, params, mask = _setup()
    with pytest.raises(ValueError, match="must match leaf-for-leaf"):
        sharding_recipe(mesh, {"only": PS()}, params, scanned_layers=mask)
