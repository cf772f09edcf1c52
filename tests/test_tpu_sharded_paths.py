"""TPU-only smoke of the sharded optimizer paths on a real chip.

bench.py exercises the stacked path; these pin the factor-sharded and
per-shard paths (shard_map + in-kernel hardware-PRNG noise + bf16 Q) on
the actual TPU backend, where Pallas/Mosaic lowering differs from the CPU
interpreter used by the main suite.  1-device mesh: collectives degenerate
but all plumbing (shard_map, pallas_call inside it, state specs) is real.
"""

import jax
import jax.numpy as jnp
import pytest

tpu = any(d.platform == "tpu" for d in jax.devices())
pytestmark = [pytest.mark.skipif(not tpu, reason="needs a real TPU"),
              pytest.mark.slow]

from jax.sharding import NamedSharding, PartitionSpec as PS  # noqa: E402

import psgd_torch_tpu.optim as popt  # noqa: E402
from psgd_torch_tpu.parallel import (make_mesh, named_shardings,  # noqa: E402
                                     psgd_state_specs)
from psgd_torch_tpu.parallel.sharded import (  # noqa: E402
    scale_by_per_shard_kron_whiten)


def _problem():
    t = jax.random.normal(jax.random.key(0), (256, 128), jnp.float32)
    scale = jnp.linspace(0.1, 10.0, 128)

    def loss(p):
        d = p["emb"] - t
        return 0.5 * jnp.sum(d * d * scale)

    return loss


def test_factor_sharding_on_tpu():
    mesh = make_mesh(1, axis_names=("fsdp",))
    specs = {"emb": PS("fsdp", None)}
    loss = _problem()
    params = {"emb": jnp.zeros((256, 128))}
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0,
                                   preconditioner_dtype=jnp.bfloat16,
                                   factor_sharding=(mesh, specs))
    state = tx.init(params)
    state = jax.device_put(state, named_shardings(
        mesh, psgd_state_specs(specs, state, factor_sharding_params=params,
                               mesh=mesh)))
    params = jax.device_put(params, named_shardings(mesh, specs))

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = tx.update(g, s)
        return jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, u), s

    l0 = float(loss(params))
    with mesh:
        for _ in range(60):
            params, state = step(params, state)
    assert float(loss(params)) < 0.05 * l0


def test_per_shard_on_tpu():
    mesh = make_mesh(1, axis_names=("fsdp",))
    specs = {"emb": PS("fsdp", None)}
    loss = _problem()
    tx = scale_by_per_shard_kron_whiten(mesh, specs,
                                        preconditioner_init_scale=1.0,
                                        momentum=0.9,
                                        preconditioner_dtype=jnp.bfloat16)
    p = {"emb": jax.device_put(jnp.zeros((256, 128)),
                               NamedSharding(mesh, specs["emb"]))}
    s = tx.init(p)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = tx.update(g, s)
        return jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, u), s

    l0 = float(loss(p))
    with mesh:
        for _ in range(60):
            p, s = step(p, s)
    assert float(loss(p)) < 0.05 * l0
