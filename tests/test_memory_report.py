"""state_memory_report: byte accounting grouped by role, honoring shardings."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PS

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.utils import state_memory_report
from psgd_torch_tpu.parallel import make_mesh, named_shardings, psgd_state_specs


def test_memory_report_groups_and_total():
    params = {"w": jnp.zeros((32, 16)), "b": jnp.zeros((16,))}
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0,
                                   momentum=0.9)
    st = tx.init(params)
    rep = state_memory_report(st)
    itemsize = jnp.dtype(params["w"].dtype).itemsize  # 8 under suite x64
    # momentum mirrors the params
    assert rep["momentum"] == (32 * 16 + 16) * itemsize
    # Q for w: dense 32x32 under default max_skew=1.0? dim0: 32^2=1024 > 512
    # -> diag; dim1: 256 < 512*1 -> dense 16x16. b: diag 16. All fp32.
    assert rep["q"] > 0 and rep["lips"] > 0
    assert rep["total"] == sum(v for k, v in rep.items() if k != "total")


def test_memory_report_per_device_sharded():
    mesh = make_mesh(8, axis_names=("fsdp",))
    params = {"blocks": jnp.zeros((8, 32, 32))}
    mask = {"blocks": True}
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0,
                                   preconditioner_max_size=64,
                                   preconditioner_max_skew=float("inf"),
                                   scanned_layers=mask,
                                   stack_sharding=(mesh, "fsdp"))
    st = tx.init(params)
    specs = psgd_state_specs({"blocks": PS(None, None, None)}, st,
                             scanned_layers=mask, stack_axis="fsdp")
    st = jax.device_put(st, named_shardings(mesh, specs))
    full = state_memory_report(st, per_device=False)
    per_dev = state_memory_report(st, per_device=True)
    # the layer-stacked Q/L are sharded 8-way over fsdp
    assert per_dev["q"] * 8 == full["q"]
    assert per_dev["lips"] * 8 == full["lips"]


def test_memory_report_lra():
    params = {"w": jnp.zeros((64,))}
    tx = popt.scale_by_lra_whiten(rank_of_approximation=4,
                                  preconditioner_init_scale=1.0)
    st = tx.init(params)
    rep = state_memory_report(st)
    itemsize = jnp.dtype(params["w"].dtype).itemsize
    # U + V: 2 * (64, 4), d: (64, 1)
    assert rep["q"] == (2 * 64 * 4 + 64) * itemsize
    assert rep["lips"] >= 3 * 4  # three scalars, >= fp32
