"""Multi-process (multi-host-style) test: jax.distributed over 2 CPU
processes x 4 simulated devices, exercising make_multihost_mesh's
n_proc > 1 branch (parallel/mesh.py) end-to-end with a PSGD train step.

The reference's only multi-host story is torchrun + NCCL broadcast RNG sync
(wrapped_as_torch_optimizer_for_ddp.py:179-213); here the hybrid DCN x ICI
mesh is built by the library and consistency is by SPMD construction."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    import optax
    sys.path.insert(0, sys.argv[4])
    from jax.sharding import NamedSharding, PartitionSpec as PS
    import psgd_torch_tpu.optim as popt
    from psgd_torch_tpu.parallel import (make_multihost_mesh,
                                         named_shardings, psgd_state_specs)

    mesh = make_multihost_mesh(axis_names=("dcn", "fsdp", "tp"))
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    assert shape == {"dcn": 2, "fsdp": 2, "tp": 2}, shape
    # the leading (DCN) axis must span processes; trailing axes stay local
    pids = np.vectorize(lambda d: d.process_index)(mesh.devices)
    assert (pids[0] == 0).all() and (pids[1] == 1).all(), pids

    h1 = jnp.diag(10.0 ** jnp.linspace(-1, 1, 8))
    wstar = jnp.ones((8, 4))

    def loss_fn(p, b):
        d = p["w"] - wstar
        return 0.5 * jnp.sum(d * (h1 @ d)) * jnp.mean(b)

    specs = {"w": PS("fsdp", "tp")}
    opt = popt.kron_whiten(learning_rate=0.05, preconditioner_init_scale=1.0)
    params = {"w": jnp.zeros((8, 4))}
    state = opt.init(params)
    params = jax.device_put(params, named_shardings(mesh, specs))
    state = jax.device_put(state, named_shardings(
        mesh, psgd_state_specs(specs, state)))
    batch = jax.device_put(jnp.ones((4, 2)),
                           NamedSharding(mesh, PS("dcn", None)))

    @jax.jit
    def step(p, s, b):
        g = jax.grad(loss_fn)(p, b)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    with mesh:
        for _ in range(5):
            params, state = step(params, state, batch)
            jax.block_until_ready(params)
        l = float(jax.jit(loss_fn)(params, batch))
    print(f"RESULT {l:.9f}", flush=True)

    # --- DCN cleanliness (BASELINE.md >= 85% 1-chip -> 2-hosts proxy):
    # compile the PRODUCTION sharded optimizer update (ZeRO stack-sharded Q
    # over fsdp + dim-sharded embedding factors) on this hybrid mesh and
    # assert every Q-fit collective rides only the intra-process (ICI)
    # axes — zero bytes cross the dcn (process) boundary.
    from psgd_torch_tpu.models import gpt2
    from psgd_torch_tpu.parallel import gpt2_partition_specs, psgd_state_specs
    from psgd_torch_tpu.utils import collective_boundary_bytes

    cfg = gpt2.tiny_config(n_layer=4, n_head=4, n_embd=128, block_size=64,
                           vocab_size=512, compute_dtype=jnp.float32)
    gp = gpt2.init_gpt2(jax.random.key(0), cfg)
    mask = gpt2.scanned_layers_mask(gp)
    p_specs = gpt2_partition_specs()
    popt2 = popt.kron_whiten(
        learning_rate=1e-3, momentum=0.9, whiten_grad=False,
        update_preconditioner_first=False, share_fit_apply=True,
        preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
        scanned_layers=mask, stack_sharding=(mesh, "fsdp"),
        factor_sharding=(mesh, p_specs))
    st2 = popt2.init(gp)
    s_specs2 = psgd_state_specs(p_specs, st2, scanned_layers=mask,
                                stack_axis="fsdp",
                                factor_sharding_params=gp, mesh=mesh)
    gp = jax.device_put(gp, named_shardings(mesh, p_specs))
    st2 = jax.device_put(st2, named_shardings(mesh, s_specs2))
    with mesh:
        compiled = jax.jit(lambda g, s, p: popt2.update(g, s, p)).lower(
            gp, st2, gp).compile()
    group_of = [d.process_index for d in mesh.devices.flatten()]
    per_op = collective_boundary_bytes(compiled, group_of, per_op=True)
    cross = sum(v["cross"] for v in per_op.values())
    intra = sum(v["intra"] for v in per_op.values())
    assert cross == 0, (
        f"Q-fit collectives cross the DCN boundary: {per_op}")
    print(f"DCN_CLEAN intra={intra} cross={cross} per_op={per_op}",
          flush=True)
""")


def test_two_process_hybrid_mesh_psgd_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port), repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = [line.split()[1] for out in outs for line in out.splitlines()
              if line.startswith("RESULT")]
    assert len(losses) == 2
    assert losses[0] == losses[1], f"replica losses differ: {losses}"
    # both workers compiled the production sharded Q update and proved zero
    # bytes of optimizer collectives cross the DCN (process) boundary
    clean = [line for out in outs for line in out.splitlines()
             if line.startswith("DCN_CLEAN")]
    assert len(clean) == 2, f"missing DCN cleanliness proof:\n{outs[0][-2000:]}"


def test_collective_boundary_bytes_attribution():
    """Unit test of the HLO boundary attribution on one process: a psum
    over the leading (process-spanning) mesh axis is cross-boundary, one
    over a trailing axis is intra, and the production sharded Q update is
    DCN-clean under a simulated 2-host split."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

    from psgd_torch_tpu.utils import collective_boundary_bytes

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("dcn", "fsdp", "tp"))
    # simulated boundary: first half of the flattened devices = "host 0"
    group_of = [0] * 4 + [1] * 4

    def compile_psum(axis, spec):
        x = jax.device_put(jnp.ones((8, 8)), NamedSharding(mesh, spec))
        f = jax.jit(jax.shard_map(
            lambda v: jax.lax.psum(v, axis), mesh=mesh, in_specs=spec,
            out_specs=spec))
        return f.lower(x).compile()

    cross = collective_boundary_bytes(
        compile_psum("dcn", PS("dcn", None)), group_of)
    assert cross["cross"] > 0 and cross["intra"] == 0, cross
    intra = collective_boundary_bytes(
        compile_psum("tp", PS("tp", None)), group_of)
    assert intra["intra"] > 0 and intra["cross"] == 0, intra

    import optax  # noqa: F401
    import psgd_torch_tpu.optim as popt
    from psgd_torch_tpu.models import gpt2
    from psgd_torch_tpu.parallel import (gpt2_partition_specs,
                                         named_shardings, psgd_state_specs)

    cfg = gpt2.tiny_config(n_layer=4, n_head=4, n_embd=128, block_size=64,
                           vocab_size=512, compute_dtype=jnp.float32)
    params = gpt2.init_gpt2(jax.random.key(0), cfg)
    mask = gpt2.scanned_layers_mask(params)
    p_specs = gpt2_partition_specs()
    opt = popt.kron_whiten(
        learning_rate=1e-3, momentum=0.9, whiten_grad=False,
        update_preconditioner_first=False, share_fit_apply=True,
        preconditioner_max_skew=2.0, preconditioner_init_scale=1.0,
        scanned_layers=mask, stack_sharding=(mesh, "fsdp"),
        factor_sharding=(mesh, p_specs))
    state = opt.init(params)
    s_specs = psgd_state_specs(p_specs, state, scanned_layers=mask,
                               stack_axis="fsdp",
                               factor_sharding_params=params, mesh=mesh)
    params = jax.device_put(params, named_shardings(mesh, p_specs))
    state = jax.device_put(state, named_shardings(mesh, s_specs))
    with mesh:
        compiled = jax.jit(lambda g, s, p: opt.update(g, s, p)).lower(
            params, state, params).compile()
    per_op = collective_boundary_bytes(compiled, group_of, per_op=True)
    total_cross = sum(v["cross"] for v in per_op.values())
    total_intra = sum(v["intra"] for v in per_op.values())
    assert total_cross == 0, f"Q-fit collectives cross DCN: {per_op}"
    assert total_intra > 0  # the sharded fit genuinely communicates on ICI
