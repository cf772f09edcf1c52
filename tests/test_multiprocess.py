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
