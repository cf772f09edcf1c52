"""Fused Pallas NS-update kernel tests (run on TPU only; the CPU suite
exercises the identical math through the XLA fallback path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu = any(d.platform == "tpu" for d in jax.devices())
pytestmark = pytest.mark.skipif(not tpu, reason="pallas kernel needs TPU")


def test_fused_ns_matches_xla_path():
    from psgd_torch_tpu.ops.pallas_kernels import fused_ns_update
    from psgd_torch_tpu.ops.linalg import norm_lower_bound_spd, procrustes_step2

    B, N = 4, 256
    key = jax.random.key(0)
    a = jax.random.normal(key, (B, N, N), jnp.float32)
    term1 = jnp.einsum("bij,bkj->bik", a, a) / N + 0.5 * jnp.eye(N)
    q = jnp.eye(N) * 0.7 + 0.02 * jax.random.normal(jax.random.key(1), (B, N, N))
    lips = jnp.zeros((B,), jnp.float32)
    term2 = jnp.full((B,), 3.0, jnp.float32)
    seed = jnp.arange(B, dtype=jnp.int32)

    qp, lp = jax.jit(lambda *x: fused_ns_update(*x, 0.1, 0.9))(
        term1, q, lips, term2, seed)

    def one(t1, qq, l, k):
        ell = norm_lower_bound_spd(t1, k) + 3.0
        l2 = jnp.maximum(0.9 * l + 0.1 * ell, ell)
        q1 = qq - (0.1 / l2) * (t1 @ qq - 3.0 * qq)
        return procrustes_step2(q1, jax.random.fold_in(k, 1)), l2

    qx, lx = jax.jit(jax.vmap(one))(term1, q, lips,
                                    jax.random.split(jax.random.key(7), B))
    # different PRNG streams in the norm bounds: compare within bound noise
    rel = float(jnp.max(jnp.abs(qp - qx)) / jnp.max(jnp.abs(qx)))
    assert rel < 5e-3, rel
    # L depends on the stochastic norm bound; different PRNG streams give
    # a few percent of spread
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=0.06)


def test_kron_update_same_fixed_point_with_and_without_kernel():
    from psgd_torch_tpu.precond import kron

    n = 128
    a = jax.random.normal(jax.random.key(2), (n, n), jnp.float32)
    q0, _ = jnp.linalg.qr(a)
    h = q0 @ jnp.diag(10.0 ** jnp.linspace(-0.7, 0.7, n)) @ q0.T

    def run(enabled):
        kron.set_fused_ns(enabled)
        try:
            state, plan = kron.init_kron((n,), 1.0, float("inf"), float("inf"),
                                         "Q0.5EQ1.5", jnp.float32)
            root = jax.random.key(0)

            def step(state, i):
                k = jax.random.fold_in(root, i)
                kv, ku = jax.random.split(k)
                v = jax.random.normal(kv, (n,), jnp.float32)
                lr = (1.0 - i / 1200) / 2.0
                return kron.update_kron_whiten(state, plan, h @ v, ku,
                                               lr=lr, damping=0.0), None

            state, _ = jax.lax.scan(step, state, jnp.arange(1200))
            errs = []
            for t in range(8):
                v = jax.random.normal(jax.random.fold_in(root, 9000 + t), (n,))
                pg = kron.precond_grad(state, plan, h @ v)
                errs.append(float(jnp.sum((pg - v) ** 2) / jnp.sum(v ** 2)))
            return (sum(errs) / len(errs)) ** 0.5
        finally:
            kron.set_fused_ns(None)

    e_on, e_off = run(True), run(False)
    assert e_on < 0.35 and e_off < 0.35
    assert abs(e_on - e_off) < 0.15
