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
    seed = jnp.stack([jnp.arange(B, dtype=jnp.int32),
                      jnp.arange(B, dtype=jnp.int32) + 101], -1)

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


@pytest.mark.parametrize("n", [128, 768, 1024, 1536])
def test_kernel_bound_tightness_and_symmetry_across_sizes(n):
    """VERDICT r1 item 9: pin the in-kernel norm bound's tightness and the
    in-kernel Procrustes rotation against the XLA path across factor sizes.
    With lips=0 and term2=0 the returned L equals the kernel's spectral-norm
    lower bound of term1, so the bound is directly observable.  This also
    validates the uniform in-kernel subspace noise: a valid lower bound
    needs no particular noise distribution, and tightness stays within the
    same envelope as the XLA path's Gaussian subspace."""
    from psgd_torch_tpu.ops.pallas_kernels import fused_ns_update
    from psgd_torch_tpu.ops.linalg import norm_lower_bound_spd

    key = jax.random.key(n)
    a = jax.random.normal(key, (n, n), jnp.float32) / n ** 0.5
    term1 = a @ a.T + 0.1 * jnp.eye(n)
    true_norm = float(jnp.linalg.eigvalsh(term1)[-1])

    q = jnp.eye(n) * 0.9 + 0.05 * jax.random.normal(jax.random.key(1), (n, n))
    lips = jnp.zeros((1,), jnp.float32)
    term2 = jnp.zeros((1,), jnp.float32)
    qp, lp = jax.jit(lambda t, qq: fused_ns_update(
        t[None], qq[None], lips, term2,
        jnp.asarray([[n, n + 7]], jnp.int32),
        0.1, 0.9, k=128))(term1, q)
    bound = float(lp[0])
    xla_bound = float(jax.jit(lambda t: norm_lower_bound_spd(
        t, jax.random.key(3), k=128))(term1))
    # lower bound, and as tight as the XLA (Gaussian-subspace) bound
    assert bound <= true_norm * 1.001, (bound, true_norm)
    assert bound > 0.5 * true_norm, (bound, true_norm)
    assert bound > 0.9 * xla_bound, (bound, xla_bound)
    # the Procrustes rotation symmetrizes Q within the same envelope as
    # the XLA path run on the identical inputs
    from psgd_torch_tpu.ops.linalg import procrustes_step2
    lip = jnp.maximum(0.0, lp[0])
    q1 = q - (0.1 / lip) * (term1 @ q)
    qx = jax.jit(lambda x: procrustes_step2(x, jax.random.key(5),
                                            norm_k=128))(q1)
    asym = lambda m: float(jnp.max(jnp.abs(m.T - m)) / jnp.max(jnp.abs(m)))
    a_kernel, a_xla, a_in = (asym(qp[0].astype(jnp.float32)), asym(qx),
                             asym(q))
    assert a_kernel < a_in, (a_kernel, a_in)
    assert a_kernel < 1.3 * a_xla + 1e-3, (a_kernel, a_xla)


def test_split_kernel_matches_xla_path():
    """The two-kernel split (n > 1536: bound+step kernel, then procrustes
    kernel) must agree with the XLA path like the monolith does."""
    from psgd_torch_tpu.ops.pallas_kernels import (fused_ns_update,
                                                   ns_update_supported,
                                                   _NS_SINGLE_MAX)
    from psgd_torch_tpu.ops.linalg import norm_lower_bound_spd, procrustes_step2

    N = 2048
    assert N > _NS_SINGLE_MAX and ns_update_supported(N, jnp.bfloat16)
    B = 2
    key = jax.random.key(0)
    a = jax.random.normal(key, (B, N, N), jnp.float32) / N ** 0.5
    term1 = (jnp.einsum("bij,bkj->bik", a, a)
             + 0.5 * jnp.eye(N)).astype(jnp.bfloat16)
    q = (jnp.eye(N) * 0.7 + 0.02 * jax.random.normal(
        jax.random.key(1), (B, N, N))).astype(jnp.bfloat16)
    lips = jnp.zeros((B,), jnp.float32)
    term2 = jnp.full((B,), 3.0, jnp.float32)
    seed = jnp.stack([jnp.arange(B, dtype=jnp.int32),
                      jnp.arange(B, dtype=jnp.int32) + 11], -1)
    qp, lp = jax.jit(lambda *x: fused_ns_update(*x, 0.1, 0.9, k=128))(
        term1, q, lips, term2, seed)

    def one(t1, qq, l, k):
        ell = norm_lower_bound_spd(t1, k, k=128) + 3.0
        l2 = jnp.maximum(0.9 * l + 0.1 * ell, ell)
        q1 = qq - (0.1 / l2) * (t1 @ qq - 3.0 * qq)
        return procrustes_step2(q1, jax.random.fold_in(k, 1),
                                norm_k=128), l2

    # XLA reference on the f32 view of the same bf16 inputs
    qx, lx = jax.jit(jax.vmap(one))(
        term1.astype(jnp.float32), q.astype(jnp.float32), lips,
        jax.random.split(jax.random.key(7), B))
    rel = float(jnp.max(jnp.abs(qp.astype(jnp.float32) - qx))
                / jnp.max(jnp.abs(qx)))
    assert rel < 2e-2, rel  # bf16 storage: ~1e-2 per-op rounding envelope
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=0.06)


def test_fallback_above_kernel_envelope_matches_semantics():
    """Factors above the kernel envelope (monolith to 1536, two-kernel
    split to 2048 bf16, tiled six-kernel path to 4096 bf16 / 3072 f32)
    fall back to the XLA path automatically
    (precond.kron._fused_ns_enabled); the update must still run and descend
    toward the whitening fixed point."""
    from psgd_torch_tpu.precond import kron
    from psgd_torch_tpu.ops.pallas_kernels import ns_update_supported

    assert ns_update_supported(1280, jnp.float32)   # r2 envelope was 1024
    assert ns_update_supported(2048, jnp.bfloat16)  # split kernel (bf16)
    assert ns_update_supported(4096, jnp.bfloat16)  # tiled path (r3)
    assert ns_update_supported(3072, jnp.float32)   # tiled path (r3)
    assert not ns_update_supported(4224, jnp.bfloat16)
    n = 3200  # multiple of 128, above the f32 tiled envelope
    # (8, n) leaf: each gradient sample carries rank-8 information for the
    # big factor, so the fit is determined within a few hundred steps
    state, plan = kron.init_kron((8, n), 1.0, float("inf"), float("inf"),
                                 "Q0.5EQ1.5", jnp.float32)
    assert not plan.is_diag[1]
    h_col = 10.0 ** jnp.linspace(-0.5, 0.5, n)
    root = jax.random.key(0)

    def step(state, i):
        k = jax.random.fold_in(root, i)
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (8, n), jnp.float32)
        lr = (1.0 - i / 900) / 2.0  # annealed like the verification scripts
        return kron.update_kron_whiten(state, plan, h_col * v, ku,
                                       lr=lr, damping=0.0), None

    state, _ = jax.lax.scan(step, state, jnp.arange(900))
    v = jax.random.normal(jax.random.fold_in(root, 999), (8, n))
    pg = kron.precond_grad(state, plan, h_col * v)
    rel = float(jnp.linalg.norm(pg - v) / jnp.linalg.norm(v))
    # each (8, n) gradient sample carries rank-8 information for the n-wide
    # factor, so at n=3200 the 900-step fit lands near rel ~ 0.37 (vs ~0.3
    # at the old n=2304); the point here is that the fallback runs and
    # descends from rel ~ 1, not a tight fixed-point test (those are the
    # n=128 kernel/CPU tests)
    assert rel < 0.45, rel


@pytest.mark.parametrize("N,dt", [(2048, jnp.float32), (3072, jnp.float32),
                                  (3072, jnp.bfloat16), (4096, jnp.bfloat16)])
def test_tiled_kernel_matches_xla_path(N, dt):
    """The six-kernel tiled path (2048 < n <= 4096 bf16 / 1536 < n <= 3072
    f32) must agree with the XLA path like the monolith and split do."""
    from psgd_torch_tpu.ops.pallas_kernels import (fused_ns_update,
                                                   ns_update_supported)
    from psgd_torch_tpu.ops.linalg import norm_lower_bound_spd, procrustes_step2

    assert ns_update_supported(N, dt)
    B = 2
    key = jax.random.key(0)
    a = jax.random.normal(key, (B, N, N), jnp.float32) / N ** 0.5
    term1 = (jnp.einsum("bij,bkj->bik", a, a) + 0.5 * jnp.eye(N)).astype(dt)
    q = (jnp.eye(N) * 0.7 + 0.02 * jax.random.normal(
        jax.random.key(1), (B, N, N))).astype(dt)
    lips = jnp.zeros((B,), jnp.float32)
    term2 = jnp.full((B,), 3.0, jnp.float32)
    seed = jnp.stack([jnp.arange(B, dtype=jnp.int32),
                      jnp.arange(B, dtype=jnp.int32) + 11], -1)
    qp, lp = jax.jit(lambda *x: fused_ns_update(*x, 0.1, 0.9, k=128))(
        term1, q, lips, term2, seed)

    def one(t1, qq, l, k):
        ell = norm_lower_bound_spd(t1, k, k=128) + 3.0
        l2 = jnp.maximum(0.9 * l + 0.1 * ell, ell)
        q1 = qq - (0.1 / l2) * (t1 @ qq - 3.0 * qq)
        return procrustes_step2(q1, jax.random.fold_in(k, 1),
                                norm_k=128), l2

    qx, lx = jax.jit(jax.vmap(one))(
        term1.astype(jnp.float32), q.astype(jnp.float32), lips,
        jax.random.split(jax.random.key(7), B))
    rel = float(jnp.max(jnp.abs(qp.astype(jnp.float32) - qx))
                / jnp.max(jnp.abs(qx)))
    tol = 2e-2 if jnp.dtype(dt) == jnp.dtype(jnp.bfloat16) else 5e-3
    assert rel < tol, rel
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=0.06)


def test_unit_noise_kernel():
    """Hardware-PRNG noise kernel: zero mean, unit variance, per-seed
    deterministic and distinct, row-blocked path for embedding-sized
    draws."""
    from psgd_torch_tpu.ops.pallas_kernels import unit_noise

    seeds = jnp.stack([jnp.arange(12, dtype=jnp.int32),
                       jnp.arange(12, dtype=jnp.int32) * 7 + 3], -1)
    out = jax.jit(lambda s: unit_noise(s, 768, 768, jnp.bfloat16))(seeds)
    o32 = out.astype(jnp.float32)
    assert abs(float(o32.mean())) < 0.01
    assert abs(float(o32.var()) - 1.0) < 0.02
    out2 = jax.jit(lambda s: unit_noise(s, 768, 768, jnp.bfloat16))(seeds)
    assert bool(jnp.all(out == out2))
    assert bool(jnp.any(out[0] != out[1]))
    big = jax.jit(lambda s: unit_noise(s, 50304, 768, jnp.bfloat16))(seeds[:1])
    b32 = big.astype(jnp.float32)
    assert abs(float(b32.mean())) < 0.01
    assert abs(float(b32.var()) - 1.0) < 0.02
    # per-row-block distinctness across the blocked grid
    assert bool(jnp.any(big[0, :8] != big[0, 40000:40008]))


@pytest.mark.parametrize("n,path", [(1536, "split"), (2048, "tiled")])
def test_f32_wide_paths_match_xla(n, path):
    """The f32 dispatch above the monolith (probed per width on v5e:
    monolith <= 1280, split <= 1536, tiled above) must agree with the XLA
    path.  f32 1536 used to route to the monolith, whose f32 working set
    does not compile at that width — this pins the corrected routing."""
    from psgd_torch_tpu.ops.pallas_kernels import (
        fused_ns_update, ns_update_supported, _NS_SINGLE_MAX_F32,
        _NS_SPLIT_MAX_F32)
    from psgd_torch_tpu.ops.linalg import norm_lower_bound_spd, procrustes_step2

    assert n > _NS_SINGLE_MAX_F32 and ns_update_supported(n, jnp.float32)
    if path == "split":
        assert n <= _NS_SPLIT_MAX_F32
    else:
        assert n > _NS_SPLIT_MAX_F32
    B = 2
    key = jax.random.key(n)
    a = jax.random.normal(key, (B, n, n), jnp.float32) / n ** 0.5
    term1 = jnp.einsum("bij,bkj->bik", a, a) + 0.5 * jnp.eye(n)
    q = jnp.eye(n) * 0.7 + 0.02 * jax.random.normal(
        jax.random.key(1), (B, n, n))
    lips = jnp.zeros((B,), jnp.float32)
    term2 = jnp.full((B,), 3.0, jnp.float32)
    seed = jnp.stack([jnp.arange(B, dtype=jnp.int32),
                      jnp.arange(B, dtype=jnp.int32) + 11], -1)
    qp, lp = jax.jit(lambda *x: fused_ns_update(*x, 0.1, 0.9, k=32))(
        term1, q, lips, term2, seed)

    def one(t1, qq, l, k):
        ell = norm_lower_bound_spd(t1, k, k=32) + 3.0
        l2 = jnp.maximum(0.9 * l + 0.1 * ell, ell)
        q1 = qq - (0.1 / l2) * (t1 @ qq - 3.0 * qq)
        return procrustes_step2(q1, jax.random.fold_in(k, 1),
                                norm_k=32), l2

    qx, lx = jax.jit(jax.vmap(one))(
        term1, q, lips, jax.random.split(jax.random.key(7), B))
    rel = float(jnp.max(jnp.abs(qp - qx)) / jnp.max(jnp.abs(qx)))
    assert rel < 5e-3, rel
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=0.06)
