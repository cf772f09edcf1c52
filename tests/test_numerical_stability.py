"""Numerical-stability study: PSGD vs BFGS vs closed-form (E[hh^T])^(-1/2).

Port of the reference's flagship robustness claim
(/root/reference/misc/psgd_numerical_stability.py:19-237, README.md:71-79):

  (a) clean Hvp:   PSGD converges linearly to the optimal P; the closed-form
      running-average solution only converges sublinearly.
  (b) noisy Hvp:   BFGS diverges; PSGD stays stable and accurate.
  (c) time-varying H (rank-1 growth per step): PSGD tracks the moving
      optimum better than BFGS and the closed form.

Methods under test:
  * PSGD on GL(n,R): legacy.update_newton_inv (kept-inverse Woodbury path,
    reference update_precond_newton_math_ with invQ, :1178-1202)
  * PSGD on the triangular group: legacy.update_newton_tri (invQ=None path,
    :1204-1213)
  * closed form P = (EMA[h h^T])^(-1/2) via eigh
  * BFGS with the h -> -h flip guarding P > 0

Fitting loss: ||Q^T Q H' - I||_F (or ||P H' - I||_F), H' the effective
Hessian sqrt(H^2 + eps^2 I) under noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgd_torch_tpu.precond import legacy as legacy_p

import pytest as _pytest

pytestmark = _pytest.mark.slow

N = 30
DT = jnp.float64


def _chain_h(n):
    h = np.eye(n)
    for i in range(n):
        h[max(i - 1, 0), i] = 0.5
        h[i, max(i - 1, 0)] = 0.5
    h[0, 0] = 1.0
    return jnp.asarray(h, DT)


def _effective_h(h, eps):
    """H' = sqrt(H H^T + eps^2 I): the stationary point of whitening-style
    fitting under Hvp noise of scale eps (reference :36-40)."""
    if eps == 0:
        return h
    lam, u = jnp.linalg.eigh(h @ h.T + eps**2 * jnp.eye(h.shape[0], dtype=DT))
    return (u * jnp.sqrt(lam)) @ u.T


def _vh_stream(key, h, eps, n_iters):
    kv, kn = jax.random.split(key)
    vs = jax.random.normal(kv, (n_iters, N, 1), DT)
    hs = jnp.einsum("ij,tjk->tik", h, vs)
    if eps:
        hs = hs + eps * jax.random.normal(kn, (n_iters, N, 1), DT)
    return vs, hs


def _run_gl(vs, hs, h_eff, lr):
    st0 = legacy_p.init_newton_inv(N, 1.0, DT)
    eye = jnp.eye(N, dtype=DT)

    def step(st, vh):
        v, hv = vh
        loss = jnp.linalg.norm(st.q.T @ st.q @ h_eff - eye)
        st = legacy_p.update_newton_inv(st, v, hv, lr=lr)
        return st, loss

    _, losses = jax.lax.scan(step, st0, (vs, hs))
    return losses


def _run_tri(vs, hs, h_eff, lr):
    q0 = jnp.eye(N, dtype=DT)
    eye = jnp.eye(N, dtype=DT)

    def step(q, vh):
        v, hv = vh
        loss = jnp.linalg.norm(q.T @ q @ h_eff - eye)
        q = legacy_p.update_newton_tri(q, v, hv, lr=lr)
        return q, loss

    _, losses = jax.lax.scan(step, q0, (vs, hs))
    return losses


def _run_closed_form(vs, hs, h_eff):
    eye = jnp.eye(N, dtype=DT)

    def step(carry, vh):
        hh, i = carry
        _, hv = vh
        lam, u = jnp.linalg.eigh(hh)
        p = (u * jax.lax.rsqrt(lam)) @ u.T
        loss = jnp.linalg.norm(p @ h_eff - eye)
        beta = jnp.minimum((i + 1.0) / (i + 2.0), 0.999)
        hh = beta * hh + (1.0 - beta) * (hv @ hv.T)
        return (hh, i + 1.0), loss

    _, losses = jax.lax.scan(step, (eye, jnp.zeros((), DT)), (vs, hs))
    return losses


def _run_bfgs(vs, hs, h_eff):
    eye = jnp.eye(N, dtype=DT)

    def step(p, vh):
        v, hv = vh
        loss = jnp.linalg.norm(p @ h_eff - eye)
        hv = jnp.where((v.T @ hv) < 0, -hv, hv)  # keep P > 0 (reference :107)
        vth = (v.T @ hv)[0, 0]
        p = (p
             + (vth + (hv.T @ p @ hv)[0, 0]) * (v @ v.T) / vth**2
             - (p @ hv @ v.T + v @ hv.T @ p) / vth)
        return p, loss

    _, losses = jax.lax.scan(step, eye, (vs, hs))
    return losses


@pytest.mark.parametrize("group", ["gl", "tri"])
def test_clean_hvp_psgd_beats_closed_form(group):
    """(a) With clean Hvps, PSGD converges to the optimal P far below the
    sublinear closed-form solution (reference panel (a))."""
    n_iters = 20000  # (calibrated: 0.002 @ 20k, 6e-10 @ 60k -> linear rate)
    h = _chain_h(N)
    vs, hs = _vh_stream(jax.random.key(0), h, 0.0, n_iters)
    run = _run_gl if group == "gl" else _run_tri
    lr = 1.0 if group == "gl" else 2.0  # reference :45-46, :74
    psgd = jax.jit(lambda: run(vs, hs, h, lr))()
    closed = jax.jit(lambda: _run_closed_form(vs, hs, h))()
    assert float(psgd[-1]) < 1e-2, f"PSGD-{group} did not converge: {psgd[-1]}"
    assert float(psgd[-1]) < 0.05 * float(closed[-1]), (
        f"PSGD-{group} {psgd[-1]} not well below closed form {closed[-1]}")
    # linear vs sublinear: PSGD's error keeps shrinking geometrically while
    # the closed form's O(1/t) tail barely moves
    assert float(psgd[-1]) < 0.1 * float(psgd[n_iters // 2])
    assert float(closed[-1]) > 0.5 * float(closed[n_iters // 2])


def test_noisy_hvp_bfgs_diverges_psgd_stable():
    """(b) With noisy Hvps (eps = 1e-2), BFGS diverges while PSGD remains
    stable near the effective optimum (reference panel (b))."""
    n_iters = 20000
    eps = 1e-2
    h = _chain_h(N)
    h_eff = _effective_h(h, eps)
    vs, hs = _vh_stream(jax.random.key(1), h, eps, n_iters)
    psgd = jax.jit(lambda: _run_gl(vs, hs, h_eff, 0.1))()
    bfgs = jax.jit(lambda: _run_bfgs(vs, hs, h_eff))()
    loss0 = float(psgd[0])
    assert float(psgd[-1]) < 0.2 * loss0, (
        f"PSGD not stable under noise: {psgd[-1]} vs initial {loss0}")
    assert float(bfgs[-1]) > 4.0 * float(psgd[-1]), (
        f"expected BFGS divergence: bfgs {bfgs[-1]} vs psgd {psgd[-1]}")
    # BFGS error grows with iterations; PSGD's shrinks
    assert float(bfgs[-1]) > 2.0 * float(bfgs[n_iters // 10])


def test_time_varying_h_psgd_tracks_best():
    """(c) H grows by a rank-1 term every step; PSGD with a constant step
    tracks the moving optimum better than BFGS and the closed form
    (reference panel (c), the loglog plot)."""
    n_iters = 3000
    eye = jnp.eye(N, dtype=DT)
    key = jax.random.key(2)
    us = jax.random.uniform(jax.random.fold_in(key, 0), (n_iters, N, 1), DT)
    vs = jax.random.normal(jax.random.fold_in(key, 1), (n_iters, N, 1), DT)

    def h_stream():
        """(H_t, v_t, h_t = H_t v_t) with H_t = H_{t-1} + u_t u_t^T."""
        def step(h, uv):
            u, v = uv
            h = h + u @ u.T
            return h, (h, v, h @ v)
        _, (h_ts, v_ts, hv_ts) = jax.lax.scan(
            step, jnp.ones((N, N), DT) / 4, (us, vs))
        return h_ts, v_ts, hv_ts

    h_ts, v_ts, hv_ts = jax.jit(h_stream)()

    def run_psgd():
        st0 = legacy_p.init_newton_inv(N, 1.0, DT)

        def step(st, thv):
            h_t, v, hv = thv
            loss = jnp.linalg.norm(st.q.T @ st.q @ h_t - eye)
            st = legacy_p.update_newton_inv(st, v, hv, lr=1.0)
            return st, loss

        _, losses = jax.lax.scan(step, st0, (h_ts, v_ts, hv_ts))
        return losses

    def run_closed():
        def step(carry, thv):
            hh, i = carry
            h_t, _, hv = thv
            lam, u = jnp.linalg.eigh(hh)
            p = (u * jax.lax.rsqrt(lam)) @ u.T
            loss = jnp.linalg.norm(p @ h_t - eye)
            beta = jnp.minimum((i + 1.0) / (i + 2.0), 0.999)
            hh = beta * hh + (1.0 - beta) * (hv @ hv.T)
            return (hh, i + 1.0), loss

        _, losses = jax.lax.scan(step, (eye, jnp.zeros((), DT)),
                                 (h_ts, v_ts, hv_ts))
        return losses

    def run_bfgs():
        def step(p, thv):
            h_t, v, hv = thv
            loss = jnp.linalg.norm(p @ h_t - eye)
            hv = jnp.where((v.T @ hv) < 0, -hv, hv)
            vth = (v.T @ hv)[0, 0]
            p = (p
                 + (vth + (hv.T @ p @ hv)[0, 0]) * (v @ v.T) / vth**2
                 - (p @ hv @ v.T + v @ hv.T @ p) / vth)
            return p, loss

        _, losses = jax.lax.scan(step, eye, (h_ts, v_ts, hv_ts))
        return losses

    psgd = jax.jit(run_psgd)()
    closed = jax.jit(run_closed)()
    bfgs = jax.jit(run_bfgs)()
    # tail-mean tracking error: PSGD below both alternatives
    tail = slice(-n_iters // 10, None)
    p_err = float(jnp.mean(psgd[tail]))
    assert p_err < float(jnp.mean(closed[tail])), (psgd[-1], closed[-1])
    assert p_err < float(jnp.mean(bfgs[tail])), (psgd[-1], bfgs[-1])
