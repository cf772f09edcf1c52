"""Method-comparison tests: the reference's claims that closed-form
Kronecker methods are biased while PSGD's stochastic fitting is unbiased.

1. Shampoo bias (misc/psgd_shampoo_caspr.py): for an *exactly Kronecker* H,
   Shampoo's closed form P = kron(Rl^-1/4, Rr^-1/4) plateaus at
   ||PH - I||_F > 0, while the PSGD affine preconditioner drives it toward 0.
2. Adafactor bias (misc/psgd_vs_adafactor.py): when the Hessian does not
   have Adafactor's assumed rank-one structure, Adafactor's preconditioned
   gradient variance stays far from 1; PSGD kron(diag, diag) (the drop-v
   affine whitening update) normalizes it to ~1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from psgd_torch_tpu.precond import affine

import pytest as _pytest

pytestmark = _pytest.mark.slow

N = 10
N_ITERS = 3000


def _tridiag_kron_h():
    """The reference's kron(T, T) Hessian with T tridiagonal
    (misc/psgd_shampoo_caspr.py:13-18)."""
    t = np.eye(N)
    for i in range(N):
        t[max(i - 1, 0), i] = 0.5
        t[i, max(i - 1, 0)] = 0.5
    return jnp.asarray(t, jnp.float64)


def _h_apply(hl, hr, v):
    """h = reshape(H @ vec(v)) for H = kron(hl, hr) acting on (N, N) mats.

    The reference flattens v.T (column-major vec); acting with kron(T, T)
    on that is hl @ v @ hr.T in matrix form for symmetric factors."""
    return hl @ v @ hr.T


def test_shampoo_plateaus_psgd_converges():
    hl = _tridiag_kron_h()
    hr = _tridiag_kron_h()
    h_full = jnp.kron(hl, hr)
    eye = jnp.eye(N * N, dtype=jnp.float64)
    key = jax.random.key(0)

    # --- Shampoo closed form: Rl/Rr EMAs of h h^T / h^T h, P = R^-1/4
    rl = jnp.eye(N, dtype=jnp.float64)
    rr = jnp.eye(N, dtype=jnp.float64)

    @jax.jit
    def shampoo_step(carry, k):
        rl, rr, i = carry
        v = jax.random.normal(k, (N, N), jnp.float64)
        hv = _h_apply(hl, hr, v)
        beta = jnp.minimum((i + 1.0) / (i + 2.0), 0.999)
        rl = beta * rl + (1 - beta) * (hv @ hv.T)
        rr = beta * rr + (1 - beta) * (hv.T @ hv)
        return (rl, rr, i + 1.0), None

    (rl, rr, _), _ = jax.lax.scan(
        shampoo_step, (rl, rr, 0.0), jax.random.split(key, N_ITERS))

    def inv_quarter(r):
        evals, evecs = jnp.linalg.eigh(r)
        return evecs @ jnp.diag(evals ** -0.25) @ evecs.T

    p_shampoo = jnp.kron(inv_quarter(rl), inv_quarter(rr))
    err_shampoo = float(jnp.linalg.norm(p_shampoo @ h_full - eye))

    # --- PSGD affine with exact (v, h) pairs
    state = affine.AffineState(ql=jnp.eye(N, dtype=jnp.float64),
                               qr=jnp.eye(N, dtype=jnp.float64))

    @jax.jit
    def psgd_step(state, k):
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, (N, N), jnp.float64)
        hv = _h_apply(hl, hr, v)
        return affine.update_affine(state, v, hv, ku, lr=1.0), None

    state, _ = jax.lax.scan(
        psgd_step, state, jax.random.split(jax.random.fold_in(key, 1), N_ITERS))
    pl = state.ql.T @ state.ql
    pr = state.qr.T @ state.qr
    p_psgd = jnp.kron(pl, pr)
    err_psgd = float(jnp.linalg.norm(p_psgd @ h_full - eye))

    # reference figure: Shampoo plateaus around O(1); PSGD goes below it by
    # an order of magnitude and keeps decreasing
    assert err_psgd < 0.2, err_psgd
    assert err_shampoo > 5 * err_psgd, (err_shampoo, err_psgd)


def _adafactor_variance(h_mat, key, n_iters=2500):
    m, n = h_mat.shape
    r = jnp.zeros((m,), jnp.float64)
    c = jnp.zeros((n,), jnp.float64)
    beta = 0.99

    @jax.jit
    def step(carry, k):
        r, c, i = carry
        g = h_mat * jax.random.normal(k, (m, n), jnp.float64)
        r = beta * r + (1 - beta) * jnp.sum(g * g, axis=1)
        c = beta * c + (1 - beta) * jnp.sum(g * g, axis=0)
        p = jax.lax.rsqrt(jnp.outer(r, c) / jnp.sum(r) / (1 - beta ** (i + 1)))
        var = jnp.mean((p * g) ** 2)
        return (r, c, i + 1.0), var

    (_, _, _), vars_ = jax.lax.scan(step, (r, c, 0.0),
                                    jax.random.split(key, n_iters))
    return float(vars_[-1])


def _psgd_dd_variance(h_mat, key, n_iters=2500):
    m, n = h_mat.shape
    state = affine.AffineState(ql=jnp.ones((m,), jnp.float64),
                               qr=jnp.ones((n,), jnp.float64))

    @jax.jit
    def step(state, k):
        kg, ku = jax.random.split(k)
        g = h_mat * jax.random.normal(kg, (m, n), jnp.float64)
        state = affine.update_affine_dropv(state, g, ku, lr=0.1)
        p = jnp.outer(state.ql ** 2, state.qr ** 2)
        return state, jnp.mean((p * g) ** 2)

    _, vars_ = jax.lax.scan(step, state, jax.random.split(key, n_iters))
    return float(vars_[-1])


def test_psgd_normalizes_variance_where_adafactor_biased():
    m, n = 10, 20
    key = jax.random.key(2)
    # Hessian NOT of Adafactor's assumed rank-one form (reference :22-24)
    h_mat = 0.1 / jax.random.uniform(jax.random.fold_in(key, 0), (m, n),
                                     jnp.float64)
    v_ada = _adafactor_variance(h_mat, jax.random.fold_in(key, 1))
    v_psgd = _psgd_dd_variance(h_mat, jax.random.fold_in(key, 2))
    assert abs(v_psgd - 1.0) < 0.25, v_psgd
    assert abs(v_ada - 1.0) > 2 * abs(v_psgd - 1.0), (v_ada, v_psgd)


def test_both_unbiased_on_assumed_form():
    """When H *is* rank-one (Adafactor's assumed form), both normalize."""
    m, n = 10, 20
    key = jax.random.key(3)
    row = jax.random.uniform(jax.random.fold_in(key, 0), (m, 1), jnp.float64) + 0.5
    col = jax.random.uniform(jax.random.fold_in(key, 1), (1, n), jnp.float64) + 0.5
    h_mat = row @ col
    v_ada = _adafactor_variance(h_mat, jax.random.fold_in(key, 2))
    v_psgd = _psgd_dd_variance(h_mat, jax.random.fold_in(key, 3))
    assert abs(v_ada - 1.0) < 0.3, v_ada
    assert abs(v_psgd - 1.0) < 0.3, v_psgd


def test_psgd_newton_solves_tensor_rank_like_lbfgs():
    """Tensor-rank (CP) decomposition (README.md:114,
    demo_usage_of_all_preconditioners.py): PSGD KronNewton reaches machine
    precision without any line search; deterministic small instances are
    also solved by L-BFGS (run as a baseline in
    examples/tensor_rank_decomposition.py) - the reference's decisive wins
    are on larger multi-trial instances and under stochasticity (next
    test)."""
    import optax
    import psgd_torch_tpu.optim as popt

    rr, ii, jj, kk = 4, 8, 12, 16
    k1, k2 = jax.random.split(jax.random.key(5))
    truth = [jax.random.normal(jax.random.fold_in(k1, i), (rr, s))
             for i, s in enumerate((ii, jj, kk))]
    target = jnp.einsum("ri,rj,rk->ijk", *truth)
    init = [0.5 * jax.random.normal(jax.random.fold_in(k2, i), (rr, s))
            for i, s in enumerate((ii, jj, kk))]

    def loss_fn(xyz):
        err = target - jnp.einsum("ri,rj,rk->ijk", *xyz)
        return jnp.sum(err * err)

    opt2 = popt.kron_newton(learning_rate=0.2, lr_preconditioner=0.5,
                            momentum=0.9, grad_clip_max_norm=10.0,
                            preconditioner_init_scale=1.0)
    state2 = opt2.init(list(init))
    hvp_fn = popt.make_hvp_fn(loss_fn)

    @jax.jit
    def psgd_step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt2.update(grads, state, params, hvp_fn=hvp_fn)
        return optax.apply_updates(params, updates), state, loss

    params2, s2 = list(init), state2
    for _ in range(400):
        params2, s2, _ = psgd_step(params2, s2)
    assert float(loss_fn(params2)) < 1e-8


def test_psgd_lra_beats_stochastic_lbfgs_logistic_regression():
    """Reference claim (README.md:112, misc/mnist_logistic_regression.py):
    PSGD-LRA outperforms L-BFGS ("the algorithm of choice") on
    quadratic-feature logistic regression.  With minibatch gradients the
    L-BFGS curvature pairs and linesearch see a noisy objective and stall
    (the same mechanism as the noisy-Hvp BFGS divergence in
    test_numerical_stability) while LRA whitening keeps converging -
    measured ~2800x lower tail loss."""
    import optax
    import psgd_torch_tpu.optim as popt

    side = 8
    nf = side * side + (side * side) * (side * side + 1) // 2

    def data(key, n=128):
        kx, kl = jax.random.split(key)
        coarse = jax.random.normal(jax.random.key(77), (10, side, side))
        labels = jax.random.randint(kl, (n,), 0, 10)
        x = coarse[labels] + 0.7 * jax.random.normal(kx, (n, side, side))
        x = x.reshape(n, -1)
        iu = jnp.triu_indices(x.shape[1])
        quad = (x[:, :, None] * x[:, None, :])[:, iu[0], iu[1]]
        return jnp.concatenate([x, quad], 1), labels

    def loss_fn(w, f, l):
        logits = f @ w[:-1] + w[-1]
        return -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(logits), l[:, None], 1))

    w0 = jnp.zeros((nf + 1, 10))
    steps = 300

    def tail_loss(opt, lbfgs):
        @jax.jit
        def step(w, s, f, l):
            if lbfgs:
                fn = lambda ww: loss_fn(ww, f, l)
                v, g = jax.value_and_grad(fn)(w)
                u, s = opt.update(g, s, w, value=v, grad=g, value_fn=fn)
            else:
                v, g = jax.value_and_grad(loss_fn)(w, f, l)
                u, s = opt.update(g, s, w)
            return optax.apply_updates(w, u), s, v

        w, s, tail = w0, opt.init(w0), []
        for i in range(steps):
            f, l = data(jax.random.fold_in(jax.random.key(1), i))
            w, s, v = step(w, s, f, l)
            if i >= steps - 50:
                tail.append(float(v))
        return sum(tail) / len(tail)

    l_lbfgs = tail_loss(optax.lbfgs(memory_size=10), True)
    l_psgd = tail_loss(popt.lra_whiten(learning_rate=0.05,
                                       rank_of_approximation=10,
                                       momentum=0.9), False)
    assert l_psgd < 0.1 * l_lbfgs, (l_psgd, l_lbfgs)
