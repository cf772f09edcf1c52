"""shared_layers: one set of Kron factors pooled over the layer stack plus
a per-layer diagonal.  Beyond-reference capability (the reference state is
strictly per-tensor, psgd.py:161-263): Q-update FLOPs and factor memory
drop L-fold while layer-wise scale stays adaptive."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.optim.transforms import (scale_by_kron_newton,
                                             scale_by_kron_whiten)

L, M, N = 6, 16, 8


def _params():
    return {"blocks": jnp.zeros((L, M, N)), "head": jnp.zeros((N, 4))}


MASK = {"blocks": True, "head": False}


def test_state_structure_and_memory():
    """Shared leaf holds ONE KronState: per-layer diag + one (M,M) + one
    (N,N); the per-layer variant holds L of each dense factor."""
    kw = dict(preconditioner_init_scale=1.0,
              preconditioner_max_skew=float("inf"), scanned_layers=MASK)
    st_shared = scale_by_kron_whiten(shared_layers=MASK, **kw).init(
        _params()).precond[0]
    st_per = scale_by_kron_whiten(**kw).init(_params()).precond[0]
    assert [x.shape for x in st_shared.q] == [(L,), (M, M), (N, N)]
    assert [x.shape for x in st_per.q] == [(L, M, M), (L, N, N)]
    mem = lambda st: sum(int(np.prod(x.shape)) for x in st.q)
    # dense-factor memory drops ~L-fold (plus the tiny (L,) diag)
    assert mem(st_shared) * (L - 1) < mem(st_per)


def test_validation():
    with pytest.raises(ValueError, match="not in scanned_layers"):
        scale_by_kron_whiten(shared_layers={"blocks": False, "head": True},
                             scanned_layers=MASK).init(_params())
    with pytest.raises(ValueError, match="shared_layers has"):
        scale_by_kron_whiten(shared_layers={"z": True},
                             scanned_layers=MASK).init(_params())


@pytest.mark.slow
def test_pooled_whitening_fixed_point():
    """Layers with gradient scale 2^l: the shared dense factors whiten the
    pooled shape covariance and the per-layer diag converges to the
    analytic split d_l ∝ 2^(-l/2) (P carries d twice, P = (E ggᵀ)^(-1/2));
    preconditioned update amplitude equalizes across layers."""
    params = {"blocks": jnp.zeros((L, M, N))}
    opt = scale_by_kron_whiten(preconditioner_init_scale=1.0,
                               lr_preconditioner=0.5,
                               scanned_layers={"blocks": True},
                               shared_layers=True)
    state = opt.init(params)
    step = jax.jit(lambda g, s: opt.update(g, s))
    k = jax.random.key(0)
    scales = (2.0 ** jnp.arange(L))[:, None, None]
    for _ in range(800):
        k, kk = jax.random.split(k)
        up, state = step({"blocks": jax.random.normal(kk, (L, M, N)) * scales},
                         state)
    d = np.asarray(state.precond[0].q[0])
    ratios = d[0] / d
    rel = np.abs(ratios / (2.0 ** (np.arange(L) / 2)) - 1)
    assert rel.max() < 0.15, ratios
    amps = np.sqrt(np.mean(np.asarray(up["blocks"]) ** 2, axis=(1, 2)))
    assert amps.max() / amps.min() < 1.5, amps


def test_newton_shared_runs():
    def loss(p):
        return jnp.sum(p["blocks"] ** 2 * 3.0) + jnp.sum(p["head"] ** 2)

    opt = scale_by_kron_newton(preconditioner_init_scale=1.0,
                               scanned_layers=MASK, shared_layers=True)
    p = {"blocks": jnp.ones((L, M, N)), "head": jnp.ones((N, 4))}
    state = opt.init(p)
    hvp = lambda q, v: (jax.grad(loss)(q), jax.jvp(jax.grad(loss), (q,), (v,))[1])
    losses = []
    for _ in range(40):
        g = jax.grad(loss)(p)
        up, state = opt.update(g, state, p, hvp_fn=hvp)
        p = optax.apply_updates(p, jax.tree_util.tree_map(
            lambda u: -0.3 * u, up))
        losses.append(float(loss(p)))
    assert [x.shape for x in state.precond[0].q] == [(L,), (M, M), (N, N)]
    assert losses[-1] < 1e-3 * losses[0]


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shared_through_sharding_recipe():
    """The recipe threads shared_layers: stack sharding is skipped for
    pooled leaves (no per-layer Q), their state stays replicated, and
    training on the production mesh converges."""
    from jax.sharding import PartitionSpec as PS
    from psgd_torch_tpu.models import gpt2
    from psgd_torch_tpu.parallel import (gpt2_partition_specs, make_mesh,
                                         sharding_recipe)

    mesh = make_mesh()
    cfg = gpt2.tiny_config(n_layer=4, n_head=2, n_embd=16, block_size=8,
                           vocab_size=64, compute_dtype=jnp.float32)
    params = gpt2.init_gpt2(jax.random.key(1), cfg)
    mask = gpt2.scanned_layers_mask(params)
    rec = sharding_recipe(mesh, gpt2_partition_specs(), params,
                          scanned_layers=mask, shared_layers=True)
    assert rec.stack_axis is None  # every stacked leaf is pooled
    kw = rec.transform_kwargs
    assert kw["shared_layers"] is True and "stack_sharding" not in kw

    opt = popt.kron_whiten(learning_rate=1e-3, preconditioner_init_scale=1.0,
                           preconditioner_update_probability=1.0, **kw)
    state = opt.init(params)
    specs = rec.state_specs(state)
    kron_specs = specs[0] if isinstance(specs, tuple) else specs
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_flatten_with_path(params)[0]]
    blk = next(i for i, p in enumerate(paths) if "blocks" in p)
    assert all(s == PS() or all(a is None for a in s)
               for s in kron_specs.precond[blk].q)

    params, state = rec.place(params, state)
    tok, tgt = gpt2.synthetic_lm_batch(jax.random.key(2), 8, cfg.block_size,
                                       cfg.vocab_size)

    @jax.jit
    def tstep(p, s, a, b):
        l, g = jax.value_and_grad(gpt2.loss_gpt2)(p, a, b, cfg)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    losses = []
    with mesh:
        for _ in range(4):
            params, state, l = tstep(params, state, tok, tgt)
            losses.append(float(l))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
