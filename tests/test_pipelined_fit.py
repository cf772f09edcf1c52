"""pipelined_fit: the Q fit must read only optimizer state (zero data
dependency on the current step's gradients — the property that lets XLA
overlap the fit and its sharding collectives with the model's
forward/backward pass, SURVEY.md §7), while converging to the same
whitening fixed point as the standard one-step-fresher fit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.optim.transforms import scale_by_kron_whiten


def _grad_stream(key, n_steps, shapes):
    """Stationary correlated gradient stream: g = A z, fixed per-leaf A."""
    keys = jax.random.split(key, len(shapes) + 1)
    mats = [jax.random.normal(k, (int(np.prod(s)), int(np.prod(s))))
            / np.sqrt(np.prod(s)) + 0.5 * jnp.eye(int(np.prod(s)))
            for k, s in zip(keys[:-1], shapes)]
    zs = jax.random.normal(keys[-1], (n_steps, sum(int(np.prod(s))
                                                   for s in shapes)))

    def at(t):
        out, off = [], 0
        for a, s in zip(mats, shapes):
            n = int(np.prod(s))
            out.append((a @ zs[t, off:off + n]).reshape(s))
            off += n
        return out
    return at


def _mk(pipelined, update_prob=1.0):
    return scale_by_kron_whiten(
        preconditioner_init_scale=1.0, momentum=0.9, whiten_grad=False,
        preconditioner_update_probability=update_prob,
        pipelined_fit=pipelined)


def test_validation():
    with pytest.raises(ValueError, match="momentum whitening"):
        scale_by_kron_whiten(preconditioner_init_scale=1.0,
                             pipelined_fit=True)
    with pytest.raises(ValueError, match="init_scale"):
        scale_by_kron_whiten(momentum=0.9, whiten_grad=False,
                             pipelined_fit=True)


def test_fit_is_independent_of_current_gradients():
    """jvp probe: perturbing this step's gradients must leave the NEW
    preconditioner state exactly untouched when pipelined (it reads only
    state.mu), and must perturb it in the standard mode."""
    shapes = [(8, 4), (6,)]
    grads = [jnp.ones(s) for s in shapes]

    def precond_tangent(opt):
        state = opt.init(grads)
        for t in range(3):  # past step 0 so the pipelined fit is live
            _, state = opt.update([g * (t + 1.0) for g in grads], state)
        tang = [jnp.full(s, 0.37) for s in shapes]
        (_, new_state), (_, state_dot) = jax.jvp(
            lambda g: opt.update(g, state), (grads,), (tang,))
        q_dots = [jnp.max(jnp.abs(x))
                  for st in state_dot.precond for x in (*st.q, *st.lips)]
        return max(float(x) for x in q_dots)

    assert precond_tangent(_mk(pipelined=True)) == 0.0
    assert precond_tangent(_mk(pipelined=False)) > 1e-8


@pytest.mark.slow
def test_same_whitening_fixed_point():
    """On a stationary gradient stream the one-step-delayed fit converges
    to the same Q as the standard fit."""
    shapes = [(8, 4)]
    stream = _grad_stream(jax.random.key(0), 400, shapes)

    def run(opt):
        state = opt.init([jnp.zeros(s) for s in shapes])
        step = jax.jit(lambda g, s: opt.update(g, s))
        for t in range(400):
            _, state = step(stream(t), state)
        return state.precond[0].q

    q_std = run(_mk(pipelined=False))
    q_pip = run(_mk(pipelined=True))
    for a, b in zip(q_std, q_pip):
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
        assert rel < 0.05, rel


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipelined_on_production_sharded_layout():
    """The independence property must survive the stack/factor-sharded
    shard_map paths (that is where the overlap pays: the fit's collectives
    can hide behind the backward pass), and training must still converge."""
    from psgd_torch_tpu.models import gpt2
    from psgd_torch_tpu.parallel import (gpt2_partition_specs, make_mesh,
                                         sharding_recipe)

    mesh = make_mesh()
    cfg = gpt2.tiny_config(n_layer=4, n_head=2, n_embd=16, block_size=8,
                           vocab_size=64, compute_dtype=jnp.float32)
    params = gpt2.init_gpt2(jax.random.key(1), cfg)
    mask = gpt2.scanned_layers_mask(params)
    rec = sharding_recipe(mesh, gpt2_partition_specs(), params,
                          scanned_layers=mask)
    opt = popt.kron_whiten(
        learning_rate=1e-3, momentum=0.9, whiten_grad=False,
        preconditioner_init_scale=1.0,
        preconditioner_update_probability=1.0, pipelined_fit=True,
        **rec.transform_kwargs)
    state = opt.init(params)
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

    # independence through the sharded paths: jvp wrt grads
    with mesh:
        grads = jax.grad(gpt2.loss_gpt2)(params, tok, tgt, cfg)
        tang = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 0.11), grads)
        (_, new_state), (_, sdot) = jax.jvp(
            lambda g: opt.update(g, state, params), (grads,), (tang,))
        kron_dot = sdot[0] if isinstance(sdot, tuple) else sdot
        for st in kron_dot.precond:
            for x in (*st.q, *st.lips):
                assert float(jnp.max(jnp.abs(x))) == 0.0
