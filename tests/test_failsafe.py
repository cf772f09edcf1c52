"""Failure detection + rollback recovery (utils.failsafe) — the auxiliary
subsystem the reference lacks entirely (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import psgd_torch_tpu.optim as popt
from psgd_torch_tpu.utils.failsafe import (FailsafeLoop, finite_check,
                                           make_guarded_step)


def test_finite_check():
    assert bool(finite_check({"a": jnp.ones(3), "b": jnp.arange(4)}))
    assert not bool(finite_check({"a": jnp.array([1.0, jnp.nan])}))
    assert not bool(finite_check({"a": jnp.array([jnp.inf])}))
    assert not bool(finite_check({"c": jnp.array([1 + 1j * jnp.nan],
                                                 jnp.complex64)}))
    assert bool(finite_check({"i": jnp.arange(3), "f": jnp.zeros(())}))


def test_failsafe_rolls_back_and_recovers():
    """A loss that blows up at one specific step: the loop must roll back to
    the last good snapshot, shrink the lr scale, and keep training."""
    w_star = jnp.ones(8)

    def loss_fn(p, poison):
        base = 0.5 * jnp.sum((p["w"] - w_star) ** 2)
        return base + jnp.where(poison > 0, jnp.nan, 0.0)  # poison -> NaN

    opt = popt.kron_whiten(learning_rate=0.3,
                           preconditioner_init_scale=1.0)
    params = {"w": jnp.zeros(8)}
    step = make_guarded_step(opt, loss_fn)
    loop = FailsafeLoop(step, params, opt.init(params), snapshot_every=5)

    failed = 0
    for i in range(25):
        poison = jnp.asarray(1.0 if i == 10 else 0.0)
        loss = loop.run_step(poison)
        if loss is None:
            failed += 1
            # rolled back to the last snapshot (multiple of 5 <= i)
            assert loop.step % 5 == 0
        else:
            assert loss == loss and abs(loss) != float("inf")

    assert failed == 1
    assert loop.lr_scale < 1.0  # backed off once
    # training recovered and kept descending after the poisoned step
    final = float(0.5 * jnp.sum((loop.params["w"] - w_star) ** 2))
    assert final < 0.05, final


def test_failsafe_gives_up_after_max_rollbacks():
    def loss_fn(p):
        return jnp.nan * jnp.sum(p["w"])

    opt = popt.kron_whiten(learning_rate=0.1,
                           preconditioner_init_scale=1.0)
    params = {"w": jnp.zeros(4)}
    step = make_guarded_step(opt, loss_fn)
    loop = FailsafeLoop(step, params, opt.init(params), max_rollbacks=3)
    with pytest.raises(RuntimeError, match="consecutive failed"):
        for _ in range(10):
            loop.run_step()


def test_failsafe_checkpoint_integration(tmp_path):
    """With checkpoint_dir set, snapshots also land on disk (orbax)."""
    pytest.importorskip("orbax.checkpoint")
    from psgd_torch_tpu.utils import checkpoint as ckpt

    def loss_fn(p):
        return 0.5 * jnp.sum(p["w"] ** 2)

    opt = popt.kron_whiten(learning_rate=0.1,
                           preconditioner_init_scale=1.0)
    params = {"w": jnp.ones(4)}
    step = make_guarded_step(opt, loss_fn)
    loop = FailsafeLoop(step, params, opt.init(params), snapshot_every=3,
                        checkpoint_dir=str(tmp_path))
    for _ in range(7):
        loop.run_step()
    assert ckpt.latest_step(str(tmp_path)) == 6


def test_snapshot_preserves_key_and_bool_leaves():
    """Generic (params, opt_state) pytrees may contain typed PRNG-key and
    bool leaves; the rollback snapshot must copy them dtype-faithfully."""
    params = {"w": jnp.ones((3,))}
    opt_state = {"key": jax.random.key(7), "flag": jnp.array([True, False]),
                 "mu": jnp.zeros((3,))}

    def step_fn(p, s, lr_scale):
        p = {"w": p["w"] * 0.9}
        return p, s, jnp.sum(p["w"]), finite_check(p)

    loop = FailsafeLoop(step_fn, params, opt_state, snapshot_every=1)
    snap = loop._good
    assert jnp.issubdtype(snap.opt_state["key"].dtype, jax.dtypes.prng_key)
    assert snap.opt_state["flag"].dtype == jnp.bool_
    np.testing.assert_array_equal(
        jax.random.key_data(snap.opt_state["key"]),
        jax.random.key_data(opt_state["key"]))
    assert loop.run_step() is not None
