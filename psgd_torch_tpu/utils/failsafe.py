"""Failure detection + elastic recovery for PSGD training loops.

The reference has neither (SURVEY.md §5: "no checkpoint of optimizer state,
no resume logic anywhere"); this module closes the remaining auxiliary-
subsystem gap TPU-style: training state is a pure pytree, so a "known-good
snapshot" is just a pytree kept on device (or an orbax checkpoint on disk),
and recovery is a functional rollback — no process restarts needed for the
most common failure (a loss/grad blow-up or a bf16 overflow NaN-ing the
preconditioner).

Two layers:

  * ``finite_check(tree)`` — jit-safe scalar: True iff every leaf is finite.
    Cheap enough to run every step (one pass over the update tensors).
  * ``FailsafeLoop`` — host-side driver: runs a jitted step, checks the
    returned health scalar, and on failure rolls back to the last good
    snapshot, optionally shrinking the learning-rate scale fed to the step
    (the pytree-snapshot analogue of elastic restart-from-checkpoint).

For multi-host elasticity (a host dropping out), pair this with orbax
checkpoints (utils.checkpoint) + ``jax.distributed`` re-initialization; the
in-memory rollback here covers the single-program failure modes.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def finite_check(tree: Any) -> jax.Array:
    """Scalar bool: every leaf of ``tree`` is finite (jit-safe).

    Complex leaves are checked on both components; integer leaves pass.
    """
    ok = jnp.asarray(True)
    for x in jax.tree_util.tree_leaves(tree):
        if not jnp.issubdtype(x.dtype, jnp.inexact):
            continue
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(
            jnp.abs(x) if jnp.issubdtype(x.dtype, jnp.complexfloating)
            else x)))
    return ok


class FailsafeState(NamedTuple):
    """Host-side record of the last known-good training state."""
    step: int
    params: Any
    opt_state: Any
    lr_scale: float


class FailsafeLoop:
    """Rollback-on-failure driver around a jitted train step.

    ``step_fn(params, opt_state, lr_scale, *batch) -> (params, opt_state,
    loss, healthy)`` where ``healthy`` is a scalar bool (e.g.
    ``finite_check((updates, loss))`` computed inside the step).  The loop
    snapshots (params, opt_state) every ``snapshot_every`` steps; when a
    step reports unhealthy (or a non-finite loss), it rolls back to the
    snapshot and multiplies the lr scale by ``lr_backoff``.

    >>> loop = FailsafeLoop(step_fn, params, opt_state)
    >>> for batch in data:
    ...     loss = loop.run_step(batch)
    """

    def __init__(self, step_fn: Callable, params: Any, opt_state: Any,
                 snapshot_every: int = 100, lr_backoff: float = 0.5,
                 max_rollbacks: int = 10,
                 checkpoint_dir: Optional[str] = None):
        self._step_fn = step_fn
        self.params = params
        self.opt_state = opt_state
        self.step = 0
        self.lr_scale = 1.0
        self.snapshot_every = snapshot_every
        self.lr_backoff = lr_backoff
        self.max_rollbacks = max_rollbacks
        self.rollbacks = 0
        self.checkpoint_dir = checkpoint_dir
        self._good = self._snapshot()

    def _snapshot(self) -> FailsafeState:
        # device-to-device copy so later donation/aliasing can't clobber it
        # (jnp.copy: dtype-preserving, works on bool and typed PRNG-key
        # leaves where ``x + 0`` would promote or raise)
        copy = jax.tree_util.tree_map(lambda x: jnp.copy(x)
                                      if hasattr(x, "dtype") else x,
                                      (self.params, self.opt_state))
        if self.checkpoint_dir is not None:
            from . import checkpoint as ckpt
            ckpt.save_checkpoint(self.checkpoint_dir, self.step,
                                 self.params, self.opt_state)
        return FailsafeState(self.step, copy[0], copy[1], self.lr_scale)

    def run_step(self, *batch):
        """One guarded step.

        Returns the (host) loss on success, or ``None`` when the step was
        unhealthy — in which case the state has been rolled back to the
        last good snapshot and the lr scale shrunk; the caller proceeds
        with its next batch (retrying the same batch would re-fail on
        data-dependent blow-ups).  Raises RuntimeError after
        ``max_rollbacks`` consecutive failures.
        """
        params, opt_state, loss, healthy = self._step_fn(
            self.params, self.opt_state, self.lr_scale, *batch)
        loss_f = float(loss)
        ok = bool(healthy) and (loss_f == loss_f) and abs(loss_f) != float("inf")
        if ok:
            self.params, self.opt_state = params, opt_state
            self.step += 1
            self.rollbacks = 0
            if self.step % self.snapshot_every == 0:
                self._good = self._snapshot()
            return loss_f
        # failure: roll back to the last good snapshot, back off the lr
        self.rollbacks += 1
        if self.rollbacks > self.max_rollbacks:
            raise RuntimeError(
                f"step {self.step}: {self.rollbacks} consecutive failed "
                f"steps; giving up (last loss {loss_f})")
        self.lr_scale *= self.lr_backoff
        self.params = self._good.params
        self.opt_state = self._good.opt_state
        self.step = self._good.step
        return None


def make_guarded_step(opt, loss_fn) -> Callable:
    """Convenience: build a FailsafeLoop-compatible jitted step from an optax
    optimizer and ``loss_fn(params, *batch)``: applies ``lr_scale`` to the
    updates and reports health = finite(loss) & finite(updates)."""
    import optax

    @jax.jit
    def step(params, opt_state, lr_scale, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        healthy = jnp.logical_and(finite_check(updates),
                                  jnp.isfinite(loss))
        updates = jax.tree_util.tree_map(
            lambda u: u * jnp.asarray(lr_scale, u.dtype), updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, healthy

    return step
