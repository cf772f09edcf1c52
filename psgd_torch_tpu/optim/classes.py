"""Closure-style optimizer classes mirroring the reference L2 API.

The reference exposes classes constructed from the parameter list whose
``step(closure)`` runs autograd internally and mutates params in place
(/root/reference/psgd.py: KronWhiten:516, KronNewton:832, LRAWhiten:1075,
LRANewton:1201, DenseNewton:1427).  JAX params are immutable, so the step
here takes and returns params:

    opt = KronWhiten(params, lr_params=1e-3, momentum=0.9)
    for batch in data:
        loss, params = opt.step(loss_fn, params, batch)

``loss_fn(params, *args)`` must be a pure scalar loss (the closure
equivalent); with ``step(..., has_aux=True)`` it may return ``(loss, aux)``
— the reference's closure-tuple-with-loss-first contract (psgd.py:594-596).  Pass a FIXED loss_fn and feed per-step data through ``*args``
— the step is jitted per loss_fn identity, so a fresh lambda every step
forces recompilation (the cache warns and resets if that happens).  The
reference's "all hyperparameters mutable on the fly" contract (psgd.py
docstrings) is kept: assigning any constructor hyperparameter
(``opt.lr_preconditioner``, ``opt.momentum``, ``opt.grad_clip_max_amps``,
...) takes effect on the next step by rebuilding the transform.

**Do not anneal per step via attribute assignment**: every changed value
rebuilds the transform and retraces + recompiles the whole step (~1000x the
cost of a fixed step).  For the reference's production recipe (annealing
``lr_preconditioner`` / ``preconditioner_update_probability`` every step,
misc/gpt2.py:440) pass an optax-style *schedule* ``Callable[[step], value]``
as the hyperparameter instead — schedules are resolved inside the jitted
step at zero retrace cost.  Occasional changes (e.g. once per epoch) are
fine; the class warns if it detects frequent rebuilds.  Changes that alter
the state structure (enabling momentum, changing rank or dtype) require
constructing a fresh optimizer.

Prefer the optax transforms (optim.transforms) for new code — these classes
exist for drop-in familiarity with the reference.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from . import transforms as T
from .hvp import make_hvp_fn


class _ClosureOptimizer:
    """Shared machinery: transform (re)build, jit cache, step."""

    _MAX_JIT_CACHE = 8  # distinct loss_fn identities before reset + warning

    def __init__(self, params, lr_params: float, **kwargs):
        self.lr_params = lr_params
        self._kwargs = kwargs
        self._tx = self._build(**kwargs)
        self.state = self._tx.init(params)
        self._built_with = self._hyper_key()
        self._jit_cache = {}

    def _build(self, **kwargs):
        raise NotImplementedError

    def _hyper_key(self):
        # any hyperparameter change rebuilds the transform (pytrees like
        # scanned_layers are keyed by repr — cheap and deterministic)
        return tuple(sorted((k, repr(v)) for k, v in self._kwargs.items()))

    def __getattr__(self, name):
        kw = self.__dict__.get("_kwargs", {})
        if name in kw:
            return kw[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name != "_kwargs" and "_kwargs" in self.__dict__ \
                and name in self._kwargs:
            self._kwargs[name] = value
            return
        super().__setattr__(name, value)

    _REBUILD_WARN_AT = 5  # rebuilds before warning about retrace cost

    def _refresh(self):
        if self._hyper_key() != self._built_with:
            self._tx = self._build(**self._kwargs)
            self._built_with = self._hyper_key()
            self._jit_cache.clear()
            n = self.__dict__.get("_rebuild_count", 0) + 1
            self.__dict__["_rebuild_count"] = n
            if n == self._REBUILD_WARN_AT:
                import warnings
                warnings.warn(
                    "Hyperparameter reassignment has rebuilt (and will "
                    "recompile) the optimizer step "
                    f"{n} times. For per-step annealing, pass an optax-style "
                    "schedule (Callable[[step], value]) as lr_preconditioner "
                    "/ preconditioner_update_probability instead of "
                    "reassigning attributes — schedules run inside the "
                    "jitted step at zero retrace cost.")

    def _needs_hvp(self) -> bool:
        return False

    def _step_fn(self, loss_fn, has_aux=False):
        self._refresh()
        if len(self._jit_cache) >= self._MAX_JIT_CACHE:
            import warnings
            warnings.warn(
                "Many distinct loss_fn identities passed to step(); each one "
                "retraces and recompiles. Pass one fixed loss_fn and supply "
                "batch data through step(loss_fn, params, *args).")
            self._jit_cache.clear()
        key = (id(loss_fn), has_aux, self._built_with)
        if key not in self._jit_cache:
            tx = self._tx
            needs_hvp = self._needs_hvp()
            exact = self._kwargs.get("exact_hessian_vector_product", True)
            # reference closures may return a tuple with the loss first
            # (psgd.py:594-596); the Hvp path always needs the scalar view
            scalar_fn = ((lambda p, *a: loss_fn(p, *a)[0]) if has_aux
                         else loss_fn)

            @jax.jit
            def step(params, state, lr_params, *args):
                out, grads = jax.value_and_grad(loss_fn, has_aux=has_aux)(
                    params, *args)
                if needs_hvp:
                    hvp_fn = make_hvp_fn(scalar_fn, *args, exact=exact)
                    updates, state = tx.update(grads, state, params,
                                               hvp_fn=hvp_fn)
                else:
                    updates, state = tx.update(grads, state, params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p - lr_params.astype(p.dtype) * u,
                    params, updates)
                return out, params, state

            self._jit_cache[key] = step
        return self._jit_cache[key]

    def step(self, loss_fn: Callable, params: Any, *args,
             has_aux: bool = False) -> Tuple[Any, Any]:
        """One optimization step; returns (loss, new_params).

        With ``has_aux=True``, ``loss_fn`` returns ``(loss, aux)`` (the
        reference's closure-returning-a-tuple-with-loss-first contract,
        psgd.py:594-596) and step returns ``((loss, aux), new_params)``."""
        fn = self._step_fn(loss_fn, has_aux)
        out, params, self.state = fn(params, self.state,
                                     jnp.asarray(self.lr_params, jnp.float32),
                                     *args)
        return out, params


class KronWhiten(_ClosureOptimizer):
    """Reference-parity KronWhiten class (psgd.py:516-654)."""


    def __init__(self, params, preconditioner_max_size=float("inf"),
                 preconditioner_max_skew=1.0, preconditioner_init_scale=None,
                 lr_params=0.001, lr_preconditioner=0.1, betaL=0.9,
                 damping=1e-9, momentum=0.0, grad_clip_max_amps=(2.0, 10.0),
                 preconditioner_update_probability=1.0,
                 update_preconditioner_first=True, whiten_grad=True,
                 dQ="Q0.5EQ1.5", preconditioner_dtype=None, norm_k=None,
                 seed=0, scanned_layers=None, share_fit_apply=False,
                 cache_p=False):
        kwargs = dict(
            preconditioner_max_size=preconditioner_max_size,
            preconditioner_max_skew=preconditioner_max_skew,
            preconditioner_init_scale=preconditioner_init_scale,
            lr_preconditioner=lr_preconditioner, betaL=betaL, damping=damping,
            momentum=momentum, grad_clip_max_amps=grad_clip_max_amps,
            preconditioner_update_probability=preconditioner_update_probability,
            update_preconditioner_first=update_preconditioner_first,
            whiten_grad=whiten_grad, dq=dQ,
            preconditioner_dtype=preconditioner_dtype, norm_k=norm_k,
            seed=seed, scanned_layers=scanned_layers,
            share_fit_apply=share_fit_apply, cache_p=cache_p)
        super().__init__(params, lr_params, **kwargs)

    def _build(self, **kwargs):
        return T.scale_by_kron_whiten(**kwargs)


class KronNewton(_ClosureOptimizer):
    """Reference-parity KronNewton class (psgd.py:832-978)."""


    def __init__(self, params, preconditioner_max_size=float("inf"),
                 preconditioner_max_skew=1.0, preconditioner_init_scale=None,
                 lr_params=0.01, lr_preconditioner=0.1, betaL=0.9,
                 damping=1e-9, momentum=0.0, grad_clip_max_norm=float("inf"),
                 preconditioner_update_probability=1.0,
                 exact_hessian_vector_product=True, dQ="Q0.5EQ1.5",
                 preconditioner_dtype=None, norm_k=None, seed=0,
                 scanned_layers=None, cache_p=False):
        kwargs = dict(
            preconditioner_max_size=preconditioner_max_size,
            preconditioner_max_skew=preconditioner_max_skew,
            preconditioner_init_scale=preconditioner_init_scale,
            lr_preconditioner=lr_preconditioner, betaL=betaL, damping=damping,
            momentum=momentum, grad_clip_max_norm=grad_clip_max_norm,
            preconditioner_update_probability=preconditioner_update_probability,
            dq=dQ, preconditioner_dtype=preconditioner_dtype, norm_k=norm_k,
            seed=seed, scanned_layers=scanned_layers, cache_p=cache_p,
            exact_hessian_vector_product=exact_hessian_vector_product)
        super().__init__(params, lr_params, **kwargs)

    def _build(self, **kwargs):
        kwargs = {k: v for k, v in kwargs.items()
                  if k != "exact_hessian_vector_product"}
        return T.scale_by_kron_newton(**kwargs)

    def _needs_hvp(self):
        return True


class LRAWhiten(_ClosureOptimizer):
    """Reference-parity LRAWhiten class (psgd.py:1075-1190)."""


    def __init__(self, params, rank_of_approximation=10,
                 preconditioner_init_scale=None, lr_params=0.001,
                 lr_preconditioner=0.1, betaL=0.9, damping=1e-9, momentum=0.0,
                 grad_clip_max_amps=(2.0, 10.0),
                 preconditioner_update_probability=1.0,
                 update_preconditioner_first=True, whiten_grad=True,
                 preconditioner_dtype=None, seed=0):
        kwargs = dict(
            rank_of_approximation=rank_of_approximation,
            preconditioner_init_scale=preconditioner_init_scale,
            lr_preconditioner=lr_preconditioner, betaL=betaL, damping=damping,
            momentum=momentum, grad_clip_max_amps=grad_clip_max_amps,
            preconditioner_update_probability=preconditioner_update_probability,
            update_preconditioner_first=update_preconditioner_first,
            whiten_grad=whiten_grad, preconditioner_dtype=preconditioner_dtype,
            seed=seed)
        super().__init__(params, lr_params, **kwargs)

    def _build(self, **kwargs):
        return T.scale_by_lra_whiten(**kwargs)


class LRANewton(_ClosureOptimizer):
    """Reference-parity LRANewton class (psgd.py:1201-1330)."""


    def __init__(self, params, rank_of_approximation=10,
                 preconditioner_init_scale=None, lr_params=0.01,
                 lr_preconditioner=0.1, betaL=0.9, damping=1e-9, momentum=0.0,
                 grad_clip_max_norm=float("inf"),
                 preconditioner_update_probability=1.0,
                 exact_hessian_vector_product=True,
                 preconditioner_dtype=None, seed=0):
        kwargs = dict(
            rank_of_approximation=rank_of_approximation,
            preconditioner_init_scale=preconditioner_init_scale,
            lr_preconditioner=lr_preconditioner, betaL=betaL, damping=damping,
            momentum=momentum, grad_clip_max_norm=grad_clip_max_norm,
            preconditioner_update_probability=preconditioner_update_probability,
            preconditioner_dtype=preconditioner_dtype, seed=seed,
            exact_hessian_vector_product=exact_hessian_vector_product)
        super().__init__(params, lr_params, **kwargs)

    def _build(self, **kwargs):
        kwargs = {k: v for k, v in kwargs.items()
                  if k != "exact_hessian_vector_product"}
        return T.scale_by_lra_newton(**kwargs)

    def _needs_hvp(self):
        return True


class DenseNewton(_ClosureOptimizer):
    """Reference-parity DenseNewton class (psgd.py:1427-1563)."""


    def __init__(self, params, preconditioner_init_scale=None, lr_params=0.01,
                 lr_preconditioner=0.1, betaL=0.9, damping=1e-9, momentum=0.0,
                 grad_clip_max_norm=float("inf"),
                 preconditioner_update_probability=1.0,
                 exact_hessian_vector_product=True, dQ="Q0.5EQ1.5",
                 preconditioner_dtype=None, norm_k=None, seed=0):
        kwargs = dict(
            preconditioner_init_scale=preconditioner_init_scale,
            lr_preconditioner=lr_preconditioner, betaL=betaL, damping=damping,
            momentum=momentum, grad_clip_max_norm=grad_clip_max_norm,
            preconditioner_update_probability=preconditioner_update_probability,
            dq=dQ, preconditioner_dtype=preconditioner_dtype, norm_k=norm_k,
            seed=seed,
            exact_hessian_vector_product=exact_hessian_vector_product)
        super().__init__(params, lr_params, **kwargs)

    def _build(self, **kwargs):
        kwargs = {k: v for k, v in kwargs.items()
                  if k != "exact_hessian_vector_product"}
        return T.scale_by_dense_newton(**kwargs)

    def _needs_hvp(self):
        return True
