"""Hessian-vector products for the Newton-type preconditioners.

The reference computes Hvps with double-backward autograd
(create_graph=True, /root/reference/psgd.py:917-922) or a finite-difference
perturb-and-restore scheme (:923-938).  On TPU/JAX the natural primitives:

  * exact: forward-over-reverse ``jax.jvp(jax.grad(f), (params,), (vs,))`` —
    one extra forward pass over the gradient computation, fuses into the same
    XLA program as the loss/grad evaluation;
  * finite difference: two gradient evaluations at params and
    params + delta * v, with delta = sqrt(eps) (loss must be pure — trivially
    true in JAX).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops.linalg import real_dtype_of


def rand_like_tree(key: jax.Array, tree: Any) -> Any:
    """A pytree of white unit-variance probe vectors matching ``tree``
    (hardware-PRNG fast path on TPU — see ops.fastrand)."""
    from ..ops.fastrand import unit_noise
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    vs = [unit_noise(k, leaf.shape, leaf.dtype)
          for k, leaf in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vs)


def hvp_exact(loss_fn: Callable, params: Any, vs: Any, *args, **kwargs):
    """(grads, Hvs) with the exact Hessian-vector product.

    Equivalent of torch.autograd.grad(grads, params, vs) with create_graph
    (reference psgd.py:917-922), as forward-over-reverse jvp."""
    grad_fn = lambda p: jax.grad(loss_fn)(p, *args, **kwargs)
    grads, hvs = jax.jvp(grad_fn, (params,), (vs,))
    return grads, hvs


def hvp_finite_diff(loss_fn: Callable, params: Any, vs: Any, *args,
                    delta: float | None = None, **kwargs):
    """(grads, Hvs) via finite differences: (g(p + delta v) - g(p)) / delta.

    Reference parity: psgd.py:923-938 with delta = eps ** 0.5."""
    if delta is None:
        dt = real_dtype_of(jax.tree_util.tree_leaves(params)[0].dtype)
        delta = float(jnp.finfo(dt).eps) ** 0.5
    grad_fn = lambda p: jax.grad(loss_fn)(p, *args, **kwargs)
    grads = grad_fn(params)
    perturbed = jax.tree_util.tree_map(lambda p, v: p + delta * v, params, vs)
    grads2 = grad_fn(perturbed)
    hvs = jax.tree_util.tree_map(lambda a, b: (a - b) / delta, grads2, grads)
    return grads, hvs


def make_hvp_fn(loss_fn: Callable, *args, exact: bool = True, **kwargs):
    """Returns hvp_fn(params, vs) -> (grads, Hvs) closing over batch args."""
    if exact:
        return lambda p, v: hvp_exact(loss_fn, p, v, *args, **kwargs)
    return lambda p, v: hvp_finite_diff(loss_fn, p, v, *args, **kwargs)
