"""X-matrix preconditioner: Q = diag(a) + adiag(b).

Functional JAX re-design of the reference XMat family
(/root/reference/preconditioned_stochastic_gradient_descent.py:947-991):
slightly richer than a diagonal preconditioner at the same O(n) cost —
the anti-diagonal couples parameter i with parameter n-1-i.  For odd n the
middle anti-diagonal entry is zeroed each update (reference :971-973).

Pure elementwise + flip ops: VPU-only on TPU, no MXU needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import real_dtype_of


class XMatState(NamedTuple):
    a: jax.Array   # (n,) diagonal
    b: jax.Array   # (n,) anti-diagonal


def init_xmat(n: int, scale: float = 1.0, dtype=jnp.float32) -> XMatState:
    return XMatState(a=scale * jnp.ones((n,), dtype),
                     b=jnp.zeros((n,), dtype))


def update_xmat(state: XMatState, v: jax.Array, h: jax.Array,
                lr: float = 0.1, step_normalizer: str = "2nd",
                tiny: float = 1.2e-38) -> XMatState:
    """One update with a (v, h) pair (reference update_precond_Xmat_math_,
    :957-981)."""
    a, b = state.a, state.b
    v = v.reshape(-1)
    h = h.reshape(-1)
    flip = lambda x: jnp.flip(x, 0)

    qh = a * h + b * flip(h)
    aflip, bflip = flip(a), flip(b)
    inv_qtv = (aflip * v - bflip * flip(v)) / (a * aflip - b * bflip)

    u_, w_ = qh * qh, inv_qtv * inv_qtv
    nabla_a = u_ - w_
    nabla_b = qh * flip(qh) - inv_qtv * flip(inv_qtv)
    n = nabla_b.shape[0]
    if n % 2 == 1:  # zero the central anti-diagonal coupling (odd n)
        nabla_b = nabla_b.at[n // 2].set(0.0)

    rdt = real_dtype_of(a.dtype)
    if step_normalizer == "2nd":
        mu = lr / (jnp.max(u_ + w_).astype(rdt) + tiny)
    else:
        mu = lr / (jnp.maximum(jnp.max(jnp.abs(nabla_a)),
                               jnp.max(jnp.abs(nabla_b))).astype(rdt) + tiny)

    new_a = a - mu * (nabla_a * a + nabla_b * bflip)
    new_b = b - mu * (nabla_a * b + nabla_b * aflip)
    return XMatState(a=new_a, b=new_b)


def update_xmat_whiten(state: XMatState, g: jax.Array, key: jax.Array,
                       lr: float = 0.1, step_normalizer: str = "2nd",
                       damping: float = 1e-9) -> XMatState:
    """Whitening wrapper: synthesize v, damp g."""
    g = g.reshape(-1)
    v = jax.random.normal(key, g.shape, g.dtype)
    eps = jnp.finfo(real_dtype_of(g.dtype)).eps
    return update_xmat(state, v, g + (damping + eps * jnp.abs(g)) * v,
                       lr=lr, step_normalizer=step_normalizer)


def precond_grad_xmat(state: XMatState, g: jax.Array) -> jax.Array:
    """P g with P = Q^T Q (reference precond_grad_Xmat_math, :984-990)."""
    a, b = state.a, state.b
    shape = g.shape
    g = g.reshape(-1)
    ab = a * b
    out = (a * a + jnp.flip(b * b, 0)) * g + (ab + jnp.flip(ab, 0)) * jnp.flip(g, 0)
    return out.reshape(shape)
