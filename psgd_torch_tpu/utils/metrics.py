"""Optimizer-health metrics for PSGD state (observability the reference
lacks entirely — its only diagnostics are stdout advisories, SURVEY.md §5).

``psgd_metrics(state)`` extracts jit-friendly scalar summaries from any
PSGDState (plain, chained, Kron/LRA/dense, sharded or stacked):

  * per-factor Lipschitz estimates L (their max tracks curvature scale and
    exposes a diverging fit),
  * Q-factor magnitude extrema (over/underflow watch — the reason the
    balancing gate exists),
  * update statistics when given the emitted updates (global RMS, max |u|:
    the amp-clip engagement signal).

Everything is computed inside jit and returned as a flat {name: scalar}
dict — feed it to any logger:

    updates, state = opt.update(grads, state, params)
    metrics = psgd_metrics(state, updates)
    ...
    host_log({k: float(v) for k, v in metrics.items()})  # outside jit
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def _is_kron_like(x) -> bool:
    return hasattr(x, "q") and hasattr(x, "lips")


def _named_precond_states(precond, prefix="leaf"):
    if _is_kron_like(precond):
        yield prefix, precond
    elif isinstance(precond, (tuple, list)):
        for i, st in enumerate(precond):
            yield from _named_precond_states(st, f"{prefix}{i}")
    elif hasattr(precond, "_fields"):  # LRA / dense / legacy NamedTuples
        yield prefix, precond


def psgd_metrics(state: Any, updates: Optional[Any] = None,
                 per_leaf: bool = False) -> Dict[str, jax.Array]:
    """Scalar health metrics from a PSGD optimizer state.

    Accepts a PSGDState or an optax.chain state containing one.  With
    ``per_leaf=True`` adds per-leaf L/|Q| entries (otherwise only global
    aggregates).  Safe inside jit."""
    from ..optim.transforms import PSGDState

    def find(st):
        if isinstance(st, PSGDState):
            return st
        if isinstance(st, (tuple, list)):
            for s in st:
                r = find(s)
                if r is not None:
                    return r
        return None

    ps = find(state)
    out: Dict[str, jax.Array] = {}
    if ps is None:
        return out
    out["step"] = ps.count

    lips_all, qmax_all, qmin_all = [], [], []
    for name, st in _named_precond_states(ps.precond):
        leaf_lips, leaf_qmax, leaf_qmin = [], [], []
        for f in jax.tree_util.tree_leaves(getattr(st, "lips", ())):
            leaf_lips.append(jnp.max(jnp.real(f).astype(jnp.float32)))
        for f in jax.tree_util.tree_leaves(getattr(st, "q", ())):
            a = jnp.abs(f).astype(jnp.float32)
            leaf_qmax.append(jnp.max(a))
            leaf_qmin.append(jnp.min(jnp.max(
                a.reshape(-1, a.shape[-1]), axis=-1)))
        # LRA/dense-style states without .q: summarize every array field
        if not leaf_qmax:
            for f in jax.tree_util.tree_leaves(st):
                a = jnp.abs(f).astype(jnp.float32)
                leaf_qmax.append(jnp.max(a))
        if leaf_lips:
            lips_all.append(jnp.stack(leaf_lips).max())
            if per_leaf:
                out[f"L_max/{name}"] = lips_all[-1]
        if leaf_qmax:
            qmax_all.append(jnp.stack(leaf_qmax).max())
            if per_leaf:
                out[f"q_abs_max/{name}"] = qmax_all[-1]
        if leaf_qmin:
            qmin_all.append(jnp.stack(leaf_qmin).min())

    if lips_all:
        out["L_max"] = jnp.stack(lips_all).max()
    if qmax_all:
        out["q_abs_max"] = jnp.stack(qmax_all).max()
    if qmin_all:
        out["q_rowmax_min"] = jnp.stack(qmin_all).min()

    if ps.mu is not None:
        sq = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                 for x in jax.tree_util.tree_leaves(ps.mu))
        n = sum(x.size for x in jax.tree_util.tree_leaves(ps.mu))
        out["momentum_rms"] = jnp.sqrt(sq / n)

    if updates is not None:
        leaves = jax.tree_util.tree_leaves(updates)
        sq = sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
        n = sum(x.size for x in leaves)
        out["update_rms"] = jnp.sqrt(sq / n)
        out["update_abs_max"] = jnp.stack(
            [jnp.max(jnp.abs(x).astype(jnp.float32)) for x in leaves]).max()
    return out


def state_memory_report(state: Any, per_device: bool = False) -> Dict[str, int]:
    """Bytes held by a PSGD optimizer state, grouped by role.

    Returns ``{"q": ..., "lips": ..., "momentum": ..., "pcache": ...,
    "other": ..., "total": ...}`` in bytes (``pcache`` is the cache_p
    cached-P factors — the knob's state cost, ~one extra set of dense
    factors).  With ``per_device=True`` each leaf is counted
    at its per-device shard size (from ``leaf.sharding``) — the number that
    matters when choosing ``stack_sharding`` / ``factor_sharding`` /
    ``vector_sharding`` layouts: replicated Q reports its full size, a
    k-way-sharded Q reports 1/k of it.  Runs on concrete (placed) states,
    outside jit.  Accepts a PSGDState or an optax chain state containing
    one; the reference has no counterpart (its state lives untyped in
    ``torch.optim`` dicts, SURVEY.md §5 checkpoint note)."""
    import numpy as np

    report = {"q": 0, "lips": 0, "momentum": 0, "pcache": 0, "other": 0,
              "total": 0}

    def nbytes(x) -> int:
        if not hasattr(x, "dtype") or not hasattr(x, "shape"):
            return 0
        shape = x.shape
        if per_device and getattr(x, "sharding", None) is not None:
            try:
                shape = x.sharding.shard_shape(x.shape)
            except Exception:
                pass
        return int(np.prod(shape, dtype=np.int64)) * jnp.dtype(x.dtype).itemsize

    def add(group: str, tree) -> None:
        for leaf in jax.tree_util.tree_leaves(tree):
            b = nbytes(leaf)
            report[group] += b
            report["total"] += b

    def walk_precond(st) -> None:
        if _is_kron_like(st):  # KronState / DenseState / ShardedKronLeaf
            add("q", st.q)
            add("lips", st.lips)
        elif hasattr(st, "d") and hasattr(st, "ld"):  # LRAState / UVdState
            add("q", (st.u, st.v, st.d))
            add("lips", (st.lu, st.lv, st.ld))
        elif isinstance(st, (tuple, list)):
            for s in st:
                walk_precond(s)
        else:  # legacy / affine / xmat / splu NamedTuples: count everything
            add("q", st)

    def walk(st) -> None:
        if hasattr(st, "precond") and hasattr(st, "mu"):  # PSGDState-like
            add("momentum", st.mu)
            walk_precond(st.precond)
            add("other", (st.count, st.key))
            if getattr(st, "pcache", None) is not None:
                add("pcache", st.pcache)  # cache_p: cached P_i factors
        elif isinstance(st, (tuple, list)):
            for s in st:
                walk(s)

    walk(state)
    return report
