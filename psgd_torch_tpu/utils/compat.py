"""JAX version-compatibility shims shared across the package."""

from __future__ import annotations

import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# the replication-check kwarg was renamed check_rep -> check_vma
_CHECK_KW = ("check_vma" if "check_vma" in
             inspect.signature(_shard_map).parameters else "check_rep")


def shard_map(f, *, mesh, in_specs, out_specs, check_rep: bool = False):
    """shard_map with the replication check disabled by default (the PSGD
    sharded paths rely on identical-PRNG replication, which the checker
    cannot prove)."""
    kw = {_CHECK_KW: check_rep}
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **kw)
