"""L3 distributed layer: meshes, shardings, per-shard whitening."""

from .mesh import (
    drift_check,
    gpt2_partition_specs,
    make_mesh,
    make_multihost_mesh,
    named_shardings,
    psgd_state_specs,
)
