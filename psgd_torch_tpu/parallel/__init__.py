"""L3 distributed layer: meshes, shardings, per-shard whitening."""

from .recipe import ShardingRecipe, sharding_recipe
from .mesh import (
    dense_state_specs,
    drift_check,
    gpt2_partition_specs,
    llama_partition_specs,
    lra_state_specs,
    make_mesh,
    make_multihost_mesh,
    named_shardings,
    psgd_state_specs,
)
from .sharded import (
    per_shard_kron_newton,
    per_shard_kron_whiten,
    scale_by_per_shard_kron_newton,
    scale_by_per_shard_kron_whiten,
    ShardedKronLeaf,
)
