"""Mesh and sharding utilities (L3): SPMD replaces the reference's
NCCL RNG-sync / resync machinery.

The reference's distributed story is two torch.optim wrappers
(/root/reference/wrapped_as_torch_optimizer_for_ddp.py and ..._for_dtensor.py)
that keep replicated PSGD state consistent by broadcasting RNG states and
periodically re-broadcasting parameters (ddp:88-104, 163-170).  Under
jit/GSPMD none of that is needed: the optimizer's PRNG key lives in the
(replicated) state pytree, every replica traces the same program, and XLA's
deterministic collectives keep state bitwise identical.  What remains to
design is *where the factors live* — this module provides:

  * ``make_mesh`` — build a device mesh with named axes, padding axis sizes
    sensibly for whatever device count is available;
  * ``gpt2_partition_specs`` — canonical fsdp/tp PartitionSpecs for the
    models.gpt2 parameter tree;
  * ``psgd_state_specs`` — shardings for PSGDState given the param specs
    (momentum follows the params; Kron factors are replicated by default —
    they are O(sum n_i^2) small relative to params; see parallel.sharded for
    the per-shard-whitening alternative).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..optim.transforms import PSGDState
from ..precond.kron import KronState


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "fsdp", "tp"),
              devices=None,
              axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first n_devices devices.

    ``axis_sizes`` pins the factorization explicitly (must multiply to the
    device count).  Without it the count is factored greedily from the last
    axis (tp) backwards: e.g. 8 devices -> (dp=1, fsdp=4, tp=2);
    4 -> (1, 2, 2); 1 -> (1, 1, 1) — tp innermost so tensor-parallel
    collectives ride the fastest links.

    On real TPU backends the device-to-mesh assignment goes through
    ``mesh_utils.create_device_mesh``, which reads the physical torus
    coordinates (v4/v5p 3D torus, v5e/v6e 2D) and lays consecutive mesh
    columns along physically adjacent chips — the difference between tp
    collectives riding one ICI hop or wrapping the torus.  On CPU/mocked
    device lists it falls back to a plain row-major reshape (deterministic
    for tests)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if axis_sizes is not None:
        sizes = [int(s) for s in axis_sizes]
        if len(sizes) != len(axis_names):
            raise ValueError(f"axis_sizes {sizes} does not match axis_names "
                             f"{tuple(axis_names)}")
        prod = 1
        for s in sizes:
            prod *= s
        if prod != n:
            raise ValueError(f"axis_sizes {sizes} multiply to {prod}, "
                             f"but {n} devices are available")
    else:
        sizes = [1] * len(axis_names)
        # give tp up to 2, fsdp the bulk, dp the rest
        remaining = n
        if len(axis_names) >= 3 and remaining % 2 == 0 and remaining >= 4:
            sizes[-1] = 2
            remaining //= 2
        sizes[-2 if len(axis_names) >= 2 else -1] = remaining

    if n > 1 and all(getattr(d, "platform", None) == "tpu" for d in devices):
        try:
            from jax.experimental import mesh_utils
            mesh_devices = mesh_utils.create_device_mesh(
                tuple(sizes), devices=devices)
            return Mesh(mesh_devices, tuple(axis_names))
        except Exception as e:  # unusual slice shapes: fall back to row-major
            import warnings
            warnings.warn(
                f"mesh_utils.create_device_mesh{tuple(sizes)} failed "
                f"({e!r}); falling back to row-major device order. "
                "Collectives may cross more ICI hops than the "
                "topology-aware layout.", stacklevel=2)
    mesh_devices = np.array(devices).reshape(sizes)
    return Mesh(mesh_devices, tuple(axis_names))


def make_multihost_mesh(axis_names: Sequence[str] = ("dcn", "fsdp", "tp"),
                        ici_shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh for multi-host TPU pods: the leading axis spans hosts over DCN,
    the trailing axes span the per-host ICI torus.

    Call ``jax.distributed.initialize()`` first on each host.  Uses
    ``mesh_utils.create_hybrid_device_mesh`` so collectives on the trailing
    axes ride ICI and only the leading axis crosses DCN — shard params over
    the ICI axes (fsdp/tp) and keep DCN for pure data parallelism, whose
    gradient all-reduce tolerates DCN latency.  Falls back to ``make_mesh``
    when only one process is present (single host, tests)."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return make_mesh(axis_names=axis_names)
    from jax.experimental import mesh_utils
    per_host = jax.local_device_count()
    min_axes = 1 + (len(ici_shape) if ici_shape is not None else 2)
    if len(axis_names) < min_axes:
        raise ValueError(
            f"make_multihost_mesh needs at least {min_axes} axis names "
            f"(one leading DCN axis + {min_axes - 1} ICI axes), got "
            f"{tuple(axis_names)}. With fewer axes an ICI dimension would "
            "fold into the DCN axis and its collectives would cross DCN.")
    if ici_shape is None:
        # trailing axes factored like make_mesh: tp=2 when even, rest fsdp
        tp = 2 if per_host % 2 == 0 and per_host >= 4 else 1
        ici_shape = [1] * (len(axis_names) - 3) + [per_host // tp, tp]
    dcn_shape = [n_proc] + [1] * (len(axis_names) - 1)
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=[1] * (len(axis_names) - len(ici_shape))
            + list(ici_shape),
            dcn_mesh_shape=dcn_shape)
    except ValueError:
        # devices without slice metadata (multi-process CPU, some emulated
        # backends): process-major layout by hand — the leading axis still
        # spans processes, trailing axes stay within one process
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        shape = ([n_proc] + [1] * (len(axis_names) - 1 - len(ici_shape))
                 + list(ici_shape))
        devices = np.array(devs).reshape(shape)
    return Mesh(devices, tuple(axis_names))


def gpt2_partition_specs(fsdp_axis: str = "fsdp", tp_axis: str = "tp") -> dict:
    """Canonical parameter shardings for models.gpt2 (stacked-blocks tree).

    Column-parallel qkv/fc (tp on the output dim), row-parallel proj (tp on
    the input dim), fsdp on the opposite dim; embeddings sharded over vocab
    x embd; norms and biases replicated or tp-sharded to match their matmul.
    """
    return {
        "wte": PS(tp_axis, fsdp_axis),
        "wpe": PS(None, fsdp_axis),
        "blocks": {
            "ln1_scale": PS(None, None),
            "ln1_bias": PS(None, None),
            "attn_qkv_w": PS(None, fsdp_axis, tp_axis),
            "attn_qkv_b": PS(None, tp_axis),
            "attn_proj_w": PS(None, tp_axis, fsdp_axis),
            "attn_proj_b": PS(None, None),
            "ln2_scale": PS(None, None),
            "ln2_bias": PS(None, None),
            "mlp_fc_w": PS(None, fsdp_axis, tp_axis),
            "mlp_fc_b": PS(None, tp_axis),
            "mlp_proj_w": PS(None, tp_axis, fsdp_axis),
            "mlp_proj_b": PS(None, None),
        },
        "lnf_scale": PS(None),
        "lnf_bias": PS(None),
    }


def llama_partition_specs(params: Any = None, fsdp_axis: str = "fsdp",
                          tp_axis: str = "tp") -> dict:
    """Canonical parameter shardings for models.llama (stacked-blocks tree).

    Column-parallel wqkv / w_gu (tp on the fused output dim), row-parallel
    wo / w_down (tp on the input dim), fsdp on the opposite dim; RMSNorm
    scales replicated; embeddings vocab x embd like gpt2.  These are GSPMD
    layout hints (weight-matrix partitioning for memory + matmul sharding;
    XLA inserts the activation collectives) — the fused-qkv tp chunks are
    not head-aligned Megatron splits, which GSPMD does not require.  Pass
    ``params`` (or None) to include the untied ``lm_head`` entry when
    present.
    """
    specs = {
        "wte": PS(tp_axis, fsdp_axis),
        "blocks": {
            "rms1_scale": PS(None, None),
            "wqkv": PS(None, fsdp_axis, tp_axis),
            "wo": PS(None, tp_axis, fsdp_axis),
            "rms2_scale": PS(None, None),
            "w_gu": PS(None, fsdp_axis, tp_axis),
            "w_down": PS(None, tp_axis, fsdp_axis),
        },
        "rmsf_scale": PS(None),
    }
    if params is not None and "lm_head" in params:
        specs["lm_head"] = PS(fsdp_axis, tp_axis)
    return specs


def named_shardings(mesh: Mesh, specs: Any) -> Any:
    """Map a pytree of PartitionSpecs to NamedShardings on ``mesh``."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PS))


def psgd_state_specs(param_specs: Any, state: PSGDState,
                     scanned_layers: Any = None,
                     stack_axis: Optional[str] = None,
                     factor_sharding_params: Any = None,
                     mesh: Optional[Mesh] = None,
                     shared_layers: Any = None) -> PSGDState:
    """Shardings for a PSGDState: momentum follows the params, scalars and
    PRNG key replicated, Kron Q/L factors replicated — unless ``stack_axis``
    is given.

    Kron factors are O(n_i^2) per tensor dim — for transformer weights this
    is ~(d^2 + d'^2) vs d*d' parameters, so replicating them costs little
    memory while keeping the Q-update free of collectives; shard the params
    (fsdp) and the gradients instead.  parallel.sharded provides the
    per-shard-whitening mode when factors must be local.

    ``factor_sharding_params`` (the params pytree, for leaf shapes) shards
    the DIAG Kron factors of non-stacked dim-sharded leaves along their
    dims' mesh axes — the state layout required by the transform's
    ``factor_sharding`` option (embedding Q updates with local contractions
    + psum instead of GSPMD's ~50%-efficient partitioning).

    ``stack_axis`` (with the transform's ``scanned_layers`` mask) shards the
    *leading layer-stack axis* of scanned leaves' Q/L factors over that mesh
    axis — ZeRO-style partitioning of the preconditioner: each device fits
    and applies Q for only n_layer/k layers (GSPMD partitions the vmapped
    update along the stack), and the preconditioned updates are re-gathered
    by one all-gather on the ICI.  Q-update FLOPs and factor memory scale
    1/k with zero math change (the reference has no equivalent; its DDP
    wrapper redundantly updates every Q on every rank).  n_layer must be
    divisible by the mesh axis size.
    """
    replicate = lambda st: jax.tree_util.tree_map(lambda _: PS(), st)
    flags = None
    if scanned_layers is not None:
        flags = [bool(f) for f in jax.tree_util.tree_leaves(scanned_layers)]
    # leaves with the transform's shared_layers factor pooling hold ONE
    # KronState (per-layer diag + shared factors): replicated, never
    # stack- or dim-sharded
    if shared_layers is True:
        shared = list(flags) if flags is not None else None
    elif shared_layers is not None:
        shared = [bool(s) for s in jax.tree_util.tree_leaves(shared_layers)]
    else:
        shared = None

    spec_leaves = jax.tree_util.tree_leaves(
        param_specs, is_leaf=lambda x: isinstance(x, PS))
    shape_leaves = (jax.tree_util.tree_leaves(factor_sharding_params)
                    if factor_sharding_params is not None else None)
    if shape_leaves is not None and mesh is None:
        import warnings
        warnings.warn(
            "psgd_state_specs(factor_sharding_params=...) without mesh=: "
            "specs use the raw per-dim axes instead of the transform's "
            "compute layout (dense-dim axes moved onto a diag dim by "
            "dim_shard_reshard_plan), so GSPMD will silently reshard the "
            "dim-sharded Q state every step. Pass mesh= to match the "
            "compute layout.", stacklevel=2)

    def stacked_kron(ks: KronState) -> KronState:
        return KronState(
            q=tuple(PS(stack_axis, *([None] * (f.ndim - 1))) for f in ks.q),
            lips=tuple(PS(stack_axis, *([None] * (l.ndim - 1)))
                       for l in ks.lips))

    def dim_sharded_kron(ks: KronState, leaf, spec) -> KronState:
        from ..optim.transforms import _squeeze_spec
        axes = _squeeze_spec(leaf.shape, spec)
        if mesh is not None and len(axes) == len(ks.q) and all(
                f.ndim >= 1 for f in ks.q):
            # compute-layout specs: diag factors carry the axes moved off
            # dense dims (kron.dim_shard_reshard_plan)
            from ..precond.kron import dim_shard_reshard_plan

            class _P:
                shape = tuple(int(f.shape[0]) for f in ks.q)
                is_diag = tuple(f.ndim == 1 for f in ks.q)
            axis_sizes = dict(zip(mesh.axis_names,
                                  (int(s) for s in mesh.devices.shape)))
            axes = dim_shard_reshard_plan(_P, axes, axis_sizes)[0]
        qs = []
        for i, f in enumerate(ks.q):
            if f.ndim == 1 and i < len(axes) and axes[i]:
                qs.append(PS(axes[i]))
            else:
                qs.append(PS(*([None] * f.ndim)))
        return KronState(q=tuple(qs), lips=tuple(PS() for _ in ks.lips))

    def precond_specs(precond):
        if not isinstance(precond, tuple):
            return replicate(precond)
        out = []
        for i, ks in enumerate(precond):
            f = flags[i] if flags is not None else False
            if shared is not None and i < len(shared) and shared[i]:
                out.append(replicate(ks))  # pooled single KronState
                continue
            if f and stack_axis is not None and isinstance(ks, KronState):
                out.append(stacked_kron(ks))
            elif (not f and shape_leaves is not None
                  and isinstance(ks, KronState)
                  and i < len(spec_leaves)):
                out.append(dim_sharded_kron(ks, shape_leaves[i],
                                            spec_leaves[i]))
            else:
                out.append(replicate(ks))
        return tuple(out)

    def pcache_specs(pcache):
        # cached P_i factors (cache_p=True) mirror the Q layout: stacked
        # leaves shard their leading layer axis with stack_axis; dim-sharded
        # leaves (factor_sharding) shard diag P like diag Q in the compute
        # layout; everything else is replicated
        if not isinstance(pcache, tuple):
            return jax.tree_util.tree_map(lambda _: PS(), pcache)
        out = []
        for i, pc in enumerate(pcache):
            f = flags[i] if flags is not None else False
            sh = shared is not None and i < len(shared) and shared[i]
            if f and not sh and stack_axis is not None:
                out.append(tuple(PS(stack_axis, *([None] * (x.ndim - 1)))
                                 for x in pc))
            elif (not f and not sh and shape_leaves is not None
                  and isinstance(pc, tuple) and i < len(spec_leaves)):
                # reuse the Q-layout computation: P_i has q_i's rank, so the
                # per-factor specs coincide with the KronState q specs
                fake = KronState(q=pc, lips=tuple(PS() for _ in pc))
                out.append(dim_sharded_kron(fake, shape_leaves[i],
                                            spec_leaves[i]).q)
            else:
                out.append(jax.tree_util.tree_map(lambda _: PS(), pc))
        return tuple(out)

    def one(st):
        if isinstance(st, PSGDState):
            mu_spec = None if st.mu is None else param_specs
            pc = (None if getattr(st, "pcache", None) is None else
                  pcache_specs(st.pcache))
            return PSGDState(count=PS(), key=PS(), mu=mu_spec,
                             precond=precond_specs(st.precond), pcache=pc)
        return replicate(st)

    if isinstance(state, PSGDState):
        return one(state)
    if isinstance(state, tuple):  # optax.chain state
        return tuple(one(st) for st in state)
    return replicate(state)


def lra_state_specs(state: Any, axis: str) -> Any:
    """Shardings for a PSGDState holding a (vector-sharded) LRAState: U/V/d
    and momentum row-sharded on ``axis``, scalars and the PRNG key
    replicated — the state layout produced/consumed by the transforms'
    ``vector_sharding=(mesh, axis)`` option (ZeRO-style global LRA; see
    precond/lra.py).  Accepts a bare PSGDState or an optax.chain tuple."""
    from ..precond.lra import LRAState

    lra_specs = LRAState(u=PS(axis, None), v=PS(axis, None),
                         d=PS(axis, None), lu=PS(), lv=PS(), ld=PS())

    def one(st):
        if isinstance(st, PSGDState) and isinstance(st.precond, LRAState):
            mu = None if st.mu is None else PS(axis)
            return PSGDState(count=PS(), key=PS(), mu=mu, precond=lra_specs)
        return jax.tree_util.tree_map(lambda _: PS(), st)

    if isinstance(state, tuple) and not isinstance(state, PSGDState):
        return tuple(one(st) for st in state)
    return one(state)


def dense_state_specs(state: Any, axis: str) -> Any:
    """Shardings for a PSGDState holding a (row-sharded) DenseState: the
    (n, n) Q row-sharded on ``axis``, momentum (an O(n) vector) and scalars
    replicated — the layout produced/consumed by dense_newton's
    ``vector_sharding=(mesh, axis)`` option (ZeRO-style dense Newton, QEQ
    geometry; see precond/dense.py).  Accepts a bare PSGDState or an
    optax.chain tuple."""
    from ..precond.dense import DenseState

    dn_specs = DenseState(q=PS(axis, None), lips=PS())

    def one(st):
        if isinstance(st, PSGDState) and isinstance(st.precond, DenseState):
            mu = None if st.mu is None else PS()
            return PSGDState(count=PS(), key=PS(), mu=mu, precond=dn_specs)
        return jax.tree_util.tree_map(lambda _: PS(), st)

    if isinstance(state, tuple) and not isinstance(state, PSGDState):
        return tuple(one(st) for st in state)
    return one(state)


def drift_check(tree: Any, mesh: Mesh, axis: str) -> Any:
    """Max |x - x_at_replica_0| per leaf: the SPMD debug analogue of the
    reference's resync broadcasts (wrapped_as_torch_optimizer_for_ddp.py:163-170).

    Bitwise-identical replicas give exactly 0 — the comparison is against a
    broadcast of replica 0's copy, not against ``pmean`` (whose own
    accumulation rounds: summing k identical fp32 copies is inexact for
    non-power-of-two partial sums, so a mean-based check reports ~1-ULP
    "drift" on perfectly synchronized state).  A nonzero value means a
    replica's copy of nominally-replicated state has truly diverged (e.g.
    from mixing traced and host computations, or per-participant rounding in
    emulated CPU collectives).  Cost: one psum of a single masked copy (the
    all-reduce of replica 0's copy zero-padded elsewhere — no k-times
    transient materialization, unlike ``all_gather(x)[0]``) + one pmax per
    leaf — debug tool, not a per-step health metric."""
    from ..utils.compat import shard_map

    def local(x):
        # replica 0's copy, exactly: sum a copy that is zero except at
        # replica 0.  Adding k-1 exact zeros is exact in every float format,
        # so x0 is bitwise replica 0's value on every participant.
        idx = jax.lax.axis_index(axis)
        x0 = jax.lax.psum(jnp.where(idx == 0, x, jnp.zeros_like(x)), axis)
        return jax.lax.pmax(jnp.max(jnp.abs(x - x0)), axis)

    def one(x):
        spec = PS(*([None] * x.ndim))
        fn = shard_map(local, mesh=mesh, in_specs=spec, out_specs=PS())
        return fn(x)

    return jax.tree_util.tree_map(one, tree)
