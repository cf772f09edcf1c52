"""psgd_torch_tpu — a TPU-native PSGD (Preconditioned SGD) framework.

A from-scratch JAX/XLA/Pallas design with the capabilities of the reference
PyTorch implementation (lixilinx/psgd_torch): the full family of Lie-group
preconditioners (Kronecker-factored, low-rank LRA, dense Newton, plus legacy
affine / X-matrix / SPLU / normalization-scaling geometries), in both
gradient/momentum-whitening and Hessian-fitting (Newton) modes, across all
update geometries (EQ, QEQ, QEP, QUAD, Q0.5EQ1.5, QUAD4P, PRO4P), with
optax-style optimizer transforms, exact Hvp via jax.jvp, and sharding-aware
distributed operation over TPU meshes.

Layering mirrors SURVEY.md §1:
  ops/       L0 numerical utilities (+ Pallas kernels)
  precond/   L1 functional preconditioner kernels (the real API)
  optim/     L2 optax-style transforms and closure-style classes
  parallel/  L3 mesh/sharding utilities (DP replicated, per-shard, sharded factors)
  models/    L4 demo/benchmark models
"""

from . import models, ops, optim, parallel, precond, utils
from .ops.linalg import (
    norm_lower_bound_spd,
    norm_lower_bound_skh,
    procrustes_step2,
    procrustes_step3,
    lift2single,
    damped_pair_vg,
    woodbury_identity,
    norm_lower_bound,
)
from .precond import kron
from .precond.kron import (
    KronPlan,
    KronState,
    init_kron,
    make_kron_plan,
    update_kron_whiten,
    update_kron_newton,
)
from .precond.kron import precond_grad as precond_grad_kron

__version__ = "0.1.0"
