"""L0 numerical utilities and TPU kernels."""

from .linalg import (
    norm_lower_bound_spd,
    norm_lower_bound_skh,
    procrustes_step2,
    procrustes_step3,
    procrustes_loop3,
    lift2single,
    lifted_real_dtype,
    real_dtype_of,
    sgn,
    triu01,
    damped_pair_vg,
    woodbury_identity,
    norm_lower_bound,
)
