"""L2 optimizer layer: optax-style PSGD transforms + Hvp helpers."""

from .classes import (
    DenseNewton,
    KronNewton,
    KronWhiten,
    LRANewton,
    LRAWhiten,
)
from .hvp import hvp_exact, hvp_finite_diff, make_hvp_fn, rand_like_tree
from .legacy_transforms import (
    affine,
    newton_inv,
    scale_by_affine,
    scale_by_newton_inv,
    scale_by_splu,
    scale_by_uvd,
    scale_by_xmat,
    splu,
    uvd,
    xmat,
)
from .transforms import (
    PSGDState,
    dense_newton,
    kron_newton,
    kron_whiten,
    lra_newton,
    lra_whiten,
    scale_by_dense_newton,
    scale_by_kron_newton,
    scale_by_kron_whiten,
    scale_by_lra_newton,
    scale_by_lra_whiten,
)
