"""L1 functional preconditioner kernels — the real PSGD API.

Each family provides init (state pytree + static plan), update functions per
dQ geometry in whitening and Newton flavors, and an apply (precond_grad).
"""

from . import kron
