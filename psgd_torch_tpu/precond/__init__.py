"""L1 functional preconditioner kernels — the real PSGD API.

Each family provides init (state pytree + static plan), update functions per
dQ geometry in whitening and Newton flavors, and an apply (precond_grad).

Families:
  kron    — Kronecker-factored, all seven dQ geometries (the flagship)
  lra     — low-rank approximation Q = (I + U V^T) diag(d)
  dense   — full-matrix Newton-type (BFGS alternative)
  affine  — per-matrix Q = kron(conj(Q2), Q1) with matrixizer (legacy)
  xmat    — X-matrix Q = diag(a) + adiag(b) (legacy)
  splu    — sparse-LU Q = L U with rank-r corners (legacy)
  legacy  — original functional kernels: (dx, dg) dense/Kron variants,
            Woodbury-inverse Newton, UVd with 1st/2nd step normalizers
"""

from . import affine, dense, kron, legacy, lra, splu, xmat
