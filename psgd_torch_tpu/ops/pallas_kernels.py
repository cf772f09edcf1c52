"""Pallas TPU kernels for the PSGD hot path.

``fused_ns_update`` fuses one whole matrix-factor Q update of the default
Q0.5EQ1.5 geometry (reference psgd.py:394-419 inner loop) into a single MXU
kernel per (layer-stacked) factor:

    ell   = norm_lower_bound_spd(term1) + term2          (psgd.py:413)
    L'    = max(betaL L + (1 - betaL) ell, ell)          (psgd.py:414)
    q1    = q - lr/L' (term1 @ q - term2 q)              (psgd.py:415)
    q'    = procrustes_step2(q1)                         (psgd.py:101-124)

Everything stays in VMEM between the ~3 full and ~8 thin matmuls — the XLA
path writes each (n, n) intermediate back to HBM between dots, and for
transformer-sized factors (n = 768..2304) the Q update is HBM-bound, not
FLOP-bound.  The subspace-iteration norm bounds use the in-kernel PRNG
(pltpu.prng_*).

Constraints: real dtypes (fp32/bf16 inputs, fp32 compute), n a multiple of
128.  The monolithic kernel holds ~7 n x n fp32 intermediates and compiles
to n <= 1536 (measured on v5e, bf16, layer-batched: 5.2x the XLA path at
n=768, 1.6-2.2x at 1024-1536, 70-100% of the analytical-FLOPs roofline);
1536 < n <= 2048 goes through a two-kernel split (bound+step | procrustes,
<= ~4 n x n live each, one q1 HBM round-trip; 74% MFU, 1.9x XLA); wider
factors to 4096 bf16 / 3072 f32 through the tiled six-kernel path
(row-block streaming; 62% MFU @3072, 68% @4096, 1.27-1.32x
the XLA fallback's ~49-52%; results/ns_widths_bf16.json).  Above the
envelope callers fall back to the plain XLA path (the big matmuls run at
peak, the bounds/transpose epilogues pay extra HBM passes, and the gap
shrinks as the 6 n^3 MXU work outgrows the O(n^2) epilogues; see
tools/bench_ns_widths.py).  precond.kron falls back automatically;
tests/test_pallas_kernels.py checks parity and the fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NORM_K = 32  # subspace dim for the in-kernel norm bounds


def _row_norms(v):
    return jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))


def _dot(x, y, mxu_bf16: bool):
    """MXU dot with f32 accumulation; bf16 operands when the caller's Q
    lives in bf16 anyway (the reference's bf16 operating point runs the
    whole update in bf16 — README.md:10 — so bf16 products lose nothing,
    and f32 x f32 runs at half MXU rate)."""
    if mxu_bf16:
        x, y = x.astype(jnp.bfloat16), y.astype(jnp.bfloat16)
    return jnp.dot(x, y, preferred_element_type=jnp.float32)


def _subspace_bound(a, normalizer, k: int, tiny: float, mxu_bf16: bool):
    """Norm lower bound via 2 half-iterations of subspace iteration, with the
    initial space rotated toward the largest row (reference psgd.py:46-68)."""
    n = a.shape[0]
    a = a / normalizer
    j = jnp.argmax(jnp.sum(a * a, axis=1))
    # row gather without dynamic_slice (unsupported in Mosaic): masked sum
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    aj = jnp.sum(jnp.where(rows == j, a, 0.0), axis=0).reshape(1, n)
    bits = pltpu.prng_random_bits((k, n))
    # uniform(1, 2) from mantissa bits -> N-ish via sum? cheap approach:
    # map bits to uniform(-1, 1); adequate for a rough norm bound.
    u = pltpu.bitcast((bits & 0x7FFFFF) | 0x3F800000, jnp.float32) - 1.5
    v = u * 2.0
    s = jnp.sum(aj * v, axis=1, keepdims=True)
    sgn = jnp.where(s >= 0, 1.0, -1.0)
    v = aj + sgn * v
    for _ in range(2):
        v = _dot(v, a, mxu_bf16)
        v = v / (_row_norms(v) + tiny)
        v = _dot(v, a, mxu_bf16)
    return normalizer * jnp.max(_row_norms(v))


def _trace(m):
    n = m.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.sum(jnp.where(row == col, m, 0.0))


def _ns_kernel(seed_ref, *refs, max_step: float, k: int,
               has_step_mat: bool, mxu_bf16: bool):
    if has_step_mat:
        (ell_ref, step_ref, q_ref, lips_ref, term2_ref, lr_ref, bl_ref,
         q_out_ref, lips_out_ref) = refs
    else:
        (ell_ref, q_ref, lips_ref, term2_ref, lr_ref, bl_ref,
         q_out_ref, lips_out_ref) = refs
        step_ref = ell_ref
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i, 0], seed_ref[i, 1])
    tiny = 1e-30
    lr = lr_ref[0]
    beta_l = bl_ref[0]

    t_ell = ell_ref[:].astype(jnp.float32)
    q = q_ref[:].astype(jnp.float32)
    term2 = term2_ref[i]
    lips = lips_ref[i]

    # ell = norm_lower_bound_spd(ell_mat) + term2; SPD normalizer = max diag
    n = t_ell.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    diag_max = jnp.max(jnp.where(row == col, t_ell, -jnp.inf))
    ell = _subspace_bound(t_ell, diag_max + tiny, k, tiny, mxu_bf16) + term2

    new_lips = jnp.maximum(beta_l * lips + (1.0 - beta_l) * ell, ell)
    coeff = lr / new_lips

    # q1 = q - coeff (step_mat @ q - term2 q)
    t_step = t_ell if not has_step_mat else step_ref[:].astype(jnp.float32)
    q1 = q - coeff * (_dot(t_step, q, mxu_bf16) - term2 * q)

    # procrustes_step2 (reference psgd.py:101-124)
    r = q1.T - q1
    r_max = jnp.max(jnp.abs(r))
    r = r / ((_subspace_bound(r, r_max + tiny, k, tiny, mxu_bf16)) + tiny)
    rq = _dot(r, q1, mxu_bf16)
    rrq = _dot(r, rq, mxu_bf16)
    tr_rq = _trace(rq)
    tr_rrq = _trace(rrq)
    safe_den = jnp.where(tr_rrq < 0, tr_rrq, -1.0)
    a = jnp.where(tr_rrq < 0, jnp.minimum(-tr_rq / safe_den, max_step), max_step)
    q2 = q1 + a * (rq + (0.5 * a) * rrq)

    q_out_ref[:] = q2.astype(q_out_ref.dtype)
    lips_out_ref[i] = new_lips


def fused_ns_update(term1: jax.Array, q: jax.Array, lips: jax.Array,
                    term2: jax.Array, seed: jax.Array, lr: float,
                    beta_l: float, max_step: float = 1 / 8,
                    k: int = NORM_K,
                    step_mat: jax.Array | None = None
                    ) -> Tuple[jax.Array, jax.Array]:
    """Batched fused Q0.5EQ1.5 matrix-factor update.

    Args:
      term1: (B, n, n) matrix whose spectral-norm bound gives ell
             (whiten: exprGs(Pg, Pg); Newton: term1 + term2_mat).
      q:     (B, n, n) current factor.
      lips:  (B,) float32 L-constants.
      term2: (B,) float32 scalar subtracted as term2*I in the step
             (whiten: numel/n; Newton: 0).
      seed:  (B, 2) int32 PRNG seed words (both words of the caller's key —
             see key_seed_words — so the full 64-bit key space is used).
      step_mat: optional (B, n, n) step matrix when it differs from term1
             (Newton: term1 - term2_mat).
      lr, beta_l: python floats or traced scalars (schedule-compatible).
    Returns (new_q (B, n, n), new_lips (B,)).
    """
    b, n, _ = term1.shape
    from .linalg import width_norm_k
    k = width_norm_k(k, n)   # same wide-factor floor as the XLA bounds
    is_bf16 = jnp.dtype(q.dtype) == jnp.dtype(jnp.bfloat16)
    if n > (_NS_SINGLE_MAX if is_bf16 else _NS_SINGLE_MAX_F32):
        split_max = _NS_SPLIT_MAX if is_bf16 else _NS_SPLIT_MAX_F32
        if n <= split_max:
            # two-kernel split (bound+step | procrustes)
            return _split_ns_update(term1, q, lips, term2, seed, lr, beta_l,
                                    max_step, k, step_mat)
        # six-kernel row-block-tiled path (full matrices stay in HBM)
        return _tiled_ns_update(term1, q, lips, term2, seed, lr, beta_l,
                                max_step, k, step_mat)
    has_step = step_mat is not None
    kernel = functools.partial(_ns_kernel,
                               max_step=float(max_step), k=k,
                               has_step_mat=has_step,
                               mxu_bf16=(jnp.dtype(q.dtype) ==
                                         jnp.dtype(jnp.bfloat16)))
    mat_spec = pl.BlockSpec((1, n, n), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [mat_spec] + ([mat_spec] if has_step else []) + \
        [mat_spec, smem, smem, smem, smem]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,), in_specs=in_specs,
        out_specs=[mat_spec, smem])

    def kernel3d(seed_ref, *refs):
        squeezed = [r.at[0] if r.shape[:1] == (1,) and len(r.shape) == 3 else r
                    for r in refs]
        kernel(seed_ref, *squeezed)

    operands = [term1] + ([step_mat] if has_step else []) + \
        [q, lips.astype(jnp.float32), term2.astype(jnp.float32),
         jnp.asarray(lr, jnp.float32).reshape(1),
         jnp.asarray(beta_l, jnp.float32).reshape(1)]
    new_q, new_l = pl.pallas_call(
        kernel3d,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, n, n), q.dtype),
                   jax.ShapeDtypeStruct((b,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed.astype(jnp.int32), *operands)
    return new_q, new_l


# Per-path width caps, set by what actually compiles on v5e (probed per
# dtype; the f32 inputs add ~3 n^2 x 4 B of resident operands on top of the
# fp32 working set, so every f32 cap sits one width notch below bf16):
_NS_SINGLE_MAX = 1536       # one fused kernel: ~7 n^2 fp32 live in VMEM
_NS_SINGLE_MAX_F32 = 1280   # f32 monolith: 1280 compiles, 1536 does not
_NS_SPLIT_MAX = 2048        # two-kernel split: <= ~4 n^2 fp32 live per kernel
_NS_SPLIT_MAX_F32 = 1536    # f32 split: 1536 compiles, 2048 does not


def _ns_step_kernel(seed_ref, *refs, k: int, has_step_mat: bool,
                    mxu_bf16: bool):
    """Stage 1 of the split NS update: bound + L + linear step -> q1.
    Live set ~3 n x n fp32 (term1, q, q1), so it compiles to ~2x the
    single-kernel width."""
    if has_step_mat:
        (ell_ref, step_ref, q_ref, lips_ref, term2_ref, lr_ref, bl_ref,
         q1_out_ref, lips_out_ref) = refs
    else:
        (ell_ref, q_ref, lips_ref, term2_ref, lr_ref, bl_ref,
         q1_out_ref, lips_out_ref) = refs
        step_ref = ell_ref
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i, 0], seed_ref[i, 1])
    tiny = 1e-30
    t_ell = ell_ref[:].astype(jnp.float32)
    q = q_ref[:].astype(jnp.float32)
    term2 = term2_ref[i]
    lips = lips_ref[i]

    n = t_ell.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    diag_max = jnp.max(jnp.where(row == col, t_ell, -jnp.inf))
    ell = _subspace_bound(t_ell, diag_max + tiny, k, tiny, mxu_bf16) + term2

    new_lips = jnp.maximum(bl_ref[0] * lips + (1.0 - bl_ref[0]) * ell, ell)
    coeff = lr_ref[0] / new_lips
    t_step = t_ell if not has_step_mat else step_ref[:].astype(jnp.float32)
    q1 = q - coeff * (_dot(t_step, q, mxu_bf16) - term2 * q)
    q1_out_ref[:] = q1.astype(q1_out_ref.dtype)
    lips_out_ref[i] = new_lips


def _procrustes_kernel(seed_ref, q1_ref, q_out_ref, *, max_step: float,
                       k: int, mxu_bf16: bool):
    """Stage 2 of the split NS update: procrustes_step2 on q1.
    Live set ~4 n x n fp32 (q1, r, rq, rrq)."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i, 0], seed_ref[i, 1] ^ jnp.int32(0x5bd1e995))
    tiny = 1e-30
    q1 = q1_ref[:].astype(jnp.float32)
    r = q1.T - q1
    r_max = jnp.max(jnp.abs(r))
    r = r / ((_subspace_bound(r, r_max + tiny, k, tiny, mxu_bf16)) + tiny)
    rq = _dot(r, q1, mxu_bf16)
    rrq = _dot(r, rq, mxu_bf16)
    tr_rq = _trace(rq)
    tr_rrq = _trace(rrq)
    safe_den = jnp.where(tr_rrq < 0, tr_rrq, -1.0)
    a = jnp.where(tr_rrq < 0, jnp.minimum(-tr_rq / safe_den, max_step),
                  max_step)
    q_out_ref[:] = (q1 + a * (rq + (0.5 * a) * rrq)).astype(q_out_ref.dtype)


def _split_ns_update(term1, q, lips, term2, seed, lr, beta_l, max_step,
                     k, step_mat):
    """Two pallas_calls with q1 round-tripping through HBM once (~2 n^2
    extra HBM traffic vs the monolith, negligible beside the 6 n^3 MXU
    work) — extends the fused path to n <= 2048."""
    b, n, _ = term1.shape
    has_step = step_mat is not None
    mxu_bf16 = jnp.dtype(q.dtype) == jnp.dtype(jnp.bfloat16)
    mat_spec = pl.BlockSpec((1, n, n), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def squeeze3d(kernel):
        def k3(seed_ref, *refs):
            squeezed = [r.at[0] if r.shape[:1] == (1,) and len(r.shape) == 3
                        else r for r in refs]
            kernel(seed_ref, *squeezed)
        return k3

    in_specs = [mat_spec] + ([mat_spec] if has_step else []) + \
        [mat_spec, smem, smem, smem, smem]
    operands = [term1] + ([step_mat] if has_step else []) + \
        [q, lips.astype(jnp.float32), term2.astype(jnp.float32),
         jnp.asarray(lr, jnp.float32).reshape(1),
         jnp.asarray(beta_l, jnp.float32).reshape(1)]
    q1, new_l = pl.pallas_call(
        squeeze3d(functools.partial(_ns_step_kernel, k=k,
                                    has_step_mat=has_step,
                                    mxu_bf16=mxu_bf16)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,), in_specs=in_specs,
            out_specs=[mat_spec, smem]),
        out_shape=[jax.ShapeDtypeStruct((b, n, n), q.dtype),
                   jax.ShapeDtypeStruct((b,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed.astype(jnp.int32), *operands)

    new_q = pl.pallas_call(
        squeeze3d(functools.partial(_procrustes_kernel,
                                    max_step=float(max_step), k=k,
                                    mxu_bf16=mxu_bf16)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,), in_specs=[mat_spec],
            out_specs=mat_spec),
        out_shape=jax.ShapeDtypeStruct((b, n, n), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed.astype(jnp.int32), q1)
    return new_q, new_l


# ---------------------------------------------------------------------------
# Tiled NS update (LLaMA-class factor widths).
#
# Past the split envelope even a single (n, n) fp32 no longer fits VMEM
# comfortably (64 MB at n = 4096), so the update is decomposed into six
# small kernels with row-block streaming: the full matrices live in HBM,
# each kernel holds at most one full matrix (in the storage dtype) plus
# O(nb x n) blocks.  Per factor:
#
#   K0  ell = bound_spd(term1)                      [term1 resident]
#       -- scalar glue: L' and lr/L' in XLA --
#   K1  q1 = q - lr/L' (step @ q - term2 q)         [q resident, step rows
#                                                    streamed, f32 accum]
#   K2  r = q1^T - q1                               [block transpose-subtract]
#   K3  rnorm = bound_skh(r)                        [r resident]
#   K4  rq = (r / rnorm) @ q1, tr(rq)               [q1 resident, r streamed,
#                                                    diagonal accumulated]
#   K5  rrq = (r / rnorm) @ rq, tr(rrq)
#       -- scalar glue: procrustes step size a --
#   K6  q' = q1 + a rq + a^2/2 rrq                  [elementwise blocks]
#
# Intermediates are stored in Q's dtype (the bf16 operating point keeps the
# whole update in bf16 — reference README.md:10); thin iterates and matmul
# accumulation stay f32.  HBM traffic is ~15 n^2 passes vs the 6 n^3 MXU
# work, so the path stays compute-bound: measured on v5e (bf16, k=128)
# 62% MFU at n = 3072 and 68% at n = 4096, vs ~49-51% for the XLA fallback
# (results/ns_widths_bf16.json, tools/bench_ns_widths.py).
# ---------------------------------------------------------------------------


def _pick_block(n: int, f32: bool) -> int:
    for nb in ((256, 128) if f32 else (512, 256, 128)):
        if n % nb == 0:
            return nb
    raise ValueError(f"n={n} not a multiple of 128")


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)


def _tiled_bound_kernel(seed_ref, a_ref, out_ref, *, mode: str, k: int,
                        mxu_bf16: bool, tag: int):
    """Subspace-iteration norm lower bound with the full matrix resident in
    its storage dtype; only the thin (k, n) iterate is f32.  Dividing the
    iterate by the normalizer after every product is algebraically identical
    to normalizing the matrix up front (each row normalization is
    scale-invariant), without materializing an (n, n) f32 copy."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i, 0], seed_ref[i, 1] ^ jnp.int32(tag))
    tiny = 1e-30
    a = a_ref[0]
    n = a.shape[0]
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    neg_inf = jnp.asarray(-jnp.inf, a.dtype)

    def scalar_max(m):
        # Mosaic scalarizes only 32-bit types: rowwise-reduce in the
        # storage dtype (no (n, n) f32 temp), cast the (n, 1), then max
        return jnp.max(jnp.max(m, axis=1, keepdims=True).astype(jnp.float32))

    if mode == "spd":
        s = scalar_max(jnp.where(rows1 == cols1, a, neg_inf)) + tiny
    else:  # skew-Hermitian: normalizer = max |a|
        s = scalar_max(jnp.abs(a)) + tiny
    # largest-row rotation of the initial subspace (reference psgd.py:46-68);
    # row energies in the storage dtype are plenty for picking a row
    energy = jnp.sum(a * a, axis=1, keepdims=True).astype(jnp.float32)
    j = jnp.min(jnp.where(energy == jnp.max(energy), rows1, n))
    onehot = (cols1 == j).astype(a.dtype)
    aj = _dot(onehot, a, mxu_bf16) / s           # (1, n) f32
    bits = pltpu.prng_random_bits((k, n))
    u = pltpu.bitcast((bits & 0x7FFFFF) | 0x3F800000, jnp.float32) - 1.5
    v = u * 2.0
    sgn = jnp.where(jnp.sum(aj * v, axis=1, keepdims=True) >= 0, 1.0, -1.0)
    v = aj + sgn * v
    for _ in range(2):
        v = _dot(v, a, mxu_bf16) / s
        v = v / (_row_norms(v) + tiny)
        v = _dot(v, a, mxu_bf16) / s
    out_ref[i] = s * jnp.max(_row_norms(v))


def _tiled_bound(mat, seed, *, mode: str, k: int, mxu_bf16: bool, tag: int):
    b, n, _ = mat.shape
    mat_spec = pl.BlockSpec((1, n, n), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tiled_bound_kernel, mode=mode, k=k,
                          mxu_bf16=mxu_bf16, tag=tag),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,), in_specs=[mat_spec],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=jax.ShapeDtypeStruct((b,), jnp.float32),
        compiler_params=_vmem_params(),
    )(seed, mat)


def _tiled_step_kernel(a_ref, bfull_ref, qrow_ref, coeff_ref, term2_ref,
                       out_ref, *, mxu_bf16: bool):
    i = pl.program_id(0)
    prod = _dot(a_ref[0], bfull_ref[0], mxu_bf16)       # (nb, n) f32
    qrow = qrow_ref[0].astype(jnp.float32)
    out = qrow - coeff_ref[i] * (prod - term2_ref[i] * qrow)
    out_ref[0] = out.astype(out_ref.dtype)


def _tiled_tsub_kernel(xt_ref, x_ref, out_ref):
    xt = xt_ref[0]
    out_ref[0] = (xt.T - x_ref[0].astype(xt.dtype)).astype(out_ref.dtype)


def _tiled_smm_kernel(a_ref, bfull_ref, inv_ref, out_ref, tr_ref, *,
                      mxu_bf16: bool, nb: int):
    i, j = pl.program_id(0), pl.program_id(1)
    prod = _dot(a_ref[0], bfull_ref[0], mxu_bf16) * inv_ref[i]
    out_ref[0] = prod.astype(out_ref.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0) + j * nb
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, prod.shape[1]), 1)
    local = jnp.sum(jnp.where(rows == cols, prod, 0.0))

    @pl.when(j == 0)
    def _init():
        tr_ref[i] = 0.0

    tr_ref[i] += local


def _tiled_combine_kernel(q1_ref, rq_ref, rrq_ref, a_ref, out_ref):
    i = pl.program_id(0)
    a = a_ref[i]
    q1 = q1_ref[0].astype(jnp.float32)
    rq = rq_ref[0].astype(jnp.float32)
    rrq = rrq_ref[0].astype(jnp.float32)
    out_ref[0] = (q1 + a * rq + (0.5 * a * a) * rrq).astype(out_ref.dtype)


def _tiled_ns_update(term1, q, lips, term2, seed, lr, beta_l, max_step,
                     k, step_mat):
    b, n, _ = term1.shape
    dt = q.dtype
    is_f32 = jnp.dtype(dt) == jnp.dtype(jnp.float32)
    mxu_bf16 = jnp.dtype(dt) == jnp.dtype(jnp.bfloat16)
    nb = _pick_block(n, is_f32)
    nblk = n // nb
    f32 = jnp.float32
    tiny = 1e-30
    seed = seed.astype(jnp.int32)
    lips = lips.astype(f32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    resident = pl.BlockSpec((1, n, n), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    rowblk = pl.BlockSpec((1, nb, n), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)

    # K0 + scalar glue
    ell = _tiled_bound(term1, seed, mode="spd", k=k, mxu_bf16=mxu_bf16,
                       tag=0) + term2.astype(f32)
    new_l = jnp.maximum(beta_l * lips + (1.0 - beta_l) * ell, ell)
    coeff = (jnp.asarray(lr, f32) / new_l).astype(f32)

    # K1: q1 = q - coeff (step @ q - term2 q)
    step_in = term1 if step_mat is None else step_mat
    q1 = pl.pallas_call(
        functools.partial(_tiled_step_kernel, mxu_bf16=mxu_bf16),
        grid=(b, nblk),
        in_specs=[rowblk, resident, rowblk, smem, smem],
        out_specs=rowblk,
        out_shape=jax.ShapeDtypeStruct((b, n, n), dt),
        compiler_params=_vmem_params(),
    )(step_in, q, q, coeff, term2.astype(f32))

    # K2: r = q1^T - q1 (block transpose-subtract)
    sq = pl.BlockSpec((1, nb, nb), lambda i, bi, bj: (i, bi, bj),
                      memory_space=pltpu.VMEM)
    sq_t = pl.BlockSpec((1, nb, nb), lambda i, bi, bj: (i, bj, bi),
                        memory_space=pltpu.VMEM)
    r = pl.pallas_call(
        _tiled_tsub_kernel,
        grid=(b, nblk, nblk),
        in_specs=[sq_t, sq],
        out_specs=sq,
        out_shape=jax.ShapeDtypeStruct((b, n, n), dt),
        compiler_params=_vmem_params(),
    )(q1, q1)

    # K3 + glue: normalize R by its norm lower bound
    rnorm = _tiled_bound(r, seed, mode="skh", k=k, mxu_bf16=mxu_bf16,
                         tag=0x5BD1E995)
    inv = (1.0 / (rnorm + tiny)).astype(f32)

    def scaled_matmul_trace(a_mat, b_mat):
        return pl.pallas_call(
            functools.partial(_tiled_smm_kernel, mxu_bf16=mxu_bf16, nb=nb),
            grid=(b, nblk),
            in_specs=[rowblk, resident, smem],
            out_specs=[rowblk, smem],
            out_shape=[jax.ShapeDtypeStruct((b, n, n), dt),
                       jax.ShapeDtypeStruct((b,), f32)],
            compiler_params=_vmem_params(),
        )(a_mat, b_mat, inv)

    # K4/K5: rq = (r/rnorm) @ q1 with tr(rq); rrq = (r/rnorm) @ rq with tr(rrq)
    rq, tr_rq = scaled_matmul_trace(r, q1)
    rrq, tr_rrq = scaled_matmul_trace(r, rq)

    safe_den = jnp.where(tr_rrq < 0, tr_rrq, -1.0)
    a_step = jnp.where(tr_rrq < 0,
                       jnp.minimum(-tr_rq / safe_den, max_step),
                       max_step).astype(f32)

    # K6: q' = q1 + a rq + a^2/2 rrq
    new_q = pl.pallas_call(
        _tiled_combine_kernel,
        grid=(b, nblk),
        in_specs=[rowblk, rowblk, rowblk, smem],
        out_specs=rowblk,
        out_shape=jax.ShapeDtypeStruct((b, n, n), dt),
        compiler_params=_vmem_params(),
    )(q1, rq, rrq, a_step)
    return new_q, new_l


_NS_TILED_MAX_BF16 = 4096   # resident bf16 matrix 32 MB; row blocks streamed
_NS_TILED_MAX_F32 = 3072    # resident f32 matrix 36 MB


def ns_update_supported(n: int, dtype) -> bool:
    """Whether the fused kernel path handles this factor: the monolithic
    kernel to n <= 1536 bf16 / 1280 f32 (measured 1.6-5.2x the XLA path on
    v5e), the two-kernel split to n <= 2048 bf16 / 1536 f32 (74% MFU bf16,
    1.9x the XLA path; the wider f32 working sets exceed VMEM — probed per
    width on v5e), and the tiled six-kernel path to n <= 4096 bf16 /
    3072 f32 (row-block streaming; 62-68% MFU where the XLA fallback runs
    ~49-52%).  Above the envelope callers fall back to XLA (measured at
    n = 8192 bf16 — see results/ns_widths_bf16.json)."""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    max_n = (_NS_TILED_MAX_BF16 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16)
             else _NS_TILED_MAX_F32)
    return n % 128 == 0 and 128 <= n <= max_n


# ---------------------------------------------------------------------------
# In-kernel noise generation (the whitening damping probe).
#
# The whiten updates synthesize noise the size of every gradient each fit
# step (reference psgd.py:334-336).  The default threefry PRNG costs ~2.5 ms
# per GPT-2 124M step on TPU; the TPU hardware PRNG (pltpu.prng_*) makes it
# nearly free.  Noise is seeded PER BATCH ELEMENT (per layer of a stacked
# leaf), so a layer's stream depends only on its own seed — stack-sharded
# and replicated runs stay bitwise identical (each shard generates its local
# layers' noise from the same per-layer seeds).
#
# Distribution: uniform(-sqrt(3), sqrt(3)) — zero mean, unit variance.  The
# whitening math only uses E[v v^H] = I (the analytically integrated term2
# does not depend on v's higher moments; the probe merely dithers g by
# ~damping), so any white unit-variance noise is sound; uniform needs no
# erfinv.  Same argument as the in-kernel norm-bound subspace init above.
# ---------------------------------------------------------------------------

_SQRT3 = 3.0 ** 0.5


def _uniform_from_bits(bits):
    """Map random int32 bits to uniform(-sqrt3, sqrt3) float32 (mantissa
    trick: [1, 2) - 1.5 gives uniform(-.5, .5))."""
    u = pltpu.bitcast((bits & 0x7FFFFF) | 0x3F800000, jnp.float32)
    return (u - 1.5) * (2.0 * _SQRT3)


def _noise_kernel(seed_ref, o_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Mosaic allows at most 2 seed words: mix the row-block index into the
    # second word (golden-ratio odd constant, wrapping int32 multiply)
    jmix = j * jnp.int32(-1640531527)
    pltpu.prng_seed(seed_ref[i, 0], seed_ref[i, 1] ^ jmix)
    bits = pltpu.prng_random_bits(o_ref.shape[1:])
    o_ref[0] = _uniform_from_bits(bits).astype(o_ref.dtype)


def key_seed_words(keys: jax.Array) -> jax.Array:
    """(..., 2) int32 hardware-PRNG seed words from PRNG keys: the raw key
    data itself (threefry keys are exactly 2x uint32), so the effective seed
    space is the full 64-bit key — no 31-bit birthday collisions over long
    runs — and deriving it costs no PRNG work at all."""
    data = jax.random.key_data(keys)
    if data.shape[-1] >= 2:
        d2 = data[..., :2]
    else:
        d2 = jnp.concatenate([data, data], axis=-1)
    return jax.lax.bitcast_convert_type(d2.astype(jnp.uint32), jnp.int32)


def unit_noise(seeds: jax.Array, r: int, c: int, dtype) -> jax.Array:
    """(B, r, c) zero-mean unit-variance noise; row i's stream is a pure
    function of seeds[i] (a 2-word int32 seed).  TPU hardware PRNG, blocked
    over rows."""
    b = seeds.shape[0]
    # block rows: multiple of 8, <= ~8 MB fp32 per block (or the whole dim)
    rb = max(8, ((1 << 21) // c) // 8 * 8)
    rb = r if r <= rb else rb
    grid = (b, -(-r // rb))
    out = pl.pallas_call(
        _noise_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[],
            out_specs=pl.BlockSpec((1, rb, c), lambda i, j, s: (i, j, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((b, r, c), dtype),
    )(seeds.astype(jnp.int32))
    return out


def unit_noise_supported(shape, dtype) -> bool:
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    if len(shape) == 0:
        return False
    c = shape[-1]
    return c % 128 == 0
