"""Property fuzz over the transform dispatch seams: arbitrary parameter
pytrees (scalars, vectors, size-1 dims, high-rank tensors, mixed dtypes)
x dQ geometries must init/update/apply without shape or dtype breakage.

The reference accepts any tensor ndim <= 26 with per-dim dense/diag factor
choice (psgd.py:161-263); these tests pin the same contract through the
public optax transforms, where the seams live (leaf_view reshapes, scanned
masks, plan/state zip alignment, complex handling, L fp32 policy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import psgd_torch_tpu.optim as popt

DQS = ["Q0.5EQ1.5", "QUAD", "QEQ", "QEP", "EQ", "PRO4P", "QUAD4P"]


def _tree(key, specs):
    """specs: list of (shape, dtype) -> dict pytree of random leaves."""
    out = {}
    for i, (shape, dtype) in enumerate(specs):
        k = jax.random.fold_in(key, i)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            out[f"p{i}"] = (jax.random.normal(k, shape)
                            + 1j * jax.random.normal(jax.random.fold_in(k, 1),
                                                     shape)).astype(dtype)
        else:
            out[f"p{i}"] = jax.random.normal(k, shape, dtype)
    return out


ZOO = [
    ((), jnp.float32),            # scalar param (psgd.py:189-195)
    ((1,), jnp.float32),          # size-1 vector -> squeezed to scalar-ish
    ((5,), jnp.float32),
    ((3, 1, 4), jnp.float32),     # interior size-1 dim squeezed
    ((2, 3, 4, 2), jnp.float32),  # rank-4
    ((6, 2), jnp.bfloat16),       # bf16 param
]


@pytest.mark.parametrize("dq", DQS)
def test_kron_whiten_fuzz_zoo(dq):
    params = _tree(jax.random.key(0), ZOO)
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0, dq=dq)
    state = tx.init(params)

    @jax.jit
    def step(g, s):
        return tx.update(g, s)

    grads = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p) * jnp.asarray(0.1, p.dtype), params)
    for _ in range(3):
        u, state = step(grads, state)
    for k in params:
        assert u[k].shape == params[k].shape
        assert u[k].dtype == params[k].dtype
        assert bool(jnp.all(jnp.isfinite(u[k].astype(jnp.float32))))
    # L constants stay fp32 even for bf16 leaves (lift2single policy)
    for st in state.precond:
        for lip in st.lips:
            assert lip.dtype == jnp.float32


@pytest.mark.parametrize("dq", ["Q0.5EQ1.5", "QUAD"])
def test_kron_newton_fuzz_zoo(dq):
    params = _tree(jax.random.key(1), ZOO[:5])
    tx = popt.scale_by_kron_newton(preconditioner_init_scale=1.0, dq=dq)
    state = tx.init(params)

    def loss_fn(p):
        return sum(jnp.sum(jnp.real(x.astype(jnp.float32)) ** 2)
                   for x in jax.tree_util.tree_leaves(p)) / 2

    grads = jax.grad(loss_fn)(params)
    u, state = jax.jit(lambda g, s, p: tx.update(
        g, s, p, hvp_fn=popt.make_hvp_fn(loss_fn)))(grads, state, params)
    for k in params:
        assert u[k].shape == params[k].shape
        assert bool(jnp.all(jnp.isfinite(u[k].astype(jnp.float32))))


def test_complex_leaf_through_transform():
    """Complex parameters ride the whiten transform end to end (the
    reference supports complex tensors throughout, psgd.py:647-650)."""
    params = {"c": (jax.random.normal(jax.random.key(2), (4, 3))
                    + 1j * jax.random.normal(jax.random.key(3), (4, 3))
                    ).astype(jnp.complex64),
              "r": jax.random.normal(jax.random.key(4), (5,))}
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0)
    state = tx.init(params)
    g = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
    for _ in range(3):
        u, state = jax.jit(tx.update)(g, state)
    assert u["c"].dtype == jnp.complex64
    assert bool(jnp.all(jnp.isfinite(jnp.abs(u["c"]))))


def test_mixed_scanned_and_plain_leaves():
    """A scanned stack, a plain matrix, and a scalar in one tree."""
    params = {"stack": jax.random.normal(jax.random.key(5), (4, 3, 2)),
              "w": jax.random.normal(jax.random.key(6), (2, 3)),
              "s": jnp.asarray(0.7)}
    mask = {"stack": True, "w": False, "s": False}
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0,
                                   scanned_layers=mask)
    state = tx.init(params)
    g = jax.tree_util.tree_map(lambda p: 0.1 * jnp.ones_like(p), params)
    u, state = jax.jit(tx.update)(g, state)
    assert u["stack"].shape == (4, 3, 2)
    assert u["s"].shape == ()


def test_27_dim_tensor_rejected():
    # the reference rejects > 26 dims (psgd.py:197-198); here size-1 dims
    # are squeezed first, so use a genuinely-27-dim shape — via eval_shape
    # so the 2^27-element tensor is never materialized
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0)
    params = {"w": jax.ShapeDtypeStruct((2,) * 27, jnp.float32)}
    with pytest.raises(ValueError):
        jax.eval_shape(tx.init, params)


def test_empty_and_nested_pytree_containers():
    params = {"a": {"b": [jnp.ones((3, 2)), jnp.ones((2,))]},
              "empty": {}}
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0)
    state = tx.init(params)
    g = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
    u, _ = jax.jit(tx.update)(g, state)
    assert u["a"]["b"][0].shape == (3, 2)


@pytest.mark.parametrize("rank", [0, 2])
def test_lra_fuzz_mixed_tree(rank):
    params = _tree(jax.random.key(7), ZOO[:4])
    tx = popt.scale_by_lra_whiten(rank_of_approximation=rank,
                                  preconditioner_init_scale=1.0)
    state = tx.init(params)
    g = jax.tree_util.tree_map(lambda p: 0.1 * jnp.ones_like(p), params)
    for _ in range(2):
        u, state = jax.jit(tx.update)(g, state)
    for k in params:
        assert u[k].shape == params[k].shape
        assert bool(jnp.all(jnp.isfinite(u[k].astype(jnp.float32))))


def test_update_is_pure_and_donation_safe():
    """Calling update twice with the same inputs gives identical results
    (purity), and the state round-trips through flatten/unflatten (what
    orbax and jit donation rely on)."""
    params = _tree(jax.random.key(8), ZOO[:4])
    tx = popt.scale_by_kron_whiten(preconditioner_init_scale=1.0)
    state = tx.init(params)
    g = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
    u1, s1 = jax.jit(tx.update)(g, state)
    u2, s2 = jax.jit(tx.update)(g, state)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    leaves, treedef = jax.tree_util.tree_flatten(s1)
    s1rt = jax.tree_util.tree_unflatten(treedef, leaves)
    u3, _ = jax.jit(tx.update)(g, s1rt)
    for a, b in zip(jax.tree_util.tree_leaves(u3),
                    jax.tree_util.tree_leaves(jax.jit(tx.update)(g, s1)[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
