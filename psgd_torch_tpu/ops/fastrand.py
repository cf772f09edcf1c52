"""Fast noise-generation policy for the PSGD hot path.

The whitening updates synthesize a fresh white probe the size of every
gradient tensor each fit step (reference psgd.py:334-336 ``randn_like``).
On GPU that is nearly free (cuRAND); on TPU the default threefry2x32 PRNG
costs dozens of VPU ops per word — profiling the GPT-2 124M Q update shows
~2.5 ms/step (~25%) in threefry ``xor`` fusions alone.

Fast path (TPU only, policy-gated):
  * stacked (per-layer-keyed) draws go through the Pallas hardware-PRNG
    kernel (ops.pallas_kernels.unit_noise), one launch per leaf;
  * unstacked draws use JAX's ``unsafe_rbg`` key impl, which lowers to
    XLA RngBitGenerator (~3x cheaper than threefry).

Distribution under the fast path is uniform(-sqrt3, sqrt3) (zero mean, unit
variance) instead of normal: the whitening math only uses E[v v^H] = I — the
analytic term2 never sees v, and the probe just dithers g at the damping
scale — so any white unit-variance noise is sound and uniform needs no
erfinv.  Determinism: a draw is a pure function of the caller's key(s), so
SPMD replicas and stack shards stay bitwise identical (the property that
replaces the reference DDP wrapper's RNG-state sync,
wrapped_as_torch_optimizer_for_ddp.py:88-104).

Policy: ``None`` (default) = auto — fast path on TPU backends only, so CPU
tests keep the reproducible threefry-normal stream; True/False force.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_USE_FAST_NOISE: bool | None = None
_SQRT3 = 3.0 ** 0.5


def set_fast_noise(enabled: bool | None) -> None:
    """Override the fast-noise policy (None = auto: TPU only)."""
    global _USE_FAST_NOISE
    _USE_FAST_NOISE = enabled


def fast_noise_enabled() -> bool:
    if _USE_FAST_NOISE is not None:
        return _USE_FAST_NOISE
    return jax.default_backend() == "tpu"


def _rbg_key(key: jax.Array) -> jax.Array:
    """Derive an unsafe_rbg key (4x uint32 state) from any PRNG key."""
    data = jax.random.key_data(key).reshape(-1)
    reps = -(-4 // data.size)  # ceil
    return jax.random.wrap_key_data(jnp.tile(data, reps)[:4],
                                    impl="unsafe_rbg")


def unit_noise(key: jax.Array, shape, dtype) -> jax.Array:
    """Zero-mean unit-variance white noise (one key, one draw)."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        rdt = jnp.float32 if dtype == jnp.dtype(jnp.complex64) else jnp.float64
        kr, ki = jax.random.split(key)
        scale = jnp.asarray(2.0 ** -0.5, rdt)
        return (unit_noise(kr, shape, rdt) * scale
                + 1j * unit_noise(ki, shape, rdt) * scale).astype(dtype)
    if not fast_noise_enabled():
        return jax.random.normal(key, shape, dtype)
    return jax.random.uniform(_rbg_key(key), shape, dtype,
                              minval=-_SQRT3, maxval=_SQRT3)


def unit_noise_stacked(keys: jax.Array, shape, dtype) -> jax.Array:
    """(B,)+shape white noise where batch element i's stream depends only on
    keys[i] — safe to compute shard-locally for a layer-sharded stack.

    TPU fast path: per-layer seeds + one Pallas hardware-PRNG launch
    (vmapping an XLA RngBitGenerator or a pallas_call serializes into a
    per-layer loop — measured ~26 us/launch x n_layer; this is one launch).
    """
    dtype = jnp.dtype(dtype)
    from .pallas_kernels import key_seed_words, \
        unit_noise as pallas_noise, unit_noise_supported
    if (fast_noise_enabled() and unit_noise_supported(shape, dtype)
            and jax.default_backend() == "tpu"):
        seeds = key_seed_words(keys)
        c = shape[-1]
        r = 1
        for s in shape[:-1]:
            r *= s
        out = pallas_noise(seeds, max(r, 1), c, dtype)
        return out.reshape((keys.shape[0],) + tuple(shape))
    return jax.vmap(lambda k: unit_noise(k, shape, dtype))(keys)


def normal_like(key: jax.Array, x: jax.Array) -> jax.Array:
    return unit_noise(key, x.shape, x.dtype)
