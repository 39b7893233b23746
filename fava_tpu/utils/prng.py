"""Counter-based PRNG in plain XLA integer ops (Threefry-2x32-20).

Why not ``jax.random``: on this backend the first ``jax.random``
dispatch stalls for MINUTES and is not persistently cached (CLAUDE.md;
measured while timing the stage-4 analyses), which would freeze a cold
pipeline stage the moment ``structure_functions`` ran. This module
implements the same Threefry-2x32 block cipher (Salmon et al. 2011,
the algorithm behind ``jax.random``'s default implementation) with
ordinary ``jnp`` uint32 arithmetic — it compiles like any other
elementwise program, hits the persistent XLA compilation cache, and is
deterministic in the same counter-based way: ``(seed, stream,
position)`` fully determine every sample, with no sequential state.

Usable both in-trace (inside jit; shapes static, ``seed`` may be a
traced scalar) and eagerly. Streams decorrelate independent draws that
share a seed (e.g. per-order sampling in the structure functions).

Not a cryptographic RNG as packaged here (20 rounds is the full
cipher, but the uniform conversion keeps only 23 bits); statistical
quality matches ``jax.random``'s threefry for Monte-Carlo use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PARITY = np.uint32(0x1BD11BDA)
# Official Threefry-2x32 rotation schedule (Random123 reference).
_ROTATIONS = ((13, 15, 26, 6), (17, 29, 16, 24))


def _rotl(x, r: int):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds. All args uint32 (arrays broadcast).

    Random123 known-answer vector (zero key, zero counter):

    >>> import numpy as np
    >>> x0, x1 = threefry2x32(np.uint32(0), np.uint32(0), np.uint32(0), np.uint32(0))
    >>> (hex(int(x0)), hex(int(x1)))
    ('0x6b200159', '0x99ba4efe')
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
    x0 = jnp.asarray(x0, jnp.uint32) + ks[0]
    x1 = jnp.asarray(x1, jnp.uint32) + ks[1]
    for d in range(5):
        for r in _ROTATIONS[d % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(d + 1) % 3]
        x1 = x1 + ks[(d + 2) % 3] + np.uint32(d + 1)
    return x0, x1


def _key(seed) -> tuple:
    """64-bit seed -> (hi, lo) uint32 key words.

    Accepts python ints, traced scalars, and pre-split ``(hi, lo)``
    tuples (how jitted callers pass the FULL 64-bit seed through
    uint32 scalar arguments — a single traced uint32 would silently
    collapse the key space to the low word). Matches
    jax.random.PRNGKey's seed split (hi = seed >> 32, lo = low word).
    """
    if isinstance(seed, tuple):
        hi, lo = seed
        return jnp.asarray(hi, jnp.uint32), jnp.asarray(lo, jnp.uint32)
    if isinstance(seed, (int, np.integer)):
        s = int(seed) % (1 << 64)
        return np.uint32(s >> 32), np.uint32(s & 0xFFFFFFFF)
    s = jnp.asarray(seed)
    if s.dtype == jnp.uint32:
        return jnp.zeros((), jnp.uint32), s
    s64 = s.astype(jnp.int64) if jax.config.jax_enable_x64 else s.astype(jnp.int32)
    if jax.config.jax_enable_x64:
        return (
            jnp.right_shift(s64, 32).astype(jnp.uint32),
            (s64 & 0xFFFFFFFF).astype(jnp.uint32),
        )
    return jnp.zeros((), jnp.uint32), s64.astype(jnp.uint32)


def random_bits(seed, stream, shape) -> jax.Array:
    """uint32 random words of ``shape``: position-indexed counter words.

    ``stream`` (uint32, scalar or broadcastable array — may be traced)
    selects an independent sequence for the same seed.
    """
    n = int(np.prod(shape)) if shape else 1
    if n >= (1 << 32):
        raise ValueError(f"shape {shape} exceeds the 2^32 counter space of one stream")
    k0, k1 = _key(seed)
    ctr = jax.lax.iota(jnp.uint32, n).reshape(shape)
    x0, _ = threefry2x32(k0, k1, ctr, jnp.asarray(stream, jnp.uint32))
    return x0


def uniform(seed, stream, shape, dtype=jnp.float32) -> jax.Array:
    """Uniform [0, 1) samples (23 random bits; cast to ``dtype``)."""
    bits = random_bits(seed, stream, shape)
    f = jax.lax.bitcast_convert_type(
        (bits >> np.uint32(9)) | np.uint32(0x3F800000), jnp.float32
    )
    return (f - np.float32(1.0)).astype(dtype)


def randint(seed, stream, shape, maxval) -> jax.Array:
    """int32 samples in [0, maxval) by modulo (bias < maxval/2^32 —
    negligible for index draws; maxval must be a positive int32)."""
    bits = random_bits(seed, stream, shape)
    m = jnp.asarray(maxval, jnp.uint32)
    return (bits % m).astype(jnp.int32)
