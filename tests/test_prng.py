"""utils/prng.py: Threefry known-answer vectors, stream/seed behavior,
and the no-jax.random guarantee for the production sampling paths."""

import jax
import jax.numpy as jnp
import numpy as np

from fava_tpu.utils import prng


def test_threefry_known_answers():
    """Random123 KAT vectors for Threefry-2x32, 20 rounds."""
    x0, x1 = prng.threefry2x32(
        np.uint32(0), np.uint32(0), np.uint32(0), np.uint32(0)
    )
    assert int(x0) == 0x6B200159 and int(x1) == 0x99BA4EFE
    x0, x1 = prng.threefry2x32(
        np.uint32(0x13198A2E),
        np.uint32(0x03707344),
        np.uint32(0x243F6A88),
        np.uint32(0x85A308D3),
    )
    assert int(x0) == 0xC4923A9C and int(x1) == 0x483DF7A0


def test_deterministic_and_stream_independent():
    a = np.asarray(prng.uniform(5, 0, (64,)))
    b = np.asarray(prng.uniform(5, 0, (64,)))
    c = np.asarray(prng.uniform(5, 1, (64,)))
    d = np.asarray(prng.uniform(6, 0, (64,)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)


def test_uniform_range_and_moments():
    u = np.asarray(prng.uniform(0, 0, (1 << 16,)), dtype=np.float64)
    assert (u >= 0.0).all() and (u < 1.0).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.005


def test_uniform_dtype_honored():
    assert prng.uniform(0, 0, (4,), jnp.float32).dtype == jnp.float32
    if jax.config.jax_enable_x64:
        assert prng.uniform(0, 0, (4,), jnp.float64).dtype == jnp.float64


def test_randint_bounds_and_coverage():
    r = np.asarray(prng.randint(3, 0, (4096,), 17))
    assert r.dtype == np.int32
    assert r.min() >= 0 and r.max() < 17
    assert len(np.unique(r)) == 17  # every bucket hit at this sample size


def test_in_jit_with_traced_seed():
    @jax.jit
    def draw(seed):
        return prng.uniform(seed, 2, (8, 8))

    a = np.asarray(draw(jnp.asarray(np.uint32(9))))
    b = np.asarray(prng.uniform(9, 2, (8, 8)))
    np.testing.assert_array_equal(a, b)


def test_counter_space_guard():
    import pytest

    with pytest.raises(ValueError, match="counter space"):
        prng.random_bits(0, 0, (1 << 17, 1 << 16))


def test_structure_module_avoids_jax_random():
    """ops/structure.py must not touch jax.random: its first dispatch
    stalls minutes uncached on the tunnel backend (VERDICT r3 weak #2)."""
    import inspect
    import re

    import fava_tpu.ops.structure as st

    assert not re.search(r"jax\.random\.\w", inspect.getsource(st))
