"""RNG bit-exactness: jnp vs NumPy implementations vs hand-computed values
(reference semantics: surf_math.cpp:31-95)."""

import jax.numpy as jnp
import numpy as np

from surf_tpu.core import rng
from surf_tpu.reference import rng_np


def _xorshift_py(s):
    m = 0xFFFFFFFF
    s ^= (s << 13) & m
    s ^= s >> 17
    s ^= (s << 5) & m
    return s


def _wang_py(s):
    m = 0xFFFFFFFF
    s = (s ^ 61) ^ (s >> 16)
    s = (s * 9) & m
    s = s ^ (s >> 4)
    s = (s * 0x27D4EB2D) & m
    s = s ^ (s >> 15)
    return s


SEEDS = np.array([1, 2, 3, 12345, 0xDEADBEEF, 0x7FFFFFFF, 4294967295], np.uint32)


def test_xorshift_matches_python():
    expected = np.array([_xorshift_py(int(s)) for s in SEEDS], np.uint32)
    assert np.array_equal(np.asarray(rng.xorshift32(jnp.asarray(SEEDS))), expected)
    assert np.array_equal(rng_np.xorshift32(SEEDS.copy()), expected)


def test_wang_hash_matches_python():
    expected = np.array([_wang_py(int(s)) for s in SEEDS], np.uint32)
    assert np.array_equal(np.asarray(rng.wang_hash(jnp.asarray(SEEDS))), expected)
    assert np.array_equal(rng_np.wang_hash(SEEDS.copy()), expected)


def test_init_seed():
    # initSeed(seed) = wangHash((seed + 1) * 0x11), surf_math.cpp:44-47
    expected = np.array(
        [_wang_py(((int(s) + 1) * 0x11) & 0xFFFFFFFF) for s in SEEDS], np.uint32
    )
    assert np.array_equal(np.asarray(rng.init_seed(jnp.asarray(SEEDS))), expected)
    assert np.array_equal(rng_np.init_seed(SEEDS.copy()), expected)


def test_pixel_seed_cross_impl():
    idx = np.arange(100, dtype=np.uint32)
    for total in (0, 1, 7, 123456):
        a = np.asarray(rng.pixel_seed(jnp.asarray(idx), total))
        b = rng_np.pixel_seed(idx, total)
        assert np.array_equal(a, b)


def test_f32_conversion():
    s, f = rng.next_f32(jnp.asarray(SEEDS))
    sn, fn = rng_np.next_f32(SEEDS.copy())
    assert np.array_equal(np.asarray(s), sn)
    assert np.array_equal(np.asarray(f), fn)
    assert (fn >= 0).all() and (fn < 1.0).all()


def test_masked_advance():
    mask = jnp.asarray([True, False, True, False, True, False, True])
    s, _ = rng.next_f32_masked(jnp.asarray(SEEDS), mask)
    s = np.asarray(s)
    assert np.array_equal(s[1::2], SEEDS[1::2])  # unmasked lanes unchanged
    assert not np.array_equal(s[::2], SEEDS[::2])


def test_u32_range_bias_replicated():
    # randomRange U32 = (rand + min) % max (surf_math.cpp:92-95)
    s, v = rng.next_u32_range(jnp.asarray(SEEDS), 0, 11)
    sn, vn = rng_np.next_u32_range(SEEDS.copy(), 0, 11)
    assert np.array_equal(np.asarray(v), vn)
    expected = np.array([_xorshift_py(int(x)) % 11 for x in SEEDS], np.uint32)
    assert np.array_equal(vn, expected)


def test_stream_uniformity():
    """Chi-square sanity on the xorshift stream (SURVEY.md §4)."""
    seed = rng_np.init_seed(np.arange(4096))
    vals = []
    for _ in range(16):
        seed, f = rng_np.next_f32(seed)
        vals.append(f)
    vals = np.concatenate(vals)
    hist, _ = np.histogram(vals, bins=64, range=(0, 1))
    expected = len(vals) / 64
    chi2 = ((hist - expected) ** 2 / expected).sum()
    # 63 dof: mean 63, std ~11. Allow wide margin.
    assert chi2 < 150, chi2
