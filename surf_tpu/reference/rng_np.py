"""NumPy implementation of the reference RNG — independent of core/rng (jnp)
so the two can be cross-checked bit-for-bit in tests.

Replicates /root/reference/sources/surf_math.cpp:31-95.
"""

from __future__ import annotations

import numpy as np

M32 = np.uint32(0xFFFFFFFF)
U32_TO_FLOAT_SCALE = np.float32(2.3283064365387e-10)


def wang_hash(seed):
    with np.errstate(over="ignore"):
        seed = np.uint32(seed) if np.isscalar(seed) else seed.astype(np.uint32)
        seed = (seed ^ np.uint32(61)) ^ (seed >> np.uint32(16))
        seed = (seed * np.uint32(9)).astype(np.uint32)
        seed = seed ^ (seed >> np.uint32(4))
        seed = (seed * np.uint32(0x27D4EB2D)).astype(np.uint32)
        seed = seed ^ (seed >> np.uint32(15))
    return seed


def init_seed(index):
    with np.errstate(over="ignore"):
        idx = np.asarray(index).astype(np.uint32)
        return wang_hash(((idx + np.uint32(1)) * np.uint32(0x11)).astype(np.uint32))


def pixel_seed(pixel_index, total_samples):
    with np.errstate(over="ignore"):
        return init_seed(
            (np.asarray(pixel_index).astype(np.uint32)
             + np.uint32(total_samples) * np.uint32(1799)).astype(np.uint32)
        )


def xorshift32(seed):
    with np.errstate(over="ignore"):
        seed = seed ^ ((seed << np.uint32(13)) & M32).astype(np.uint32)
        seed = seed ^ (seed >> np.uint32(17))
        seed = seed ^ ((seed << np.uint32(5)) & M32).astype(np.uint32)
    return seed.astype(np.uint32)


def next_u32(seed):
    s = xorshift32(seed)
    return s, s


def next_f32(seed):
    s = xorshift32(seed)
    return s, (s.astype(np.float32) * U32_TO_FLOAT_SCALE).astype(np.float32)


def next_f32_range(seed, lo, hi):
    s, u = next_f32(seed)
    return s, (u * (np.float32(hi) - np.float32(lo)) + np.float32(lo)).astype(np.float32)


def next_u32_range(seed, lo, hi):
    s, u = next_u32(seed)
    with np.errstate(over="ignore"):
        return s, ((u + np.uint32(lo)) % np.uint32(hi)).astype(np.uint32)


def next_f32_masked(seed, mask):
    s, u = next_f32(seed)
    return np.where(mask, s, seed), u


def next_u32_masked(seed, mask):
    s, u = next_u32(seed)
    return np.where(mask, s, seed), u
