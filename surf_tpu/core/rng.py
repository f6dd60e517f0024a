"""Counter-free per-lane RNG: WangHash seeding + xorshift32 streams.

Bit-exact uint32 re-implementation of the reference RNG
(/root/reference/sources/surf_math.cpp:31-95,
 /root/reference/shaders/wavefront_common.glsl:74-111) so that images rendered
at equal (seed, spp) match the NumPy oracle renderer.

Every function is pure and vectorized: a "stream" is a uint32 array of seeds
(one per ray/pixel lane) that is advanced functionally:

    seed, u = next_f32(seed)            # all lanes advance
    seed, u = next_f32_masked(seed, m)  # only lanes where m advances

Masked advancement is the TPU-native replacement for the reference's
by-reference ``U32& seed`` mutation inside divergent branches: lanes that do
not take a branch must not consume random numbers, otherwise seed-parity with
the sequential CPU oracle is lost.
"""

from __future__ import annotations

import jax.numpy as jnp

# F32 scale used by the reference to map uint32 -> [0, 1)
# (sources/surf_math.cpp:9). NOT 1/2^32 exactly; replicate the constant.
U32_TO_FLOAT_SCALE = jnp.float32(2.3283064365387e-10)


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def wang_hash(seed: jnp.ndarray) -> jnp.ndarray:
    """WangHash mix (sources/surf_math.cpp:31-42). seed must be nonzero."""
    seed = _u32(seed)
    seed = (seed ^ _u32(61)) ^ (seed >> 16)
    seed = seed * _u32(9)
    seed = seed ^ (seed >> 4)
    seed = seed * _u32(0x27D4EB2D)
    seed = seed ^ (seed >> 15)
    return seed


def init_seed(index: jnp.ndarray) -> jnp.ndarray:
    """initSeed (sources/surf_math.cpp:44-47): wangHash((idx + 1) * 0x11)."""
    return wang_hash((_u32(index) + _u32(1)) * _u32(0x11))


def pixel_seed(pixel_index: jnp.ndarray, total_samples) -> jnp.ndarray:
    """Per-frame per-pixel seed: initSeed(pixelIdx + totalSamples * 1799)
    (sources/renderer.cpp:169, shaders/ray_generation.comp:72)."""
    return init_seed(_u32(pixel_index) + _u32(total_samples) * _u32(1799))


def xorshift32(seed: jnp.ndarray) -> jnp.ndarray:
    """One xorshift32 step (sources/surf_math.cpp:56-62)."""
    seed = _u32(seed)
    seed = seed ^ (seed << 13)
    seed = seed ^ (seed >> 17)
    seed = seed ^ (seed << 5)
    return seed


def next_u32(seed: jnp.ndarray):
    """Advance stream; the new seed IS the random value (randomU32)."""
    s = xorshift32(seed)
    return s, s


def next_f32(seed: jnp.ndarray):
    """randomF32 (sources/surf_math.cpp:69-72): u32 * 2.3283064365387e-10f."""
    s = xorshift32(seed)
    return s, s.astype(jnp.float32) * U32_TO_FLOAT_SCALE


def next_f32_range(seed: jnp.ndarray, lo, hi):
    """randomRange(seed, min, max) (surf_math.cpp:81-85): f32*(max-min)+min."""
    s, u = next_f32(seed)
    return s, u * (jnp.float32(hi) - jnp.float32(lo)) + jnp.float32(lo)


def next_u32_range(seed: jnp.ndarray, lo, hi):
    """randomRange(seed, min, max) for U32 (surf_math.cpp:92-95).

    (rand + min) % max — slightly biased, replicated for parity."""
    s, u = next_u32(seed)
    return s, (u + _u32(lo)) % _u32(hi)


# ---------------------------------------------------------------------------
# Masked variants: only lanes where mask is True consume a random number.
# ---------------------------------------------------------------------------

def next_f32_masked(seed: jnp.ndarray, mask: jnp.ndarray):
    s, u = next_f32(seed)
    return jnp.where(mask, s, seed), u


def next_u32_masked(seed: jnp.ndarray, mask: jnp.ndarray):
    s, u = next_u32(seed)
    return jnp.where(mask, s, seed), u


def next_f32_range_masked(seed: jnp.ndarray, mask: jnp.ndarray, lo, hi):
    s, u = next_f32_range(seed, lo, hi)
    return jnp.where(mask, s, seed), u


def next_u32_range_masked(seed: jnp.ndarray, mask: jnp.ndarray, lo, hi):
    s, u = next_u32_range(seed, lo, hi)
    return jnp.where(mask, s, seed), u
