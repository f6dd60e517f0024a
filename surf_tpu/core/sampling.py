"""Vectorized sampling routines with reference-identical RNG consumption.

Replicates /root/reference/sources/surf_math.cpp:97-134 (hemisphere samplers)
and /root/reference/headers/camera.h:74-87 (defocus disk).  The reference uses
data-dependent rejection loops; here each lane redraws only while *it* is
unaccepted (masked seed advancement inside a ``lax.while_loop``), so every
lane's RNG stream consumes exactly the draws the sequential CPU code would —
the property the oracle-parity tests rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .vecmath import (
    F32_2PI,
    F32_EPSILON,
    WORLD_RIGHT,
    WORLD_UP,
    cross,
    dot,
    normalize,
)


def cosine_hemisphere(seed: jnp.ndarray, normal: jnp.ndarray, active: jnp.ndarray):
    """randomOnHemisphereCosineWeighted (surf_math.cpp:116-134).

    Two f32 draws -> (r*cos, r*sin, sqrt(1-r0)) in a tangent frame built from
    WORLD_UP/WORLD_RIGHT; retries (re-drawing both) while dot(out, n) == 0.
    Only lanes where ``active`` consume randoms. Returns (seed, direction).
    """

    def draw(seed, mask):
        seed, r0 = rng.next_f32_masked(seed, mask)
        seed, r1 = rng.next_f32_masked(seed, mask)
        r = jnp.sqrt(r0)
        theta = F32_2PI * r1
        dx = r * jnp.cos(theta)
        dy = r * jnp.sin(theta)
        dz = jnp.sqrt(jnp.float32(1.0) - r0)

        x_max = jnp.float32(1.0) - F32_EPSILON
        tmp = jnp.where(jnp.abs(normal[..., 0:1]) > x_max, WORLD_UP, WORLD_RIGHT)
        b = normalize(cross(normal, tmp))
        t = cross(b, normal)
        out = dx[..., None] * t + dy[..., None] * b + dz[..., None] * normal
        return seed, out

    seed, out = draw(seed, active)
    # Retry while R.N == 0 exactly (degenerate frame), as the reference does.
    def cond(state):
        seed, out, need = state
        return jnp.any(need)

    def body(state):
        seed, out, need = state
        seed2, out2 = draw(seed, need)
        out = jnp.where(need[..., None], out2, out)
        need = need & (dot(out, normal) == jnp.float32(0.0))
        return seed2, out, need

    need = active & (dot(out, normal) == jnp.float32(0.0))
    seed, out, _ = jax.lax.while_loop(cond, body, (seed, out, need))
    return seed, out


def uniform_hemisphere(seed: jnp.ndarray, normal: jnp.ndarray, active: jnp.ndarray):
    """randomOnHemisphere (surf_math.cpp:97-114): rejection-sample the unit
    ball (3 draws per attempt), flip into the normal's hemisphere, normalize."""

    def attempt(seed, mask):
        seed, x = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        seed, y = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        seed, z = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        d = jnp.stack([x, y, z], axis=-1)
        return seed, d

    seed, d = attempt(seed, active)
    need = active & (dot(d, d) > jnp.float32(1.0))

    def cond(state):
        return jnp.any(state[2])

    def body(state):
        seed, d, need = state
        seed, d2 = attempt(seed, need)
        d = jnp.where(need[..., None], d2, d)
        need = need & (dot(d, d) > jnp.float32(1.0))
        return seed, d, need

    seed, d, _ = jax.lax.while_loop(cond, body, (seed, d, need))
    d = jnp.where(dot(d, normal)[..., None] < jnp.float32(0.0), -d, d)
    return seed, normalize(d)


def unit_disk(seed: jnp.ndarray, active: jnp.ndarray):
    """Rejection-sampled point in the unit disk, 2 draws per attempt
    (camera.h:74-87 sampleDefocusDisk). Returns (seed, u, v)."""

    def attempt(seed, mask):
        seed, u = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        seed, v = rng.next_f32_range_masked(seed, mask, -1.0, 1.0)
        return seed, u, v

    seed, u, v = attempt(seed, active)
    need = active & (u * u + v * v > jnp.float32(1.0))

    def cond(state):
        return jnp.any(state[3])

    def body(state):
        seed, u, v, need = state
        seed, u2, v2 = attempt(seed, need)
        u = jnp.where(need, u2, u)
        v = jnp.where(need, v2, v)
        need = need & (u * u + v * v > jnp.float32(1.0))
        return seed, u, v, need

    seed, u, v, _ = jax.lax.while_loop(cond, body, (seed, u, v, need))
    return seed, u, v
