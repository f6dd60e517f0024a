"""Vectorized intersection primitives shared by the oracle and the kernels.

Replicates the numerical semantics of:
- Triangle::intersect (Möller–Trumbore, /root/reference/sources/mesh.cpp:23-62)
- AABB::intersect (slab test, /root/reference/sources/bvh.cpp:40-66)

NaN handling matters for bit parity: C's ``a < b ? a : b`` returns ``b`` when
either operand is NaN, unlike jnp.minimum (which propagates NaN); ``c_min`` /
``c_max`` replicate the C ternary so degenerate rays (axis-parallel, origin on
a slab plane) behave identically.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import F32_EPSILON, F32_FAR_AWAY, cross, dot


def c_min(a, b):
    return jnp.where(a < b, a, b)


def c_max(a, b):
    return jnp.where(a > b, a, b)


def intersect_triangle(origin, direction, v0, v1, v2, t_max):
    """Möller–Trumbore over broadcastable [..., 3] operands.

    Returns (hit, t, u, v); ``hit`` is False where |det| < F32_EPSILON, the
    barycentrics leave [0, 1], or t is outside [F32_EPSILON, t_max)
    (mesh.cpp:23-62, depthInBounds surf_math.h:229).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    h = cross(direction, e2)
    a = dot(e1, h)
    det_ok = jnp.abs(a) >= F32_EPSILON
    f = jnp.float32(1.0) / a
    s = origin - v0
    u = f * dot(s, h)
    q = cross(s, e1)
    v = f * dot(direction, q)
    t = f * dot(e2, q)
    hit = (
        det_ok
        & (u >= jnp.float32(0.0))
        & (u <= jnp.float32(1.0))
        & (v >= jnp.float32(0.0))
        & (u + v <= jnp.float32(1.0))
        & (t >= F32_EPSILON)
        & (t < t_max)
    )
    return hit, t, u, v


def intersect_aabb(origin, inv_direction, bb_min, bb_max, t_max):
    """Slab test (bvh.cpp:40-66): returns entry distance tmin where the AABB
    is hit before ``t_max``, else F32_FAR_AWAY."""
    t_near = (bb_min - origin) * inv_direction
    t_far = (bb_max - origin) * inv_direction

    tmin = c_min(t_near[..., 0], t_far[..., 0])
    tmax = c_max(t_near[..., 0], t_far[..., 0])
    tmin = c_max(tmin, c_min(t_near[..., 1], t_far[..., 1]))
    tmax = c_min(tmax, c_max(t_near[..., 1], t_far[..., 1]))
    tmin = c_max(tmin, c_min(t_near[..., 2], t_far[..., 2]))
    tmax = c_min(tmax, c_max(t_near[..., 2], t_far[..., 2]))

    ok = (tmax >= tmin) & (tmin < t_max) & (tmax > jnp.float32(0.0))
    return jnp.where(ok, tmin, F32_FAR_AWAY)
