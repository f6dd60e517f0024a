"""Intersection primitive tests: Möller–Trumbore + slab AABB
(reference: mesh.cpp:23-62, bvh.cpp:40-66)."""

import jax.numpy as jnp
import numpy as np

from surf_tpu.core.geometry import intersect_aabb, intersect_triangle


def _tri():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    return v0, v1, v2


def test_triangle_hit():
    v0, v1, v2 = _tri()
    o = jnp.asarray([[0.2, 0.2, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, t, u, v = intersect_triangle(o, d, v0, v1, v2, jnp.asarray([1e30]))
    assert bool(hit[0])
    assert np.isclose(float(t[0]), 1.0)
    assert np.isclose(float(u[0]), 0.2, atol=1e-6)
    assert np.isclose(float(v[0]), 0.2, atol=1e-6)


def test_triangle_miss_outside():
    v0, v1, v2 = _tri()
    o = jnp.asarray([[0.9, 0.9, -1.0]])  # outside u+v<=1
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, *_ = intersect_triangle(o, d, v0, v1, v2, jnp.asarray([1e30]))
    assert not bool(hit[0])


def test_triangle_behind():
    v0, v1, v2 = _tri()
    o = jnp.asarray([[0.2, 0.2, 1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, *_ = intersect_triangle(o, d, v0, v1, v2, jnp.asarray([1e30]))
    assert not bool(hit[0])


def test_triangle_parallel():
    v0, v1, v2 = _tri()
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    hit, *_ = intersect_triangle(o, d, v0, v1, v2, jnp.asarray([1e30]))
    assert not bool(hit[0])


def test_triangle_t_max_bound():
    v0, v1, v2 = _tri()
    o = jnp.asarray([[0.2, 0.2, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, *_ = intersect_triangle(o, d, v0, v1, v2, jnp.asarray([0.5]))
    assert not bool(hit[0])  # depthInBounds: t < maxDepth strict


def test_aabb_basic():
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    inv = 1.0 / d
    lo = jnp.asarray([[-1.0, -1.0, -1.0]])
    hi = jnp.asarray([[1.0, 1.0, 1.0]])
    t = intersect_aabb(o, inv, lo, hi, jnp.asarray([1e30]))
    assert np.isclose(float(t[0]), 4.0)


def test_aabb_inside_returns_negative_entry():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = intersect_aabb(
        o, 1.0 / d, jnp.asarray([[-1.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([1e30]),
    )
    # inside the box: tmin < 0 but tmax > 0 -> hit (bvh.cpp:59-63)
    assert float(t[0]) < 0.0


def test_aabb_miss():
    o = jnp.asarray([[5.0, 5.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = intersect_aabb(
        o, 1.0 / d, jnp.asarray([[-1.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([1e30]),
    )
    assert float(t[0]) == np.float32(1e30)


def test_aabb_behind():
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = intersect_aabb(
        o, 1.0 / d, jnp.asarray([[-1.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([1e30]),
    )
    assert float(t[0]) == np.float32(1e30)


def test_aabb_t_max_cut():
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = intersect_aabb(
        o, 1.0 / d, jnp.asarray([[-1.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([3.0]),  # tmin=4 >= bound -> miss
    )
    assert float(t[0]) == np.float32(1e30)


def test_axis_parallel_ray_inside_slab():
    # Ray parallel to the x slabs, origin strictly inside the x range:
    # (-inf, inf) slab interval -> hit.
    o = jnp.asarray([[0.5, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = intersect_aabb(
        o, 1.0 / d, jnp.asarray([[0.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([1e30]),
    )
    assert float(t[0]) == np.float32(4.0)


def test_axis_parallel_ray_on_slab_boundary_misses_like_c():
    # Origin exactly on the slab plane with a parallel ray: 0 * inf = NaN;
    # the C ternary min/max (`a < b ? a : b`) resolves this to a MISS in the
    # reference (bvh.cpp:40-66) — replicated by c_min/c_max.
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = intersect_aabb(
        o, 1.0 / d, jnp.asarray([[0.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([1e30]),
    )
    assert float(t[0]) == np.float32(1e30)
