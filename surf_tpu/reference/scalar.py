"""Scalar golden renderer — a direct per-pixel transcription of the reference
CPU path tracer's control flow (/root/reference/sources/renderer.cpp:148-464,
iterative variant), in pure Python + NumPy float32 scalars.

This is the slowest, most literal implementation: one pixel at a time, one
sequential RNG stream per pixel, rejection loops executed as real loops.
It exists to validate the *vectorized* NumPy oracle (cpu_renderer.py) on tiny
images, which in turn validates the TPU wavefront path.  Intersection is
brute force over all world-space triangles (the BVH is validated separately
against brute force).
"""

from __future__ import annotations

import numpy as np

from ..scene.camera import Camera
from ..scene.compile import HostCompiled
from . import rng_np as R

F32_EPSILON = np.float32(1e-5)
F32_FAR_AWAY = np.float32(1e30)
F32_PI = np.float32(3.14159265358979323846264)
F32_INV_PI = np.float32(0.31830988618379067153777)
F32_2PI = np.float32(6.28318530717958647692528)
WORLD_UP = np.array([0, 1, 0], np.float32)
WORLD_RIGHT = np.array([1, 0, 0], np.float32)


def _normalize(v):
    return (v / np.sqrt(np.float32(v @ v))).astype(np.float32)


class ScalarRenderer:
    def __init__(self, host: HostCompiled, camera: Camera):
        self.h = host
        self.cam = camera
        self.first_pixel, self.u_vec, self.v_vec = camera.view_plane()

    # -- RNG stream helpers (seed is a python int masked to 32 bits) -------
    def _f32(self):
        self.seed = int(R.xorshift32(np.uint32(self.seed)))
        return np.float32(np.float32(np.uint32(self.seed)) * R.U32_TO_FLOAT_SCALE)

    def _f32_range(self, lo, hi):
        return np.float32(self._f32() * (np.float32(hi) - np.float32(lo)) + np.float32(lo))

    def _u32_range(self, lo, hi):
        self.seed = int(R.xorshift32(np.uint32(self.seed)))
        return int((np.uint32(self.seed) + np.uint32(lo)) % np.uint32(hi))

    # -- geometry ----------------------------------------------------------
    def _intersect_closest(self, o, d, t_max):
        """Möller–Trumbore against every world triangle (mesh.cpp:23-62)."""
        h = self.h
        e1 = h.samp_v1 - h.samp_v0
        e2 = h.samp_v2 - h.samp_v0
        hv = np.cross(d, e2)
        a = np.sum(e1 * hv, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.float32(1.0) / a
            s = o - h.samp_v0
            u = f * np.sum(s * hv, axis=1)
            q = np.cross(s, e1)
            v = f * np.sum(d[None, :] * q, axis=1)
            t = f * np.sum(e2 * q, axis=1)
        ok = (
            (np.abs(a) >= F32_EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= F32_EPSILON) & (t < t_max)
        )
        if not ok.any():
            return None
        idx = np.where(ok)[0]
        best = idx[np.argmin(t[idx])]
        return int(best), np.float32(t[best]), np.float32(u[best]), np.float32(v[best])

    def _occluded(self, o, d, t_max):
        return self._intersect_closest(o, d, t_max) is not None

    # -- sampling ----------------------------------------------------------
    def _cosine_hemisphere(self, n):
        """surf_math.cpp:116-134."""
        while True:
            r0 = self._f32()
            r1 = self._f32()
            r = np.float32(np.sqrt(r0))
            theta = np.float32(F32_2PI * r1)
            d = np.array(
                [r * np.cos(theta), r * np.sin(theta), np.sqrt(np.float32(1.0) - r0)],
                np.float32,
            )
            x_max = np.float32(1.0) - F32_EPSILON
            tmp = WORLD_UP if abs(n[0]) > x_max else WORLD_RIGHT
            b = _normalize(np.cross(n, tmp))
            t = np.cross(b, n).astype(np.float32)
            out = (d[0] * t + d[1] * b + d[2] * n).astype(np.float32)
            if np.float32(out @ n) != np.float32(0.0):
                return out

    def _defocus_disk(self):
        """camera.h:74-87."""
        radius = np.float32(
            self.cam.focal_length
            * np.tan(np.float32(self.cam.defocus_angle / 2.0) * F32_PI * np.float32(0.005555555555555))
        )
        u = self.cam.right() * radius
        v = (-1.0 * self.cam.up * radius).astype(np.float32)
        while True:
            sx = self._f32_range(-1.0, 1.0)
            sy = self._f32_range(-1.0, 1.0)
            if sx * sx + sy * sy <= np.float32(1.0):
                return (sx * u + sy * v).astype(np.float32)

    def _primary_ray(self, x, y):
        """camera.h:59-72 with AA jitter applied by the caller semantics
        (renderer.cpp:171-176): jitter x then y, then (optionally) the
        defocus-disk draws."""
        jx = self._f32_range(-0.5, 0.5)
        jy = self._f32_range(-0.5, 0.5)
        fx = np.float32(x) + jx
        fy = np.float32(y) + jy
        u = np.float32(fx * (1.0 / np.float32(self.cam.screen_width)))
        v = np.float32(fy * (1.0 / np.float32(self.cam.screen_height)))
        if self.cam.defocus_angle == 0.0:
            origin = self.cam.position.copy()
        else:
            origin = (self.cam.position + self._defocus_disk()).astype(np.float32)
        plane_pos = (self.first_pixel + u * self.u_vec + v * self.v_vec).astype(np.float32)
        direction = _normalize(plane_pos - origin)
        return origin, direction

    def _sample_background(self, d):
        bg = self.h.scene.background
        if bg.type == 0:
            return bg.color
        alpha = np.float32(0.5) * (np.float32(1.0) + d[1])
        return (alpha * bg.gradient_b + (np.float32(1.0) - alpha) * bg.gradient_a).astype(np.float32)

    def _normal(self, prim, u, v):
        h = self.h
        n = (
            u * h.samp_n0[prim] + v * h.samp_n2[prim]
            + (np.float32(1.0) - u - v) * h.samp_n1[prim]
        ).astype(np.float32)
        return _normalize(n)

    def _sample_point(self, inst):
        """Instance::samplePoint (bvh.cpp:533-552): u, v, then triangle id."""
        h = self.h
        u = self._f32_range(0.0, 1.0)
        v = self._f32_range(0.0, np.float32(1.0) - u)
        count = int(h.inst_tri_count[inst])
        idx = self._u32_range(0, count) + int(h.inst_tri_offset[inst])
        pos = (
            u * h.samp_v0[idx] + v * h.samp_v2[idx]
            + (np.float32(1.0) - u - v) * h.samp_v1[idx]
        ).astype(np.float32)
        nrm = _normalize(
            u * h.samp_n0[idx] + v * h.samp_n2[idx]
            + (np.float32(1.0) - u - v) * h.samp_n1[idx]
        )
        return pos, nrm

    # -- the iterative trace loop (renderer.cpp:331-463) -------------------
    def trace(self, origin, direction):
        h = self.h
        mats = h.materials
        energy = np.zeros(3, np.float32)
        transmission = np.ones(3, np.float32)
        last_specular = True
        in_medium = False

        while True:
            hit = self._intersect_closest(origin, direction, F32_FAR_AWAY)
            if hit is None:
                energy += transmission * self._sample_background(direction)
                break
            prim, t, u, v = hit
            inst = int(self.h.tri_inst[prim])
            mat = int(h.inst_material[inst])

            if mats.is_light[mat]:
                if last_specular:
                    energy += transmission * (
                        mats.emission_strength[mat] * mats.emission_color[mat]
                    ).astype(np.float32)
                break

            medium_scale = np.ones(3, np.float32)
            if in_medium:
                medium_scale = np.exp(mats.absorption[mat] * -t).astype(np.float32)

            I = (origin + t * direction).astype(np.float32)
            N = self._normal(prim, u, v)
            rng = self._f32()

            if np.float32(direction @ N) > 0.0:
                N = (-N).astype(np.float32)

            refl = np.float32(mats.reflectivity[mat])
            refr = np.float32(mats.refractivity[mat])
            new_in_medium = in_medium

            if rng < refl:
                Rdir = (direction - np.float32(2.0) * np.float32(N @ direction) * N).astype(np.float32)
                last_specular = True
                transmission = (transmission * mats.albedo[mat] * medium_scale).astype(np.float32)
            elif rng < refl + refr:
                must_refract = False
                Rdir = (direction - np.float32(2.0) * np.float32(N @ direction) * N).astype(np.float32)
                n1 = np.float32(mats.ior[mat]) if in_medium else np.float32(1.0)
                n2 = np.float32(1.0) if in_medium else np.float32(mats.ior[mat])
                ior_ratio = np.float32(n1 / n2)
                cos_i = np.float32(-(direction @ N))
                cos_theta2 = np.float32(1.0) - ior_ratio * ior_ratio * (np.float32(1.0) - cos_i * cos_i)
                if cos_theta2 > 0.0:
                    a, b = n1 - n2, n1 + n2
                    r0 = np.float32((a * a) / (b * b))
                    c = np.float32(1.0) - cos_i
                    fresnel = np.float32(r0 + (np.float32(1.0) - r0) * (c * c * c * c * c))
                    must_refract = self._f32() > fresnel
                    if must_refract:
                        Rdir = (
                            ior_ratio * direction
                            + (ior_ratio * cos_i - np.sqrt(np.abs(cos_theta2))) * N
                        ).astype(np.float32)
                last_specular = True
                transmission = (transmission * mats.albedo[mat] * medium_scale).astype(np.float32)
                new_in_medium = (not in_medium) if must_refract else in_medium
            else:
                Rdir = self._cosine_hemisphere(N)
                light_count = len(h.scene.light_indices)
                cos_theta = np.float32(N @ Rdir)
                diffuse_pdf = np.float32(cos_theta * F32_INV_PI)
                brdf = (mats.albedo[mat] * F32_INV_PI).astype(np.float32)

                if light_count > 0:
                    li = self._u32_range(0, light_count)
                    light_inst = h.scene.light_indices[li]
                    p_pos, p_nrm = self._sample_point(light_inst)
                    IL = (p_pos - I).astype(np.float32)
                    L = _normalize(IL)
                    LN = p_nrm
                    SO = (I + F32_EPSILON * L).astype(np.float32)
                    sr_depth = np.float32(np.sqrt(IL @ IL) - np.float32(2.0) * F32_EPSILON)
                    falloff = np.float32(1.0) / np.float32(IL @ IL)
                    cos_o = np.float32(N @ L)
                    cos_i = np.float32(LN @ (-L))
                    if cos_o > 0.0 and cos_i > 0.0:
                        area = np.float32(self.h.scene.instances[light_inst].area)
                        SA = np.float32(cos_i * area * falloff)
                        if not self._occluded(SO, L, sr_depth):
                            lmat = int(h.inst_material[light_inst])
                            emit = (mats.emission_strength[lmat] * mats.emission_color[lmat]).astype(np.float32)
                            Ld = (emit * SA * brdf * cos_o * np.float32(light_count)).astype(np.float32)
                            energy = (energy + transmission * Ld).astype(np.float32)

                p = np.float32(np.clip(max(transmission[0], transmission[1], transmission[2]), 0.0, 1.0))
                if p < self._f32():
                    break
                rr_scale = np.float32(1.0) / p
                inv_pdf = np.float32(1.0) / diffuse_pdf
                last_specular = False
                transmission = (
                    transmission * cos_theta * inv_pdf * brdf * medium_scale * rr_scale
                ).astype(np.float32)

            origin = (I + F32_EPSILON * Rdir).astype(np.float32)
            direction = Rdir
            in_medium = new_in_medium

        return energy

    def _prim_instance(self, prim: int) -> int:
        return int(self.h.tri_inst[prim])

    def render(self, width: int, height: int, spp: int, total_samples: int = 0):
        """One frame: returns radiance sums [H, W, 3] (spp samples summed),
        matching the accumulator contribution of renderer.cpp:163-186."""
        out = np.zeros((height, width, 3), np.float32)
        for y in range(height):
            for x in range(width):
                pixel_index = x + y * width
                self.seed = int(R.pixel_seed(pixel_index, total_samples))
                for _ in range(spp):
                    o, d = self._primary_ray(x, y)
                    out[y, x] += self.trace(o, d)
        return out
