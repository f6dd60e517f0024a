"""Cross-frame deferral tests (renderer.cpp:27-29, 1101-1104 semantics):
paths alive at the wave cap persist in FrameCarry and resume next frame, so
the cap's estimator bias is exactly zero once every path has drained."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from surf_tpu.scene import builtin
from surf_tpu.scene.camera import CameraParams
from surf_tpu.scene.compile import HostCompiled
from surf_tpu.wavefront import RenderConfig
from surf_tpu.wavefront.integrator import (
    empty_frame_carry,
    initial_seeds,
    render_frame_carry_jit,
    render_frame_seeded,
)

warnings.filterwarnings("ignore", category=RuntimeWarning)

W = H = 16
SPP = 1
FRAMES = 4


def _setup():
    host = HostCompiled(builtin.make_diffuse_box_scene())
    cam = CameraParams.from_camera(builtin.make_indoor_camera(W, H))
    cfg = RenderConfig.for_scene(host.static, W, H, SPP, use_defocus=True)
    return host.render_scene, cam, cfg


def test_deferred_render_matches_uncapped():
    """With a tiny wave cap + deferral, the cumulative image after draining
    equals the same frames rendered with an effectively unbounded cap —
    deferred paths continue bit-exactly, just banked later."""
    scene, cam, cfg = _setup()
    cfg_low = cfg._replace(wave_limit=4)
    cfg_high = cfg._replace(wave_limit=256)

    # Reference: uncapped frames.
    total_ref = np.zeros((H, W, 3), np.float32)
    for f in range(FRAMES):
        seed0 = initial_seeds(cfg_high, jnp.uint32(f * SPP))
        acc, _ = render_frame_seeded(scene, cfg_high, cam, seed0)
        total_ref += np.asarray(acc)

    # Deferred: capped at 4 waves, carry across frames, then drain.
    carry = empty_frame_carry(cfg_low)
    total = np.zeros((H, W, 3), np.float32)
    for f in range(FRAMES):
        seed0 = initial_seeds(cfg_low, jnp.uint32(f * SPP))
        acc, _, carry = render_frame_carry_jit(scene, cfg_low, cam, seed0,
                                               carry)
        total += np.asarray(acc)
    drain_cfg = cfg_low._replace(spp=0)
    for _ in range(64):
        if not bool(np.asarray(jnp.any(carry.deferred.alive))):
            break
        acc, _, carry = render_frame_carry_jit(
            scene, drain_cfg, cam, jnp.zeros(W * H, jnp.uint32), carry)
        total += np.asarray(acc)
    assert not bool(np.asarray(jnp.any(carry.deferred.alive))), \
        "paths failed to drain"
    assert int(np.asarray(carry.dropped)) == 0

    # Bit-near equality (accumulation order differs across frames).
    assert np.allclose(total, total_ref, rtol=1e-5, atol=1e-5), (
        float(np.abs(total - total_ref).max()))


def test_deferral_recovers_cap_bias():
    """Dropping capped paths loses energy; deferring recovers it."""
    scene, cam, cfg = _setup()
    cfg_low = cfg._replace(wave_limit=3)
    seed0 = initial_seeds(cfg_low, jnp.uint32(0))

    capped, _ = render_frame_seeded(scene, cfg_low, cam, seed0)
    capped_e = float(np.asarray(capped).sum())

    carry = empty_frame_carry(cfg_low)
    acc, _, carry = render_frame_carry_jit(scene, cfg_low, cam, seed0, carry)
    total = np.asarray(acc).astype(np.float64).sum()
    # First frame matches the capped render (deferral banks the same
    # partial energy)...
    assert np.isclose(total, capped_e, rtol=1e-5)
    # ... and the carried pool holds live paths whose continuation adds the
    # missing energy.
    assert bool(np.asarray(jnp.any(carry.deferred.alive)))
    drain_cfg = cfg_low._replace(spp=0)
    extra = 0.0
    for _ in range(64):
        if not bool(np.asarray(jnp.any(carry.deferred.alive))):
            break
        acc, _, carry = render_frame_carry_jit(
            scene, drain_cfg, cam, jnp.zeros(W * H, jnp.uint32), carry)
        extra += float(np.asarray(acc).sum())
    assert extra > 0.0

    cfg_high = cfg._replace(wave_limit=256)
    ref, _ = render_frame_seeded(scene, cfg_high, cam, seed0)
    ref_e = float(np.asarray(ref).sum())
    assert np.isclose(total + extra, ref_e, rtol=1e-4)
    assert total < ref_e  # the bias deferral recovered


def test_deferral_with_compaction_matches():
    """Deferral composes with stream compaction (permuted lanes route
    through .pixel scatters)."""
    scene, cam, cfg = _setup()
    base = cfg._replace(wave_limit=4)
    out = {}
    for name, c in (("plain", base),
                    ("compact", base._replace(compact=True,
                                              compact_every=1))):
        carry = empty_frame_carry(c)
        seed0 = initial_seeds(c, jnp.uint32(0))
        acc, seed, carry = render_frame_carry_jit(scene, c, cam, seed0,
                                                  carry)
        out[name] = (np.asarray(acc), np.asarray(seed),
                     int(np.asarray(jnp.sum(
                         carry.deferred.alive.astype(jnp.int32)))))
    assert np.allclose(out["plain"][0], out["compact"][0],
                       rtol=1e-5, atol=1e-6)
    assert np.array_equal(out["plain"][1], out["compact"][1])
    assert out["plain"][2] == out["compact"][2]


def test_width_ladder_bit_identical():
    """The width-ladder wave loop (cfg.ladder > 0) must be bit-identical
    to the plain compacted loop: every lane sees the same masked op
    sequence and carries its own RNG stream; only dispatch co-residency
    changes.  64x64 puts one active rung (4096 -> 1024 lanes)."""
    host = HostCompiled(builtin.make_diffuse_box_scene())
    w = h = 64
    cam = builtin.make_indoor_camera(w, h)
    cp = CameraParams.from_camera(cam)
    base = RenderConfig.for_scene(
        host.static, w, h, 1, use_defocus=True)._replace(
        max_bounces=None, wave_limit=32, compact=True)
    seed = initial_seeds(base, jnp.uint32(0))
    img0, s0 = render_frame_seeded(host.render_scene, base, cp, seed)
    img1, s1 = render_frame_seeded(
        host.render_scene, base._replace(ladder=2), cp, seed)
    assert np.array_equal(np.asarray(img0), np.asarray(img1))
    assert np.array_equal(np.asarray(s0), np.asarray(s1))
