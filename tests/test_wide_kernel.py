"""8-wide stream traversal (accel/wide.py + accel/pallas_wide.py) vs the
XLA lockstep reference — NumPy walk and interpreter-mode kernel on CPU
(the compiled path is exercised on real TPU by bench.py)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surf_tpu.accel.pallas_wide import WideTrace, traverse_wide
from surf_tpu.accel.traverse import traverse
from surf_tpu.accel.wide import build_wide_stream, traverse_stream_np
from surf_tpu.scene import builtin
from surf_tpu.scene.compile import HostCompiled

warnings.filterwarnings("ignore", category=RuntimeWarning)


@pytest.fixture(scope="module")
def box():
    return HostCompiled(builtin.make_diffuse_box_scene())


@pytest.fixture(scope="module")
def indoor():
    return HostCompiled(builtin.make_indoor_scene())


def _rays(n, seed=0, span=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-span, span, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _wt(host):
    from surf_tpu.accel.pallas_wide import device_wide_trace
    return device_wide_trace(host._ws)


def test_stream_layout(indoor):
    perm = indoor.bvh.indices.astype(np.int64)
    ws = build_wide_stream(indoor.bvh, indoor.samp_v0[perm],
                           indoor.samp_v1[perm], indoor.samp_v2[perm])
    # every leaf-order slot appears exactly once
    slots = ws.rec_slot[ws.rec_slot >= 0]
    assert len(slots) == len(perm)
    assert len(np.unique(slots)) == len(perm)
    meta = ws.stream[:, 9:11].view(np.int32)
    # node skip links are strictly forward and bounded
    is_leaf = meta[:, 0]
    skip = meta[:, 1]
    pos = np.arange(len(ws.stream))
    assert (skip[is_leaf == 0] > pos[is_leaf == 0]).all()
    assert (skip <= len(ws.stream)).all() or (
        skip[:ws.n_entries] <= ws.n_entries).all()


def test_numpy_stream_matches_xla(indoor):
    rs = indoor.render_scene
    perm = indoor.bvh.indices.astype(np.int64)
    ws = build_wide_stream(indoor.bvh, indoor.samp_v0[perm],
                           indoor.samp_v1[perm], indoor.samp_v2[perm])
    n = 256
    o, d = _rays(n, seed=5, span=3.0)
    tmax = np.full(n, 1e30, np.float32)
    t_w, rec, _, _ = traverse_stream_np(ws, np.asarray(o), np.asarray(d), tmax)
    slot = np.where(rec >= 0, ws.rec_slot[np.maximum(rec, 0)], -1)
    hx = jax.jit(traverse, static_argnums=(5, 6))(
        rs.trace, o, d, jnp.full(n, 1e30, jnp.float32), jnp.ones(n, bool),
        0, False)
    assert np.array_equal(slot, np.asarray(hx.prim))
    both = slot >= 0
    assert np.allclose(t_w[both], np.asarray(hx.t)[both], rtol=1e-6)


def test_wide_closest_matches_xla(box):
    rs = box.render_scene
    n = 2048
    o, d = _rays(n)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    hp = traverse_wide(_wt(box), o, d, tmax, act, False, interpret=True)
    hx = jax.jit(traverse, static_argnums=(5, 6))(
        rs.trace, o, d, tmax, act, 0, False)
    # Exact-t ties may resolve to a different (coincident) triangle: the
    # wide stream tests leaves in a different order than the binary walk.
    tie = np.asarray(hp.t) == np.asarray(hx.t)
    assert (np.equal(np.asarray(hp.prim), np.asarray(hx.prim)) | tie).all()
    both = np.asarray(hx.prim) >= 0
    assert np.allclose(np.asarray(hp.t)[both], np.asarray(hx.t)[both],
                       rtol=1e-6)


def test_wide_anyhit_matches_xla(box):
    rs = box.render_scene
    n = 2048
    o, d = _rays(n, seed=1)
    tmax = jnp.full(n, 8.0, jnp.float32)
    act = jnp.ones(n, bool)
    hp = traverse_wide(_wt(box), o, d, tmax, act, True, interpret=True)
    hx = jax.jit(traverse, static_argnums=(5, 6))(
        rs.trace, o, d, tmax, act, 0, True)
    assert np.array_equal(np.asarray(hp.prim) >= 0, np.asarray(hx.prim) >= 0)


def test_wide_stack_matches_skip(box):
    """Register-stack walk vs skip-link walk: identical results (per-child
    pruning only changes WHICH rows are visited, never the closest hit)."""
    n = 2048
    o, d = _rays(n, seed=7)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    hs = traverse_wide(_wt(box), o, d, tmax, act, False, interpret=True,
                       algo="skip")
    hk = traverse_wide(_wt(box), o, d, tmax, act, False, interpret=True,
                       algo="stack")
    # exact-t ties (coincident geometry) may pick a different triangle —
    # the two walks visit leaves in different orders
    tie = np.asarray(hs.t) == np.asarray(hk.t)
    assert (np.equal(np.asarray(hs.prim), np.asarray(hk.prim)) | tie).all()
    assert np.array_equal(np.asarray(hs.t), np.asarray(hk.t))
    ha_s = traverse_wide(_wt(box), o, d, jnp.full(n, 8.0, jnp.float32), act,
                         True, interpret=True, algo="skip")
    ha_k = traverse_wide(_wt(box), o, d, jnp.full(n, 8.0, jnp.float32), act,
                         True, interpret=True, algo="stack")
    assert np.array_equal(np.asarray(ha_s.prim) >= 0,
                          np.asarray(ha_k.prim) >= 0)


def test_bits_matches_oracle_indoor(indoor):
    """algo="bits" (three-phase list-driven traversal) must reproduce the
    stream oracle's closest hit exactly (same leaf order, same
    strictly-closer updates; pruned rows provably hitless)."""
    ws = indoor._ws
    n = 2048 + 301  # exercise packet padding
    o, d = _rays(n, seed=11, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = np.ones(n, bool)
    act[::13] = False
    hb = traverse_wide(_wt(indoor), o, d, tmax, jnp.asarray(act),
                       False, interpret=True, algo="bits")
    t_w, rec, _, _ = traverse_stream_np(ws, np.asarray(o), np.asarray(d),
                                        np.full(n, 1e30, np.float32))
    slot = np.where(rec >= 0, ws.rec_slot[np.maximum(rec, 0)], -1)
    assert np.array_equal(slot[act], np.asarray(hb.prim)[act])
    both = (slot >= 0) & act
    assert np.allclose(t_w[both], np.asarray(hb.t)[both], rtol=1e-6)
    assert (np.asarray(hb.prim)[~act] == -1).all()
    # any-hit occlusion parity at finite range
    hb2 = traverse_wide(_wt(indoor), o, d, jnp.full(n, 6.0, jnp.float32),
                        jnp.asarray(act), True, interpret=True, algo="bits")
    t2, rec2, _, _ = traverse_stream_np(
        ws, np.asarray(o), np.asarray(d), np.full(n, 6.0, np.float32),
        any_hit=True)
    assert np.array_equal((rec2 >= 0)[act], (np.asarray(hb2.prim) >= 0)[act])


def test_bits_flag_combos(box):
    """Flag-composed bits variants vs plain bits on the box scene:
    'i' (ILP min-tree merge) is bit-identical (same math, same winner
    selection order); 'r' (exact row lists) is bit-identical (subset of
    rows removed are provably hitless); 'w' (Baldwin–Weber) agrees on
    winners except float ties."""
    n = 2048
    o, d = _rays(n, seed=17)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    h0 = traverse_wide(_wt(box), o, d, tmax, act, False, interpret=True,
                       algo="bits")
    for algo, exact in (("bitsi", True), ("bitsr", True), ("bitsri", True),
                        ("bitsru4", True), ("bitsru8", True),
                        ("bitswi", False), ("bitswri", False)):
        h1 = traverse_wide(_wt(box), o, d, tmax, act, False,
                           interpret=True, algo=algo)
        agree = np.asarray(h0.prim) == np.asarray(h1.prim)
        if exact:
            # uN trailing inert-row padding is provably hitless, so the
            # winner and t are identical; u/v may move at FMA-contraction
            # ulps (the unrolled loop body fuses differently).
            assert agree.all(), algo
            assert np.array_equal(np.asarray(h0.t), np.asarray(h1.t)), algo
        else:
            assert agree.mean() >= 0.999, algo


def test_bitsp_matches_bits(indoor):
    """algo="bitsp" (per-ray pair lists, pure XLA) vs "bits": prim and t
    are bit-identical (stream-order first-win argmin = the sequential
    strict-< winner; pruned pairs provably hitless); u/v may differ at
    FMA-contraction ulps (the integrator re-intersects the winner in f32
    regardless).  pair_groups=2 forces heavy overflow so the packet-union
    fallback path is exercised — results must stay identical."""
    n = 2048 + 301  # exercise packet padding
    o, d = _rays(n, seed=11, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = np.ones(n, bool)
    act[::13] = False
    h0 = traverse_wide(_wt(indoor), o, d, tmax, jnp.asarray(act),
                       False, interpret=True, algo="bits")
    for capg in (0, 2):  # default, and tiny -> overflow fallback
        h1 = traverse_wide(_wt(indoor), o, d, tmax, jnp.asarray(act),
                           False, interpret=True, algo="bitsp",
                           pair_groups=capg)
        assert np.array_equal(np.asarray(h0.prim), np.asarray(h1.prim)), capg
        assert np.array_equal(np.asarray(h0.t), np.asarray(h1.t)), capg
        both = np.asarray(h0.prim) >= 0
        assert np.allclose(np.asarray(h0.u)[both], np.asarray(h1.u)[both],
                           atol=1e-5), capg
        assert np.allclose(np.asarray(h0.v)[both], np.asarray(h1.v)[both],
                           atol=1e-5), capg
    # finite-range inactive/shadow-like t_max parity
    tmix = np.full(n, 1e30, np.float32)
    tmix[::3] = 4.0
    h2 = traverse_wide(_wt(indoor), o, d, jnp.asarray(tmix),
                       jnp.asarray(act), False, interpret=True, algo="bits")
    h3 = traverse_wide(_wt(indoor), o, d, jnp.asarray(tmix),
                       jnp.asarray(act), False, interpret=True, algo="bitsp")
    assert np.array_equal(np.asarray(h2.prim), np.asarray(h3.prim))
    assert np.array_equal(np.asarray(h2.t), np.asarray(h3.t))


def test_bitsw_matches_bits(indoor):
    """algo="bitsw" (Baldwin–Weber precomputed rows) must agree with
    "bits" (Möller–Trumbore) everywhere except float-tie winner flips:
    den = n.d equals the MT determinant up to sign exactly in real
    arithmetic, and u/v/t are the same quantities computed in a different
    factorization — only rounding differs.  On this fixture no flips
    occur; t agrees to ~1e-4 relative (different op order)."""
    n = 4096
    o, d = _rays(n, seed=29, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    hm = traverse_wide(_wt(indoor), o, d, tmax, act,
                       False, interpret=True, algo="bits")
    hw = traverse_wide(_wt(indoor), o, d, tmax, act,
                       False, interpret=True, algo="bitsw")
    pm, pw = np.asarray(hm.prim), np.asarray(hw.prim)
    agree = pm == pw
    assert agree.mean() >= 0.999
    both = agree & (pm >= 0)
    assert np.allclose(np.asarray(hm.t)[both], np.asarray(hw.t)[both],
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(hm.u)[both], np.asarray(hw.u)[both],
                       atol=2e-3)
    # any-hit occlusion parity
    am = traverse_wide(_wt(indoor), o, d, jnp.full(n, 6.0, jnp.float32),
                       act, True, interpret=True, algo="bitsw")
    ax = traverse_wide(_wt(indoor), o, d, jnp.full(n, 6.0, jnp.float32),
                       act, True, interpret=True, algo="bits")
    assert ((np.asarray(am.prim) >= 0) ==
            (np.asarray(ax.prim) >= 0)).mean() >= 0.999


def test_bits_subblock_lists(indoor):
    """algo="bits8" at block_rays=2048 builds one candidate list per
    (8,128) sub-block (H=2); plain "bits" at 2048 shares one packet-wide
    list across 16 sublanes.  Both must be identical to the 1024-block
    path, including when only SOME sub-blocks overflow into the
    per-sub-block sweep fallback and when a whole sub-block is dead
    (exercises the prefetch-dependent dead-skip index map)."""
    ws = indoor._ws
    n = 4096
    rng = np.random.default_rng(21)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # sub-block 0: a tight beam (tiny union -> fits small caps);
    # sub-block 1: fully dead; the rest: incoherent (overflows small caps)
    o[:1024] = o[0] + rng.normal(scale=1e-3, size=(1024, 3))
    d[:1024] = d[0]
    d[:1024] /= np.linalg.norm(d[:1024], axis=1, keepdims=True)
    act = np.ones(n, bool)
    act[1024:2048] = False
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full(n, 1e30, jnp.float32)

    h1 = traverse_wide(_wt(indoor), o, d, tmax, jnp.asarray(act),
                       False, interpret=True, algo="bits", block_rays=1024)
    both = np.asarray(h1.prim) >= 0
    for algo, cap in (("bits", 0), ("bits8", 0), ("bits8", 256),
                      ("bits2", 0)):
        h2 = traverse_wide(_wt(indoor), o, d, tmax, jnp.asarray(act),
                           False, interpret=True, algo=algo,
                           block_rays=2048, cap_rows=cap)
        assert np.array_equal(np.asarray(h1.prim), np.asarray(h2.prim)), algo
        assert np.allclose(np.asarray(h1.t)[both], np.asarray(h2.t)[both])


def test_bits2_trefresh_exact(indoor):
    """algo="bits2" (prefix round + t-refresh cull + tail round) must be
    bit-identical to "bits" for closest hits — a culled row's box entry t
    exceeds the running best everywhere, so it cannot contain a winner —
    and equivalent for any-hit occlusion (found rays are killed early).
    refine_rows=16 forces nearly everything through the refresh path."""
    n = 2048
    o, d = _rays(n, seed=31, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = np.ones(n, bool)
    act[::7] = False
    hb = traverse_wide(_wt(indoor), o, d, tmax, jnp.asarray(act),
                       False, interpret=True, algo="bits")
    for refine in (16, 192):
        h2 = traverse_wide(_wt(indoor), o, d, tmax, jnp.asarray(act),
                           False, interpret=True, algo="bits2",
                           refine_rows=refine)
        assert np.array_equal(np.asarray(hb.prim), np.asarray(h2.prim))
        both = np.asarray(hb.prim) >= 0
        assert np.array_equal(np.asarray(hb.t)[both], np.asarray(h2.t)[both])
    # any-hit occlusion parity at finite range
    tshort = jnp.full(n, 6.0, jnp.float32)
    ha = traverse_wide(_wt(indoor), o, d, tshort, jnp.asarray(act),
                       True, interpret=True, algo="bits")
    ha2 = traverse_wide(_wt(indoor), o, d, tshort, jnp.asarray(act),
                        True, interpret=True, algo="bits2", refine_rows=16)
    assert np.array_equal(np.asarray(ha.prim) >= 0, np.asarray(ha2.prim) >= 0)


def test_bits_overflow_sweep_fallback(indoor):
    """Packets whose visited set exceeds the gather capacity must fall
    back to the full-sweep kernel with identical results (forced here
    with a tiny cap_rows)."""
    ws = indoor._ws
    n = 1024
    o, d = _rays(n, seed=14, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    hb = traverse_wide(_wt(indoor), o, d, tmax, act, False, interpret=True,
                       algo="bits", cap_rows=8)
    t_w, rec, _, _ = traverse_stream_np(ws, np.asarray(o), np.asarray(d),
                                        np.full(n, 1e30, np.float32))
    slot = np.where(rec >= 0, ws.rec_slot[np.maximum(rec, 0)], -1)
    assert np.array_equal(slot, np.asarray(hb.prim))
    both = slot >= 0
    assert np.allclose(t_w[both], np.asarray(hb.t)[both], rtol=1e-6)


def test_bits_after_refit(indoor):
    """Refit must refresh the per-row own boxes the bits path culls by."""
    from surf_tpu.accel.builder import refit, triangle_bounds
    from surf_tpu.accel.wide import refit_wide_stream
    from surf_tpu.accel.pallas_wide import device_wide_trace

    perm = indoor.bvh.indices.astype(np.int64)
    tv0 = indoor.samp_v0[perm]
    tv1 = indoor.samp_v1[perm]
    tv2 = indoor.samp_v2[perm]
    ws = build_wide_stream(indoor.bvh, tv0, tv1, tv2)
    rng = np.random.default_rng(5)
    delta = rng.normal(0, 0.08, tv0.shape).astype(np.float32)
    tv0m, tv1m, tv2m = tv0 + delta, tv1 + delta, tv2 + delta
    lo, hi = triangle_bounds(tv0m, tv1m, tv2m)
    bvh2 = refit(indoor.bvh, lo[np.argsort(perm)], hi[np.argsort(perm)])
    ws2 = refit_wide_stream(ws, bvh2, tv0m, tv1m, tv2m)

    n = 1024
    o, d = _rays(n, seed=12, span=3.0)
    hb = traverse_wide(device_wide_trace(ws2), o, d,
                       jnp.full(n, 1e30, jnp.float32), jnp.ones(n, bool),
                       False, interpret=True, algo="bits")
    t_w, rec, _, _ = traverse_stream_np(ws2, np.asarray(o), np.asarray(d),
                                        np.full(n, 1e30, np.float32))
    slot = np.where(rec >= 0, ws2.rec_slot[np.maximum(rec, 0)], -1)
    assert np.array_equal(slot, np.asarray(hb.prim))


@pytest.mark.parametrize("algo", ["stack", "skip2", "spec2", "spec4"])
def test_wide_algos_match_skip_indoor(indoor, algo):
    n = 2048
    o, d = _rays(n, seed=8, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    hs = traverse_wide(_wt(indoor), o, d, tmax, act, False, interpret=True,
                       algo="skip")
    hk = traverse_wide(_wt(indoor), o, d, tmax, act, False, interpret=True,
                       algo=algo)
    assert np.array_equal(np.asarray(hs.prim), np.asarray(hk.prim))
    assert np.array_equal(np.asarray(hs.t), np.asarray(hk.t))
    ha_s = traverse_wide(_wt(indoor), o, d, jnp.full(n, 8.0, jnp.float32),
                         act, True, interpret=True, algo="skip")
    ha_k = traverse_wide(_wt(indoor), o, d, jnp.full(n, 8.0, jnp.float32),
                         act, True, interpret=True, algo=algo)
    assert np.array_equal(np.asarray(ha_s.prim) >= 0,
                          np.asarray(ha_k.prim) >= 0)


def test_wide_skip2_odd_blocks(indoor):
    n = 3 * 1024  # odd number of blocks exercises the tail walk
    o, d = _rays(n, seed=9, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    hs = traverse_wide(_wt(indoor), o, d, tmax, act, False, interpret=True,
                       algo="skip")
    hk = traverse_wide(_wt(indoor), o, d, tmax, act, False, interpret=True,
                       algo="skip2")
    assert np.array_equal(np.asarray(hs.prim), np.asarray(hk.prim))


def test_wide_inactive_lanes(box):
    n = 1024
    o, d = _rays(n, seed=2)
    act = jnp.asarray(np.arange(n) % 3 == 0)
    hp = traverse_wide(_wt(box), o, d, jnp.full(n, 1e30, jnp.float32), act,
                       False, interpret=True)
    prim = np.asarray(hp.prim)
    assert (prim[~np.asarray(act)] == -1).all()


def test_wide_nonmultiple_block_padding(box):
    rs = box.render_scene
    n = 777
    o, d = _rays(n, seed=3)
    hp = traverse_wide(_wt(box), o, d, jnp.full(n, 1e30, jnp.float32),
                       jnp.ones(n, bool), False, interpret=True)
    hx = jax.jit(traverse, static_argnums=(5, 6))(
        rs.trace, o, d, jnp.full(n, 1e30, jnp.float32), jnp.ones(n, bool),
        0, False)
    tie = np.asarray(hp.t) == np.asarray(hx.t)
    assert (np.equal(np.asarray(hp.prim), np.asarray(hx.prim)) | tie).all()


def test_refit_wide_stream_containment(indoor):
    """After vertex motion + refit, every node slot's AABB must contain all
    triangles reachable through that slot (checked via the NumPy walk on
    randomly perturbed geometry: refit image == rebuild image is covered by
    test_animation; this guards the provenance bookkeeping directly)."""
    from surf_tpu.accel.builder import refit, triangle_bounds
    from surf_tpu.accel.wide import refit_wide_stream

    perm = indoor.bvh.indices.astype(np.int64)
    tv0 = indoor.samp_v0[perm]
    tv1 = indoor.samp_v1[perm]
    tv2 = indoor.samp_v2[perm]
    ws = build_wide_stream(indoor.bvh, tv0, tv1, tv2)

    rng = np.random.default_rng(3)
    delta = rng.normal(0, 0.05, tv0.shape).astype(np.float32)
    tv0m, tv1m, tv2m = tv0 + delta, tv1 + delta, tv2 + delta
    lo, hi = triangle_bounds(tv0m, tv1m, tv2m)
    bvh2 = refit(indoor.bvh, lo[np.argsort(perm)], hi[np.argsort(perm)])
    ws2 = refit_wide_stream(ws, bvh2, tv0m, tv1m, tv2m)

    # the moved geometry must intersect identically via stream vs brute
    # force on a ray sample
    n = 128
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(n, 1e30, np.float32)
    t_w, rec, _, _ = traverse_stream_np(ws2, o, d, tmax)
    slot = np.where(rec >= 0, ws2.rec_slot[np.maximum(rec, 0)], -1)

    # brute force over all (moved) triangles
    from surf_tpu.core.geometry import intersect_triangle
    hit_all, t_all, _, _ = intersect_triangle(
        jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
        jnp.asarray(tv0m)[None], jnp.asarray(tv1m)[None],
        jnp.asarray(tv2m)[None], jnp.float32(1e30))
    t_bf = np.where(np.asarray(hit_all), np.asarray(t_all), 1e30).min(axis=1)
    has = t_bf < 1e29
    assert np.allclose(t_w[has], t_bf[has], rtol=1e-5)
    assert ((slot >= 0) == has).all()


@pytest.mark.parametrize("n_tris,seed", [(1, 0), (8, 1), (9, 2), (64, 3),
                                          (500, 4)])
def test_stream_random_soups_vs_brute_force(n_tris, seed):
    """Property test: stream walk == brute force on random triangle soups,
    including sizes around the 8-tri leaf-row boundary and clustered
    centroids (which exercise enforce_max_leaf)."""
    from surf_tpu.accel.builder import build_blas
    from surf_tpu.core.geometry import intersect_triangle

    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (n_tris, 1, 3)).astype(np.float32)
    if seed == 4:
        base[: n_tris // 2] = base[0]  # clustered centroids -> fat SAH leaf
    tris = base + rng.normal(0, 0.4, (n_tris, 3, 3)).astype(np.float32)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    bvh = build_blas(v0, v1, v2, min_leaf=4, max_leaf=8)
    perm = bvh.indices.astype(np.int64)
    ws = build_wide_stream(bvh, v0[perm], v1[perm], v2[perm])
    assert (ws.rec_slot >= 0).sum() == n_tris

    n = 256
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_w, rec, _, _ = traverse_stream_np(ws, o, d,
                                        np.full(n, 1e30, np.float32))
    hit_all, t_all, _, _ = intersect_triangle(
        jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
        jnp.asarray(v0[perm])[None], jnp.asarray(v1[perm])[None],
        jnp.asarray(v2[perm])[None], jnp.float32(1e30))
    t_bf = np.where(np.asarray(hit_all), np.asarray(t_all), 1e30).min(axis=1)
    has = t_bf < 1e29
    assert np.allclose(t_w[has], t_bf[has], rtol=1e-5)
    assert ((rec >= 0) == has).all()


def test_bits_chunked_sweep_bit_identical(indoor, monkeypatch):
    """Chunked overflow sweep (VERDICT r4 item 4): with SWEEP_CHUNK_ROWS
    forced below the table size, the sweep runs in several VMEM chunks
    with the running best carried between calls — results must be
    BIT-identical to the single-block sweep (chunks preserve leaf order,
    so the strictly-closer total order is unchanged) and to the XLA
    lockstep oracle.  Covers closest-hit AND any-hit (whose first chunk
    keeps the trim epilogue while later chunks resume via carry_in)."""
    import surf_tpu.accel.pallas_wide as pw

    ws = indoor._ws
    n = 1024
    o, d = _rays(n, seed=21, span=3.0)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)

    def run(any_hit):
        return traverse_wide(_wt(indoor), o, d, tmax, act, any_hit,
                             interpret=True, algo="bitsr", cap_rows=8)

    ref_c = run(False)
    ref_a = run(True)
    # indoor LeafTable is ~4.2k rows; 512-row chunks => ~9 chunks.  The
    # chunk constant is read at TRACE time, so drop the cached executable
    # or the second run would silently reuse the single-block sweep.
    monkeypatch.setattr(pw, "SWEEP_CHUNK_ROWS", 512)
    jax.clear_caches()
    chk_c = run(False)
    chk_a = run(True)
    assert np.array_equal(np.asarray(ref_c.prim), np.asarray(chk_c.prim))
    assert np.array_equal(np.asarray(ref_c.t), np.asarray(chk_c.t))
    assert np.array_equal(np.asarray(ref_c.u), np.asarray(chk_c.u))
    assert np.array_equal(np.asarray(ref_a.prim >= 0),
                          np.asarray(chk_a.prim >= 0))

    t_w, rec, _, _ = traverse_stream_np(ws, np.asarray(o), np.asarray(d),
                                        np.full(n, 1e30, np.float32))
    slot = np.where(rec >= 0, ws.rec_slot[np.maximum(rec, 0)], -1)
    assert np.array_equal(slot, np.asarray(chk_c.prim))
