"""Pallas packet-traversal kernel vs the XLA lockstep traversal —
interpreter mode on CPU (the compiled path is exercised on real TPU by
bench.py; both share this logic)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surf_tpu.accel.pallas_traverse import traverse_pallas
from surf_tpu.accel.traverse import pack_records_np
from surf_tpu.accel.traverse import traverse
from surf_tpu.scene import builtin
from surf_tpu.scene.compile import HostCompiled

warnings.filterwarnings("ignore", category=RuntimeWarning)


@pytest.fixture(scope="module")
def box():
    return HostCompiled(builtin.make_diffuse_box_scene())


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pack_records_layout():
    f = [np.arange(10, dtype=np.float32) + i for i in range(6)]
    i = [np.arange(10, dtype=np.int32) * (k + 1) for k in range(3)]
    packed = pack_records_np(f, i)
    assert packed.shape[1] == 128 and packed.shape[0] % 8 == 0
    # record 9 -> row 1, lanes 16..31
    assert packed[1, 16] == np.float32(9.0)  # f32 col 0 of record 9
    ints = packed.view(np.int32)
    assert ints[1, 16 + 6] == 9  # i32 col 0 (k=0: *1)
    assert ints[1, 16 + 8] == 27  # i32 col 2 (*3)


def test_pallas_closest_matches_xla(box):
    rs = box.render_scene
    n = 2048
    o, d = _rays(n)
    tmax = jnp.full(n, 1e30, jnp.float32)
    act = jnp.ones(n, bool)
    hp = traverse_pallas(rs.trace, o, d, tmax, act, False, interpret=True)
    hx = jax.jit(traverse, static_argnums=(5, 6))(
        rs.trace, o, d, tmax, act, 0, False
    )
    assert np.array_equal(np.asarray(hp.prim), np.asarray(hx.prim))
    both = np.asarray(hx.prim) >= 0
    assert np.allclose(
        np.asarray(hp.t)[both], np.asarray(hx.t)[both], rtol=1e-6
    )
    assert np.allclose(
        np.asarray(hp.u)[both], np.asarray(hx.u)[both], atol=1e-6
    )


def test_pallas_anyhit_matches_xla(box):
    rs = box.render_scene
    n = 2048
    o, d = _rays(n, seed=1)
    tmax = jnp.full(n, 8.0, jnp.float32)
    act = jnp.ones(n, bool)
    hp = traverse_pallas(rs.trace, o, d, tmax, act, True, interpret=True)
    hx = jax.jit(traverse, static_argnums=(5, 6))(
        rs.trace, o, d, tmax, act, 0, True
    )
    assert np.array_equal(np.asarray(hp.prim) >= 0, np.asarray(hx.prim) >= 0)


def test_pallas_inactive_lanes(box):
    rs = box.render_scene
    n = 1024
    o, d = _rays(n, seed=2)
    act = jnp.asarray(np.arange(n) % 3 == 0)
    hp = traverse_pallas(
        rs.trace, o, d, jnp.full(n, 1e30, jnp.float32), act, False,
        interpret=True,
    )
    prim = np.asarray(hp.prim)
    assert (prim[~np.asarray(act)] == -1).all()


def test_pallas_nonmultiple_block_padding(box):
    rs = box.render_scene
    n = 777  # not a multiple of 1024
    o, d = _rays(n, seed=3)
    hp = traverse_pallas(
        rs.trace, o, d, jnp.full(n, 1e30, jnp.float32), jnp.ones(n, bool),
        False, interpret=True,
    )
    hx = jax.jit(traverse, static_argnums=(5, 6))(
        rs.trace, o, d, jnp.full(n, 1e30, jnp.float32), jnp.ones(n, bool),
        0, False,
    )
    assert np.array_equal(np.asarray(hp.prim), np.asarray(hx.prim))
