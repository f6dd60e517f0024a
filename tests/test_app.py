"""App layer: image IO round trips, U32 packing parity, accumulator
semantics, metrics shape, CLI end-to-end."""

import json
import os

import numpy as np

from surf_tpu.app.config import AppConfig
from surf_tpu.app.image_io import (
    read_png,
    rgba_to_u32,
    save_image,
    tonemap,
    write_png,
)
from surf_tpu.app.metrics import MetricsLog
from surf_tpu.wavefront.accumulator import Accumulator


def test_rgba_to_u32_pack():
    # RgbaToU32 packs ABGR with rounding + saturation (surf_math.cpp:13-29)
    c = np.array([1.0, 0.5, 0.0, 1.0], np.float32)
    u = int(rgba_to_u32(c))
    assert u & 0xFF == 255          # r
    assert (u >> 8) & 0xFF == 128   # g = round(127.5) -> 128 (nearest-even)
    assert (u >> 16) & 0xFF == 0    # b
    assert (u >> 24) & 0xFF == 255  # a
    # saturation
    assert int(rgba_to_u32(np.float32([2.0, -1.0, 0.0, 1.0]))) & 0xFFFF == 0x00FF


def test_png_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    back = read_png(path)
    assert np.array_equal(img, back)


def test_tonemap_sqrt_gamma():
    # gamma = sqrt (fs_quad.frag:13)
    out = tonemap(np.float32([[[0.25, 1.0, 0.0]]]))
    assert out[0, 0, 0] == 128 and out[0, 0, 1] == 255 and out[0, 0, 2] == 0


def test_save_image_npy(tmp_path):
    img = np.ones((4, 4, 3), np.float32) * 0.5
    p = str(tmp_path / "x.npy")
    save_image(p, img)
    assert np.allclose(np.load(p), img)


def test_accumulator_progressive_and_checkpoint(tmp_path):
    acc = Accumulator(4, 4)
    acc.add_frame(np.ones((4, 4, 3), np.float32) * 2.0, spp=2)
    acc.add_frame(np.ones((4, 4, 3), np.float32) * 4.0, spp=2)
    # resolve divides by total samples (wavefront_finalize.comp:18)
    assert np.allclose(acc.resolve(), 6.0 / 4.0)
    assert np.isclose(acc.energy(), 4 * 4 * 3 * 1.5)
    p = str(tmp_path / "acc.npz")
    acc.save(p)
    acc2 = Accumulator.load(p)
    assert acc2.total_samples == 4
    assert np.allclose(acc2.resolve(), acc.resolve())
    acc.clear()
    assert acc.total_samples == 0 and acc.buffer.sum() == 0


def test_metrics_log_shape(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLog(64, 64, path)
    m = log.tick(spp=2, total_samples=2, energy=123.0)
    assert m.total_samples == 2
    assert "Lumen" in m.format_line()
    rec = json.loads(open(path).read().strip())
    assert rec["energy"] == 123.0


def test_cli_end_to_end(tmp_path):
    from surf_tpu.app.cli import main

    out = str(tmp_path / "o.png")
    ckpt = str(tmp_path / "acc.npz")
    rc = main([
        "--scene", "box", "--width", "16", "--height", "16", "--spp", "1",
        "--frames", "2", "--output", out, "--checkpoint", ckpt,
        "--metrics-jsonl", str(tmp_path / "m.jsonl"),
    ])
    assert rc == 0
    assert os.path.exists(out)
    img = read_png(out)
    assert img.shape == (16, 16, 3) and img.max() > 0
    acc = Accumulator.load(ckpt)
    assert acc.total_samples == 2

    # resume path
    rc = main([
        "--scene", "box", "--width", "16", "--height", "16", "--spp", "1",
        "--frames", "1", "--checkpoint", ckpt, "--resume",
    ])
    assert rc == 0


def test_cli_frames_in_flight_matches_blocking(tmp_path):
    """P6 frames-in-flight (renderer.h:22): dispatch-ahead of N frames must
    accumulate the exact same image as the strictly-blocking loop, including
    under animation where the accumulator clear is deferred to drain time."""
    from surf_tpu.app.cli import main

    outs = {}
    for flight in (1, 3):
        for tag, extra in (("static", []),
                           ("anim", ["--animate"])):
            out = str(tmp_path / f"o{flight}{tag}.npy")
            rc = main([
                "--scene", "box", "--width", "16", "--height", "16",
                "--spp", "1", "--frames", "3", "--output", out,
                "--frames-in-flight", str(flight),
            ] + extra)
            assert rc == 0
            outs[(flight, tag)] = np.load(out)
    assert np.array_equal(outs[(1, "static")], outs[(3, "static")])
    assert np.array_equal(outs[(1, "anim")], outs[(3, "anim")])


def test_config_file_round_trip(tmp_path):
    cfg = AppConfig(scene="box", width=32, height=32, spp=4)
    p = tmp_path / "c.json"
    p.write_text(cfg.to_json())
    cfg2 = AppConfig.from_file(str(p))
    assert cfg2 == cfg
