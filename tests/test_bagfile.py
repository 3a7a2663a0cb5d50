"""RealSense .bag container demux without hardware (VERDICT r3 #8): a
spec-compliant fixture bag round-trips through the pure-python reader, the
depth/color timestamp pairing gate behaves like the reference's
(live_data_convert.py:306-317), and open_source falls back to the bag
demuxer when pyrealsense2 is absent."""
import argparse

import numpy as np
import pytest

from beats3d_tpu.runtime import camera
from beats3d_tpu.runtime.bagfile import BagReader, BagSource, write_minimal_bag
from beats3d_tpu.utils import CameraIntrinsics


@pytest.fixture
def bag(tmp_path, rng):
    depth = rng.integers(0, 4000, (4, 12, 16)).astype(np.uint16)
    color = rng.integers(0, 255, (3, 12, 16, 3)).astype(np.uint8)
    dts = [1.000, 1.011, 1.066, 1.077]
    # no color lands near depth frames 2/3 -> their pairing is dropped
    # (nearest diverges ~0.055 s > the 1/45 s tolerance)
    cts = [1.0005, 1.0115, 1.250]
    intr = CameraIntrinsics(width=16, height=12, fx=61.5, fy=61.7,
                            ppx=8.2, ppy=6.1)
    path = str(tmp_path / "tiny.bag")
    write_minimal_bag(path, depth, dts, color, cts, intr)
    return path, depth, color, dts, cts, intr


def test_bag_roundtrip(bag):
    path, depth, color, dts, cts, intr = bag
    r = BagReader(path)
    assert len(r.depth) == 4 and len(r.color) == 3
    for (ts, d), want_ts, want in zip(r.depth, dts, depth):
        assert ts == pytest.approx(want_ts, abs=1e-6)
        np.testing.assert_array_equal(d, want)
    np.testing.assert_array_equal(r.color[0][1], color[0])
    fx, fy, ppx, ppy, w, h = r.intrinsics_raw
    assert (fx, fy, ppx, ppy, w, h) == (61.5, 61.7, 8.2, 6.1, 16, 12)


def test_bag_pairing_gate(bag):
    path, depth, color, dts, cts, intr = bag
    pairs = list(BagReader(path).paired_frames())
    assert len(pairs) == 4
    # frames 0, 1 pair with color 0, 1; frames 2, 3 have no color within
    # the gate -> dropped
    assert pairs[0][3] is not None and pairs[1][3] is not None
    assert pairs[2][3] is None
    assert pairs[0][2] == pytest.approx(1.0005)


def test_bag_source_frames_and_intrinsics(bag):
    path, depth, color, dts, cts, intr = bag
    src = BagSource(path)
    assert src.intrinsics.fx == pytest.approx(61.5)
    frames = list(src.frames())
    assert len(frames) == 4
    np.testing.assert_array_equal(frames[1].depth, depth[1])
    assert frames[1].color is not None
    assert frames[2].color is None  # pairing gate


def test_open_source_falls_back_without_sdk(bag, monkeypatch):
    path = bag[0]
    args = argparse.Namespace(
        session=None, synthetic=False, rs_bag=path, rs_half_resolution=False
    )

    def no_sdk(*a, **kw):
        raise RuntimeError("pyrealsense2 not available")

    monkeypatch.setattr(camera, "RealSenseSource", no_sdk)
    src = camera.open_source(args)
    assert isinstance(src, BagSource)
    assert next(iter(src.frames())).depth.shape == (12, 16)
