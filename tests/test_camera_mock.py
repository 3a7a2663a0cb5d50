"""Execute RealSenseSource against a pyrealsense2 API mock (no hardware).

The live-camera path (reference src/rs_util.py:9-47 and the datagen align
path, src/live_data_convert.py:396-400) has never touched a RealSense on
this rig, so these tests drive its pairing / warm-up / advanced-mode-JSON
logic through a fake ``pyrealsense2`` module that mimics exactly the API
surface ``runtime/camera.py`` touches: pipeline/config/stream setup,
rs400_advanced_mode JSON load, depth_units option, bag playback with
``set_real_time(False)``, and the frameset iterator (depth-less framesets
skipped, color optionally aligned, timestamps in ms).
"""

import json
import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Fake pyrealsense2
# ---------------------------------------------------------------------------

class _Enum:
    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return f"rs.{self.name}"


class _FakeIntrinsics:
    width, height = 848, 480
    fx, fy = 421.5, 421.7
    ppx, ppy = 423.2, 239.1


class _FakeVideoStreamProfile:
    def get_intrinsics(self):
        return _FakeIntrinsics()


class _FakeStreamProfile:
    def as_video_stream_profile(self):
        return _FakeVideoStreamProfile()


class _FakeDepthSensor:
    def __init__(self, log):
        self._log = log

    def set_option(self, option, value):
        self._log.append(("set_option", option.name, value))


class _FakePlayback:
    def __init__(self, log):
        self._log = log

    def set_real_time(self, flag):
        self._log.append(("set_real_time", flag))


class _FakeDevice:
    def __init__(self, log):
        self._log = log

    def first_depth_sensor(self):
        return _FakeDepthSensor(self._log)

    def as_playback(self):
        return _FakePlayback(self._log)


class _FakeProfile:
    def __init__(self, log):
        self._log = log

    def get_device(self):
        return _FakeDevice(self._log)

    def get_stream(self, stream):
        return _FakeStreamProfile()


class _FakeDepthFrame:
    """Truthy frame with uint16 data and an ms timestamp."""

    def __init__(self, data, ts_ms):
        self._data = data
        self._ts = ts_ms

    def __bool__(self):
        return True

    def get_data(self):
        return self._data

    def get_timestamp(self):
        return self._ts


class _NoFrame:
    def __bool__(self):
        return False


class _FakeFrameset:
    def __init__(self, depth, color, aligned=False):
        self._depth = depth
        self._color = color
        self.aligned = aligned

    def get_depth_frame(self):
        return self._depth if self._depth is not None else _NoFrame()

    def get_color_frame(self):
        return self._color if self._color is not None else _NoFrame()


class _FakePipeline:
    def __init__(self, module):
        self._m = module

    def start(self, config):
        self._m.log.append(("start",))
        return _FakeProfile(self._m.log)

    def wait_for_frames(self):
        return self._m.framesets.pop(0)

    def stop(self):
        self._m.log.append(("stop",))


class _FakeConfig:
    def __init__(self, module):
        self._m = module

    def enable_device_from_file(self, path, repeat_playback=True):
        self._m.log.append(("from_file", path, repeat_playback))

    def enable_stream(self, stream, *args):
        self._m.log.append(("enable_stream", stream.name) + args)

    def resolve(self, wrapper):
        return _FakeProfile(self._m.log)


class _FakeAlign:
    def __init__(self, module, target):
        self._m = module
        self._m.log.append(("align_to", target.name))

    def process(self, frameset):
        self._m.log.append(("align_process",))
        return _FakeFrameset(
            frameset.get_depth_frame() or None,
            frameset.get_color_frame() or None,
            aligned=True,
        )


class _Rs400AdvancedMode:
    def __init__(self, module, device):
        self._m = module

    def load_json(self, text):
        # the reference ships hand_config.json through exactly this call
        self._m.log.append(("load_json", json.loads(text)))


def _make_fake_rs():
    m = types.ModuleType("pyrealsense2")
    m.log = []
    m.framesets = []
    m.stream = types.SimpleNamespace(depth=_Enum("depth"), color=_Enum("color"))
    m.format = types.SimpleNamespace(z16=_Enum("z16"), rgb8=_Enum("rgb8"))
    m.option = types.SimpleNamespace(depth_units=_Enum("depth_units"))
    m.pipeline = lambda: _FakePipeline(m)
    m.config = lambda: _FakeConfig(m)
    m.pipeline_wrapper = lambda pipeline: ("wrapper", pipeline)
    m.align = lambda target: _FakeAlign(m, target)
    m.rs400_advanced_mode = lambda device: _Rs400AdvancedMode(m, device)
    return m


@pytest.fixture
def fake_rs(monkeypatch):
    m = _make_fake_rs()
    monkeypatch.setitem(sys.modules, "pyrealsense2", m)
    return m


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def _depth(ts_ms, fill=1234):
    return _FakeDepthFrame(
        np.full((480, 848), fill, np.uint16), ts_ms
    )


def _color(ts_ms, fill=77):
    return _FakeDepthFrame(
        np.full((480, 848, 3), fill, np.uint8), ts_ms
    )


def test_live_setup_advanced_mode_and_depth_units(fake_rs, tmp_path):
    from beats3d_tpu.runtime.camera import RealSenseSource

    cfg = tmp_path / "hand_config.json"
    cfg.write_text(json.dumps({"param-depthunits": "100"}))
    src = RealSenseSource(config_json=str(cfg))

    # advanced-mode JSON loaded verbatim (rs_util.py:24-27 behavior)
    assert ("load_json", {"param-depthunits": "100"}) in fake_rs.log
    # 0.1 mm depth units (rs_util.py:28)
    assert ("set_option", "depth_units", 0.0001) in fake_rs.log
    # full-res 90 FPS z16 stream (rs_util.py:30-33)
    assert any(
        e[0] == "enable_stream" and e[1] == "depth" and e[2:4] == (848, 480)
        and e[4] is fake_rs.format.z16 and e[5] == 90
        for e in fake_rs.log
    )
    # intrinsics come from the depth stream profile
    assert src.intrinsics.width == 848 and src.intrinsics.fx == 421.5
    src.stop()
    assert fake_rs.log[-1] == ("stop",)


def test_live_half_resolution_stream(fake_rs, tmp_path):
    from beats3d_tpu.runtime.camera import RealSenseSource

    cfg = tmp_path / "c.json"
    cfg.write_text("{}")
    RealSenseSource(half_resolution=True, config_json=str(cfg))
    assert any(
        e[0] == "enable_stream" and e[1] == "depth" and e[2:4] == (424, 240)
        for e in fake_rs.log
    )


def test_bag_playback_non_realtime(fake_rs):
    from beats3d_tpu.runtime.camera import RealSenseSource

    RealSenseSource(bag="session.bag")
    assert ("from_file", "session.bag", True) in fake_rs.log
    # playback must NOT drop frames (rs_util.py:37-38 behavior)
    assert ("set_real_time", False) in fake_rs.log
    # no advanced-mode / depth-units calls on the bag path
    assert not any(e[0] == "load_json" for e in fake_rs.log)


def test_frames_pairing_and_timestamps(fake_rs):
    from beats3d_tpu.runtime.camera import RealSenseSource

    src = RealSenseSource(bag="s.bag")
    fake_rs.framesets = [
        _FakeFrameset(None, _color(5.0)),          # depth-less: skipped
        _FakeFrameset(_depth(1000.0), _color(1003.0)),
        _FakeFrameset(_depth(1011.0), None),       # depth-only frame ok
    ]
    it = src.frames()
    f1 = next(it)
    assert f1.timestamp == 1.0                     # ms -> seconds
    assert f1.color_timestamp == pytest.approx(1.003)
    assert f1.depth.dtype == np.uint16 and f1.depth.shape == (480, 848)
    assert f1.color.shape == (480, 848, 3)
    f2 = next(it)
    assert f2.color is None and f2.color_timestamp is None
    assert f2.timestamp == pytest.approx(1.011)


def test_align_color_reprojects_pairs(fake_rs):
    from beats3d_tpu.runtime.camera import RealSenseSource

    src = RealSenseSource(bag="s.bag", align_color=True)
    assert ("align_to", "depth") in fake_rs.log
    fake_rs.framesets = [
        _FakeFrameset(_depth(2000.0), _color(2001.0)),
        _FakeFrameset(_depth(2011.0), None),       # no color: align skipped
    ]
    it = src.frames()
    next(it)
    assert ("align_process",) in fake_rs.log
    n_aligns = fake_rs.log.count(("align_process",))
    next(it)
    assert fake_rs.log.count(("align_process",)) == n_aligns  # unchanged


def test_open_source_prefers_live_when_no_flags(fake_rs, tmp_path, monkeypatch):
    """open_source with no session/bag/synthetic goes to the live camera."""
    import argparse

    from beats3d_tpu.runtime import camera

    cfg = tmp_path / "hand_config.json"
    cfg.write_text("{}")
    monkeypatch.chdir(tmp_path)
    p = argparse.ArgumentParser()
    camera.add_args(p)
    args = p.parse_args([])
    src = camera.open_source(args)
    assert isinstance(src, camera.RealSenseSource)
    assert src.intrinsics.height == 480
