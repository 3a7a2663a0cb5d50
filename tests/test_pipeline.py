"""End-to-end frame pipeline + app integration on synthetic scenes (CPU)."""

import numpy as np

import fixtures

import jax.numpy as jnp

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.app import AppConfig, BeatsApp
from beats3d_tpu.runtime.camera import Frame, SyntheticSource
from beats3d_tpu.runtime.midi import Midi
from beats3d_tpu.runtime.pipeline import FramePipeline, PipelineConfig
from beats3d_tpu.utils import CameraIntrinsics


def _small_scene(intrin, hand_height=300.0, tap=1.0):
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n = np.array([0.03, -0.06, 1.0])
    n /= np.linalg.norm(n)
    depth = (2600.0 - n[0] * (xx - intrin.ppx) * 8 - n[1] * (yy - intrin.ppy) * 8) / n[2]
    r = int(0.16 * w)
    for cx in (int(0.28 * w), int(0.72 * w)):
        blob = (xx - cx) ** 2 + (yy - h / 2) ** 2 < r * r
        depth[blob] -= hand_height * tap
    return depth.astype(np.uint16)


def _model(tmp_path, rng):
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    return LayeredDecisionForest.load(cfg_path, labels_reduce=2)


def test_pipeline_heights_match_geometry(tmp_path, rng):
    intrin = CameraIntrinsics.d415(212, 120)
    model = _model(tmp_path, rng)
    pipe = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=120, width=212, labels_reduce=2),
        group_min_size=0.02,
    )
    depth = _small_scene(intrin)

    # plane: build the true transform analytically (normal + anchor)
    n = np.array([0.03, -0.06, 1.0]); n /= np.linalg.norm(n)
    a = np.cross(n, [1, 0, 0.0]); a /= np.linalg.norm(a)
    b = np.cross(n, a)
    # a point on the table: center pixel depth
    z0 = (2600.0) / n[2]
    p0 = np.array([0.0, 0.0, 2600.0 / n[2]])
    rot = np.stack([a, b, n])
    mat = np.eye(4, dtype=np.float32)
    mat[:3, :3] = rot
    mat[:3, 3] = -rot @ p0

    out = pipe(jnp.asarray(depth), jnp.asarray(mat))
    g_info = np.asarray(out["g_info"])
    assert g_info[0, 0] > 0 and g_info[1, 0] > 0  # both hands found
    heights = np.asarray(out["heights"])
    valid = np.asarray(out["tip_valid"])
    # wherever a fingertip class is present, its height is ~300 above plane
    assert valid.any()
    got = heights[valid]
    assert np.all(np.abs(got - 300.0) < 60.0), got


def test_app_emits_midi_on_taps(tmp_path, rng):
    intrin = CameraIntrinsics.d415(212, 120)
    model = _model(tmp_path, rng)

    class Source:
        intrinsics = intrin

        def frames(self):
            t = 0
            while True:
                # tap cycle: high -> fast down -> hold low -> back up
                cycle = [1.0, 1.0, 0.35, 0.2, 0.2, 0.2, 1.0, 1.0]
                tap = cycle[t % len(cycle)]
                yield Frame(depth=_small_scene(intrin, tap=tap), timestamp=t / 90.0)
                t += 1

        def stop(self):
            pass

    cfg = AppConfig(
        plane_num_iterations=512, group_min_size=0.02, warmup_frames=2,
        min_velocity=5.0,
        default_fingertip_thresholds=(120.0, 120.0, 120.0, 120.0, 120.0),
    )
    app = BeatsApp(model, Source(), midi=Midi(), cfg=cfg, log=lambda *a: None)
    app.run(max_frames=40)

    events = app.midi.sink.note_events()
    ons = [e for e in events if e[1] == "on"]
    offs = [e for e in events if e[1] == "off"]
    assert len(ons) > 0, "no note-on events from synthetic taps"
    assert len(offs) > 0
    # velocities within MIDI range, notes from the configured bases
    for _, _, note, vel in ons:
        assert 36 <= note <= 46
        assert 1 <= vel <= 127


def test_synthetic_source_shapes():
    s = SyntheticSource(CameraIntrinsics.d415(212, 120))
    it = s.frames()
    f = next(it)
    assert f.depth.shape == (120, 212)
    assert f.depth.dtype == np.uint16
