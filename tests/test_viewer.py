"""Live viewer server: state snapshot, tunable mutation, actions."""

import json
import urllib.request

import numpy as np

import fixtures

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.app import AppConfig, BeatsApp
from beats3d_tpu.runtime.camera import SyntheticSource
from beats3d_tpu.runtime.midi import Midi
from beats3d_tpu.runtime.viewer import ViewerServer
from beats3d_tpu.utils import CameraIntrinsics


def test_viewer_state_and_tunables(tmp_path, rng):
    intrin = CameraIntrinsics.d415(212, 120)
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    src = SyntheticSource(intrin)
    app = BeatsApp(
        model, src, midi=Midi(),
        cfg=AppConfig(plane_num_iterations=512, warmup_frames=1,
                      group_min_size=0.02),
        log=lambda *a: None,
    )
    viewer = ViewerServer(app, port=0, render_every=1).start()
    base = f"http://127.0.0.1:{viewer.port}"
    try:
        it = src.frames()
        for _ in range(4):
            out = app.tick(next(it))
            viewer.push(out)

        page = urllib.request.urlopen(base + "/").read().decode()
        assert "3d-beats" in page and "recalibrate" in page

        state = json.loads(
            urllib.request.urlopen(base + "/state.json").read()
        )
        assert state["frame"] == 4
        assert len(state["heights"]) == 2 and len(state["heights"][0]) == 5
        assert state["labels_png"]  # a render made it through
        # MIDI selector surface (3d_bz.py:311-317): list mirrors the Midi
        # object (empty under the sink fallback), port index rides along.
        assert state["midi_ports"] == app.midi.port_names
        assert state["midi_port"] == app.midi.port

        req = urllib.request.Request(
            base + "/action",
            data=json.dumps({"action": "set_midi_port", "port": 0}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req)  # no rtmidi here: must be a safe no-op
        assert app.midi.out is None

        req = urllib.request.Request(
            base + "/tunables",
            data=json.dumps({"z_thresh_offset": 42.0,
                             "not_a_field": 1.0}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req)
        assert app.cfg.z_thresh_offset == 42.0
        assert not hasattr(app.cfg, "not_a_field")

        req = urllib.request.Request(
            base + "/action",
            data=json.dumps({"action": "recalibrate_plane"}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req)
        assert app.calibrate_next_frame
    finally:
        viewer.stop()
