"""Run the BeatsApp live loop on an ARTICULATED tapping session with the
flagship v2 model and append the session record to models/flagship/
RESULTS.json (the app-level end-to-end proof: articulated frames -> labels
-> mean-shift tips -> tap state machines -> MIDI note events).

The session: two articulated hands whose height above the table oscillates
(fingers mostly extended), so fingertip heights sweep through the tap
thresholds and the HandState machines emit note on/offs — the instrument
actually playing, on the geometry family the model was trained on.

Run on the chip after scripts/flagship_v2.py:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bz3d_session_v2.py [frames]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "models/flagship"


def main():
    from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
    enable_compilation_cache()

    from bench import load_flagship
    from beats3d_tpu.data.synth import (
        compose, hand_cloud, splat_hand, table_depth)
    from beats3d_tpu.runtime.app import AppConfig, BeatsApp
    from beats3d_tpu.runtime.camera import Frame
    from beats3d_tpu.runtime.midi import Midi

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    intrin = CameraIntrinsics.d415()
    tz = table_depth(intrin)
    rng = np.random.default_rng(5)
    # fixed hand shapes for the whole session (a player's hands don't morph);
    # extended fingers so the tips are the lowest points
    right, rcols = hand_cloud(rng, flex_scale=0.25)
    left, lcols = hand_cloud(rng, flex_scale=0.25)

    print(f"[session] pre-rendering {n_frames} articulated frames...",
          flush=True)
    t0 = time.time()
    frames = []
    for t in range(n_frames):
        # hands bounce: heights sweep 120..260 units above the table, so
        # fingertip heights cross the ~150-200 thresholds each cycle
        h_r = 190.0 + 70.0 * np.sin(t / 7.0)
        h_l = 190.0 + 70.0 * np.sin(t / 9.0 + 1.3)
        layers = [
            splat_hand(intrin, tz, right, rcols, 0.30 * intrin.width,
                       0.55 * intrin.height, h_r, 0.1),
            splat_hand(intrin, tz, left, lcols, 0.70 * intrin.width,
                       0.55 * intrin.height, h_l, -0.1, mirror=True),
        ]
        depth, _ = compose(tz, layers)
        frames.append(depth)
    print(f"[session] rendered in {time.time() - t0:.0f}s", flush=True)

    class Source:
        intrinsics = intrin

        def frames(self):
            for t, d in enumerate(frames):
                yield Frame(depth=d, timestamp=t / 90.0)

        def stop(self):
            pass

    app_cfg = AppConfig(
        plane_num_iterations=8192, warmup_frames=2, min_velocity=2.0,
        default_fingertip_thresholds=(170.0,) * 5,
    )
    app = BeatsApp(load_flagship(), Source(), midi=Midi(), cfg=app_cfg,
                   log=lambda *a: None)
    t0 = time.time()
    n = app.run(max_frames=n_frames)
    dt = time.time() - t0
    events = app.midi.sink.note_events()
    ons = [e for e in events if e[1] == "on"]
    labels_out = app.last_out and np.asarray(app.last_out["labels"])
    hist = {int(k): int(v) for k, v in
            zip(*np.unique(labels_out, return_counts=True))}
    rec = {
        "frames": int(n),
        "fps": round(n / dt, 1),
        "note_ons": len(ons),
        "note_events": len(events),
        "label_histogram": {str(k): v for k, v in sorted(hist.items())},
        "scene": "articulated bouncing hands (data/synth.py)",
        "note": "session fps includes one-time XLA/Mosaic compile and "
                "per-frame host round trips over the axon tunnel; "
                "steady-state numbers are in live_pipeline/BENCH",
    }
    print(json.dumps(rec), flush=True)

    path = os.path.join(OUT, "RESULTS.json")
    with open(path) as f:
        summary = json.load(f)
    summary["bz3d_session"] = rec
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print("appended bz3d_session to", path)


if __name__ == "__main__":
    main()
