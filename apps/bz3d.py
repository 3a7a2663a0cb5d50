#!/usr/bin/env python3
"""3d-beats, TPU edition — the live 2-hand 10-finger MIDI instrument.

Equivalent of the reference entry point src/3d_bz.py (see SURVEY.md §3.1 for
the frame call stack being reproduced).  Headless: camera (or recorded/
synthetic) frames in, MIDI out, optional PNG debug renders.

Examples:
  python apps/bz3d.py -cfg model/model_cfg.json --synthetic --frames 200
  python apps/bz3d.py -cfg model/model_cfg.json --session session.npz
  python apps/bz3d.py -cfg model/model_cfg.json            # live RealSense
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.utils import enable_compilation_cache
from beats3d_tpu.runtime import camera
from beats3d_tpu.runtime.app import AppConfig, BeatsApp
from beats3d_tpu.runtime.midi import Midi


def main():
    parser = argparse.ArgumentParser(description="3d-beats (TPU)")
    parser.add_argument("-cfg", required=True, type=str,
                        help="layered decision forest config JSON")
    parser.add_argument("--plane_num_iterations", type=int, default=25000)
    parser.add_argument("--no_debug", action="store_true")
    parser.add_argument("--dump_labels", type=str, default=None,
                        help="directory for periodic label RGBA dumps")
    parser.add_argument("--viewer", action="store_true",
                        help="serve the live dashboard (labels, per-finger "
                             "height graphs, ms/frame, tunable sliders)")
    parser.add_argument("--viewer_port", type=int, default=8799)
    camera.add_args(parser)
    args = parser.parse_args()

    try:
        enable_compilation_cache()
    except Exception:
        pass
    cfg = AppConfig(plane_num_iterations=args.plane_num_iterations)
    source = camera.open_source(args)
    model = LayeredDecisionForest.load(args.cfg, labels_reduce=cfg.labels_reduce)
    app = BeatsApp(model, source, midi=Midi(), cfg=cfg)

    viewer = None
    if args.viewer:
        from beats3d_tpu.runtime.viewer import ViewerServer

        viewer = ViewerServer(app, port=args.viewer_port).start()
        print(f"viewer: http://127.0.0.1:{viewer.port}/")

    n = 0
    try:
        for frame in source.frames():
            out = app.tick(frame)
            n += 1
            if viewer is not None:
                viewer.push(out)
            if out is not None and not args.no_debug and n % 30 == 0:
                times = app.timer.spans()
                notes = [
                    (h.fingertips[i].midi_note, h.fingertips[i].note_on)
                    for h in app.hand_states
                    for i in range(5)
                ]
                on = [str(x[0]) for x in notes if x[1]]
                print(
                    f"frame {n}: {app.frame_times.last_ms:.1f} ms/frame, "
                    f"notes on: {on or '-'}"
                )
                if args.dump_labels:
                    from PIL import Image

                    os.makedirs(args.dump_labels, exist_ok=True)
                    rgba = app.labels_rgba()
                    if rgba is not None:
                        Image.fromarray(rgba).save(
                            os.path.join(args.dump_labels, f"labels_{n:06d}.png")
                        )
            if args.frames and n >= args.frames:
                break
    finally:
        source.stop()
        if viewer is not None:
            viewer.stop()
    print(f"processed {n} frames; {len(app.midi.sink.events)} midi events")


if __name__ == "__main__":
    main()
