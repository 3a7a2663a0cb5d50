#!/usr/bin/env python3
"""Convert a recorded (depth + color) session into RDF training data
(reference src/live_data_convert.py; same CLI contract plus .npz sessions)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from beats3d_tpu.data.datagen import DatagenConfig, LiveDataConvert
from beats3d_tpu.models import DecisionForest
from beats3d_tpu.runtime import camera


def main():
    parser = argparse.ArgumentParser(
        description="Convert a recorded session into training data for RDF"
    )
    parser.add_argument("-i", "--bag_in", type=str, default=None,
                        help="RealSense .bag input (needs pyrealsense2)")
    parser.add_argument("--session", type=str, default=None,
                        help=".npz recorded session input")
    parser.add_argument("-o", "--out", required=True, type=str)
    parser.add_argument("--colors", required=True, type=int,
                        help="Num colors to fit for labels")
    parser.add_argument("--plane_z_threshold", required=True, type=float)
    parser.add_argument("--max_images", type=int, default=None)
    parser.add_argument("--frames_timestamp_max_diff", type=float, default=6.0)
    parser.add_argument("--mask_model", type=str, default=None)
    parser.add_argument("--mask_label", type=int, default=None)
    parser.add_argument("--gaussian_noise", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    if bool(args.mask_model) != bool(args.mask_label):
        parser.error("--mask_model and --mask_label are both required together")

    if args.session:
        source = camera.RecordedSource(args.session)
    elif args.bag_in:
        # color must be reprojected into the depth frame for labeling
        # (rs.align; reference live_data_convert.py:396-400)
        source = camera.RealSenseSource(bag=args.bag_in, align_color=True)
    else:
        parser.error("need --session or --bag_in")

    cfg = DatagenConfig(
        num_colors=args.colors,
        plane_z_threshold=args.plane_z_threshold,
        max_images=args.max_images,
        gaussian_noise=args.gaussian_noise,
        frames_timestamp_max_diff=args.frames_timestamp_max_diff,
        mask_label=args.mask_label,
    )
    mask_model = DecisionForest.load(args.mask_model) if args.mask_model else None
    conv = LiveDataConvert(
        args.out, source.intrinsics, cfg, mask_model=mask_model,
        rng=np.random.default_rng(args.seed),
    )

    for frame in source.frames():
        if frame.color is None:
            continue
        if not conv.process_frame(
            frame.depth, frame.color,
            depth_timestamp=frame.timestamp,
            color_timestamp=frame.color_timestamp,
        ):
            break
    source.stop()
    out_cfg = conv.finish()
    print(
        f"wrote {out_cfg['num_images']} images to {args.out} "
        f"({conv.frames_skipped} pairs rejected by timestamp gate)"
    )


if __name__ == "__main__":
    main()
