#!/usr/bin/env python3
"""Single (non-layered) forest live demo (reference src/run_live.py:16-142,
headless): plane-filtered depth through one forest, label renders out."""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from beats3d_tpu.models import DecisionForest
from beats3d_tpu.ops import forest_eval, plane as plane_ops, points
from beats3d_tpu.runtime import camera
from beats3d_tpu.utils.profiler import FrameTimeLog


@jax.jit
def _frame(depth, mat, pp, fx, tables, threshold):
    pts = points.deproject_points(depth, pp, fx)
    q = points.transform_points(pts, mat)
    qf = points.filter_points_by_plane(q, threshold)
    d = points.setup_depth_image_for_forest(qf, depth)
    return forest_eval.evaluate_forest(d[None], tables)[0]


def main():
    parser = argparse.ArgumentParser(description="Live RDF demo (TPU)")
    parser.add_argument("-m", "--model", required=True, type=str,
                        help=".npy forest model")
    parser.add_argument("--plane_num_iterations", type=int, default=25000)
    parser.add_argument("--plane_z_threshold", type=float, default=40.0)
    camera.add_args(parser)
    args = parser.parse_args()

    source = camera.open_source(args)
    intrin = source.intrinsics
    forest = DecisionForest.load(args.model)
    tables = forest.pack().tables()
    cal = plane_ops.CalibratedPlane(
        args.plane_num_iterations, args.plane_z_threshold
    )

    ft = FrameTimeLog()
    n = 0
    try:
        for frame in source.frames():
            ft.tick()
            n += 1
            if n <= 15:
                continue
            depth = jnp.asarray(frame.depth)
            if not cal.is_set():
                pts = points.deproject_points(
                    depth, jnp.asarray(intrin.pp), jnp.float32(intrin.fx)
                )
                cal.make(pts)
            labels = _frame(
                depth, cal.get_mat(), jnp.asarray(intrin.pp),
                jnp.float32(intrin.fx), tables,
                jnp.float32(args.plane_z_threshold),
            )
            if n % 30 == 0:
                hist = np.unique(np.asarray(labels), return_counts=True)
                print(f"frame {n}: {ft.last_ms:.1f} ms/frame, labels "
                      f"{dict(zip(hist[0].tolist(), hist[1].tolist()))}")
            if args.frames and n >= args.frames:
                break
    finally:
        source.stop()


if __name__ == "__main__":
    main()
