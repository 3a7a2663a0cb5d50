#!/usr/bin/env python3
"""Layered-RDF live demo: single hand, no grouping/MIDI — plane-filtered depth
through the layered forest, label renders out
(reference src/run_live_layered.py:16-161, headless)."""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.models.layered import run_layered
from beats3d_tpu.ops import plane as plane_ops
from beats3d_tpu.ops import points
from beats3d_tpu.runtime import camera
from beats3d_tpu.utils.profiler import FrameTimeLog


@functools.partial(jax.jit, static_argnames=("filter_specs", "labels_reduce"))
def _frame(depth, mat, pp, fx, tables, conditions, colors, threshold,
           scale_factor, *, filter_specs, labels_reduce):
    pts = points.deproject_points(depth, pp, fx)
    q = points.transform_points(pts, mat)
    qf = points.filter_points_by_plane(q, threshold)
    d = points.setup_depth_image_for_forest(qf, depth)
    labels = run_layered(
        d[None], tables, conditions,
        filter_specs=filter_specs, labels_reduce=labels_reduce,
        scale_factor=scale_factor,
    )[0]
    return labels, points.make_rgba_from_labels(labels, colors)


def main():
    parser = argparse.ArgumentParser(description="Layered RDF demo (TPU)")
    parser.add_argument("-cfg", required=True, type=str)
    parser.add_argument("--plane_num_iterations", type=int, default=25000)
    parser.add_argument("--plane_z_threshold", type=float, default=40.0)
    parser.add_argument("--out", type=str, default=None,
                        help="directory for label RGBA dumps")
    camera.add_args(parser)
    args = parser.parse_args()

    source = camera.open_source(args)
    intrin = source.intrinsics
    TRAIN_DIM_X = 848
    LABELS_REDUCE = 2

    model = LayeredDecisionForest.load(args.cfg, labels_reduce=LABELS_REDUCE)
    tables = model.layer_tables()
    fspecs = tuple((l.filter_model, l.filter_model_class) for l in model.layers)
    colors = jnp.asarray(model.label_colors)
    cal = plane_ops.CalibratedPlane(
        args.plane_num_iterations, args.plane_z_threshold
    )

    ft = FrameTimeLog()
    n = 0
    try:
        for frame in source.frames():
            ft.tick()
            n += 1
            if n <= 15:  # camera warm-up (reference :74)
                continue
            depth = jnp.asarray(frame.depth)
            if not cal.is_set():
                pts = points.deproject_points(
                    depth, jnp.asarray(intrin.pp), jnp.float32(intrin.fx)
                )
                cal.make(pts)
            labels, rgba = _frame(
                depth, cal.get_mat(), jnp.asarray(intrin.pp),
                jnp.float32(intrin.fx), tables, model.conditions, colors,
                jnp.float32(args.plane_z_threshold),
                jnp.float32(intrin.width / TRAIN_DIM_X),
                filter_specs=fspecs, labels_reduce=LABELS_REDUCE,
            )
            if n % 30 == 0:
                hist = np.unique(np.asarray(labels), return_counts=True)
                print(f"frame {n}: {ft.last_ms:.1f} ms/frame, labels "
                      f"{dict(zip(hist[0].tolist(), hist[1].tolist()))}")
                if args.out:
                    from PIL import Image

                    os.makedirs(args.out, exist_ok=True)
                    Image.fromarray(np.asarray(rgba)).save(
                        os.path.join(args.out, f"labels_{n:06d}.png")
                    )
            if args.frames and n >= args.frames:
                break
    finally:
        source.stop()


if __name__ == "__main__":
    main()
