#!/usr/bin/env python3
"""Fit a cylinder to a labeled region by render-and-compare random search
(reference src/pose_fit.py, headless)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax.numpy as jnp

from beats3d_tpu.models import DecisionForest
from beats3d_tpu.ops import forest_eval, meanshift, plane as plane_ops, points
from beats3d_tpu.ops.posefit import CylinderTform, fit_cylinder
from beats3d_tpu.runtime import camera


def main():
    parser = argparse.ArgumentParser(description="Cylinder pose fit (TPU)")
    parser.add_argument("-m", "--model", required=True, type=str)
    parser.add_argument("--plane_num_iterations", type=int, default=25000)
    parser.add_argument("--plane_z_threshold", required=True, type=float)
    parser.add_argument("--iterations", type=int, default=200)
    parser.add_argument("--target_label", type=int, default=1)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--view", type=str, default=None, metavar="OUT.html",
        help="write an interactive 3D orbit view of the fit: the target-"
             "label point cloud plus the cylinder at each accepted pose "
             "(the reference's live GL fit view, ref pose_fit.py:90-385)")
    camera.add_args(parser)
    args = parser.parse_args()

    source = camera.open_source(args)
    intrin = source.intrinsics
    forest = DecisionForest.load(args.model)
    tables = forest.pack().tables()
    cal = plane_ops.CalibratedPlane(
        args.plane_num_iterations, args.plane_z_threshold
    )

    # skip camera warm-up frames, but tolerate short recorded sessions
    frame = None
    for i, frame in enumerate(source.frames()):
        if i >= 14:
            break
    if frame is None:
        raise SystemExit("no frames in source")
    depth = jnp.asarray(frame.depth)
    pts = points.deproject_points(
        depth, jnp.asarray(intrin.pp), jnp.float32(intrin.fx)
    )
    cal.make(pts)
    mat = np.asarray(cal.get_mat())

    q = points.transform_points(pts, cal.get_mat())
    qf = points.filter_points_by_plane(q, args.plane_z_threshold)
    d = points.setup_depth_image_for_forest(qf, depth)
    labels = forest_eval.evaluate_forest(d[None], tables)[0]

    variances = jnp.asarray(
        np.full(forest.num_classes - 1, 50.0, np.float32)
    )
    means = np.asarray(
        meanshift.mean_shift(
            labels, variances, num_classes=forest.num_classes - 1, num_rounds=6
        )
    )
    px, py = means[args.target_label - 1].astype(int)
    z = float(np.asarray(depth)[py, px])
    p = mat @ np.array(
        [
            z * (px - intrin.ppx) / intrin.fx,
            z * (py - intrin.ppy) / intrin.fy,
            z,
            1.0,
        ]
    )

    init = CylinderTform()
    init.t[:] = p[0:3]
    init.s[:] = [200.0 * 1.3, 200.0, 800.0]

    obs = np.asarray(points.remove_missing_3d_points_from_depth_image(qf, depth))
    poses = []
    best, cost, history = fit_cylinder(
        obs, np.asarray(labels), mat, init,
        intrin.pp, intrin.fx,
        target_label=args.target_label,
        iterations=args.iterations,
        rng=np.random.default_rng(args.seed),
        log=print,
        on_improve=lambda i, c, tf: poses.append((i, c, tf)),
    )
    print(f"final cost {cost:.1f}; t={best.t} r={best.r} s={best.s}")
    if args.view:
        write_fit_view(
            args.view, np.asarray(qf), np.asarray(labels),
            args.target_label, poses,
        )
        print(f"wrote {args.view}")
    source.stop()


def write_fit_view(out, qf, labels, target_label, poses, max_obs=25000):
    """Orbit-viewer HTML of the fit: target-label observation cloud (blue)
    + the cylinder surface at up to 6 accepted poses, early poses dim,
    the final pose bright green."""
    from beats3d_tpu.ops.posefit import cylinder_surface
    from beats3d_tpu.utils.orbit_html import write_orbit_html

    sel = (labels == target_label) & (qf[..., 2] != 0)
    cloud = qf[sel][:, :3]
    if cloud.shape[0] > max_obs:
        cloud = cloud[:: cloud.shape[0] // max_obs + 1]
    pts = [cloud]
    cols = ["#4a69bd"] * cloud.shape[0]

    if len(poses) > 6:  # first, last, and 4 spread between
        keep = [0] + list(
            np.linspace(1, len(poses) - 2, 4).astype(int)
        ) + [len(poses) - 1]
        poses = [poses[i] for i in keep]
    surf = cylinder_surface(48, 24)
    shades = ["#5a4630", "#75592f", "#90702c", "#ab8a25", "#c6a718"]
    for k, (_, _, tf) in enumerate(poses):
        final = k == len(poses) - 1
        p = (tf.get_tform() @ surf.T).T[:, :3]
        pts.append(p)
        cols.extend(
            ["#37e06b" if final else shades[min(k, len(shades) - 1)]]
            * p.shape[0]
        )
    info = (
        f"pose_fit: {cloud.shape[0]} label-{target_label} pts, "
        f"{len(poses)} poses (final green), cost "
        f"{poses[-1][1]:.1f}" if poses else "pose_fit: no poses"
    )
    write_orbit_html(out, np.concatenate(pts), cols, info, title="pose_fit")


if __name__ == "__main__":
    main()
