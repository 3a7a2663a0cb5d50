#!/usr/bin/env python3
"""Point-cloud + plane-fit debug viewer (reference src/pointcloids.py: a CPU
RANSAC variant with a pptk window).  Headless equivalent: numpy-only
deprojection + RANSAC (never touches the accelerator — it's a debug tool),
emitting a SELF-CONTAINED interactive HTML viewer (drag to orbit, wheel to
zoom; plane inliers tinted) plus plane statistics on stdout.

  python apps/pointcloids.py --session s.npz -o cloud.html
  python apps/pointcloids.py --synthetic -o cloud.html --frame_index 5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from beats3d_tpu.runtime import camera
from beats3d_tpu.utils.orbit_html import write_orbit_html


def deproject(depth, intrin, stride):
    h, w = depth.shape
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    d = depth[::stride, ::stride].astype(np.float32)
    valid = (d > 0) & (d < 65535)
    x = d * (xs - intrin.ppx) / intrin.fx
    y = d * (ys - intrin.ppy) / intrin.fy
    pts = np.stack([x, y, d], axis=-1)[valid]
    return pts


def ransac_plane(pts, iters, thresh, rng):
    """Plain-numpy RANSAC (the reference pointcloids' CPU variant): best
    (normal, d) by inlier count over random 3-point candidates."""
    best = (None, -1)
    n = pts.shape[0]
    for _ in range(iters):
        a, b, c = pts[rng.integers(0, n, 3)]
        nrm = np.cross(b - a, c - a)
        norm = np.linalg.norm(nrm)
        if norm < 1e-6:
            continue
        nrm = nrm / norm
        dist = np.abs((pts - a) @ nrm)
        inliers = int((dist < thresh).sum())
        if inliers > best[1]:
            best = ((nrm, a), inliers)
    (nrm, anchor), inliers = best
    if nrm[2] < 0:
        nrm = -nrm
    return nrm, anchor, inliers


def main():
    parser = argparse.ArgumentParser(description="point cloud debug viewer")
    parser.add_argument("-o", "--out", type=str, default="pointcloids.html")
    parser.add_argument("--frame_index", type=int, default=0)
    parser.add_argument("--stride", type=int, default=4,
                        help="pixel subsampling for the viewer")
    parser.add_argument("--ransac_iters", type=int, default=600)
    parser.add_argument("--plane_threshold", type=float, default=40.0)
    parser.add_argument("--seed", type=int, default=0)
    camera.add_args(parser)
    args = parser.parse_args()

    if not (args.session or args.synthetic or args.rs_bag):
        args.synthetic = True
    source = camera.open_source(args)
    it = source.frames()
    frame = None
    for _ in range(args.frame_index + 1):
        frame = next(it)
    source.stop()

    pts = deproject(frame.depth, source.intrinsics, args.stride)
    rng = np.random.default_rng(args.seed)
    nrm, anchor, inliers = ransac_plane(
        pts, args.ransac_iters, args.plane_threshold, rng
    )
    dist = (pts - anchor) @ nrm
    above = dist < -args.plane_threshold  # toward the camera
    print(f"points: {pts.shape[0]}  plane normal: {np.round(nrm, 4)}  "
          f"inliers: {inliers} ({inliers / pts.shape[0]:.1%})  "
          f"above-plane points: {int(above.sum())}")

    # cap the HTML payload
    keep = min(60000, pts.shape[0])
    sel = rng.choice(pts.shape[0], keep, replace=False)
    colors = np.where(
        above[sel], "#ff9f43",
        np.where(np.abs(dist[sel]) < args.plane_threshold, "#4a69bd",
                 "#556"),
    )
    write_orbit_html(
        args.out, pts[sel], colors.tolist(),
        f"{keep} pts, normal {np.round(nrm, 3).tolist()}, {inliers} inliers",
        title="pointcloids",
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
