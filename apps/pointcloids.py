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
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from beats3d_tpu.runtime import camera

HTML = """<!doctype html><html><head><meta charset="utf-8">
<title>pointcloids</title><style>
 body{margin:0;background:#0b0b10;color:#ccc;font:12px monospace}
 #info{position:fixed;top:8px;left:10px}
 canvas{display:block}
</style></head><body>
<div id="info">%INFO% — drag: orbit, wheel: zoom</div>
<canvas id="c"></canvas>
<script>
const pts=%POINTS%; const cols=%COLORS%;
const cv=document.getElementById('c'), g=cv.getContext('2d');
let W,H; function rs(){W=cv.width=innerWidth;H=cv.height=innerHeight;}
rs(); onresize=rs;
let rx=-0.9, rz=0.0, zoom=0.9, cx=0, cy=0, czm=0;
for(const p of pts){cx+=p[0];cy+=p[1];czm+=p[2];}
cx/=pts.length; cy/=pts.length; czm/=pts.length;
let drag=null;
cv.onmousedown=e=>drag=[e.clientX,e.clientY];
onmouseup=()=>drag=null;
onmousemove=e=>{if(!drag)return; rz+=(e.clientX-drag[0])*0.008;
 rx+=(e.clientY-drag[1])*0.008; drag=[e.clientX,e.clientY]; draw();};
onwheel=e=>{zoom*=e.deltaY<0?1.1:0.9; draw();};
function draw(){
 g.fillStyle='#0b0b10'; g.fillRect(0,0,W,H);
 const s=Math.min(W,H)*zoom*0.0004;
 const ca=Math.cos(rz),sa=Math.sin(rz),cb=Math.cos(rx),sb=Math.sin(rx);
 for(let i=0;i<pts.length;i++){
  const x=pts[i][0]-cx, y=pts[i][1]-cy, z=pts[i][2]-czm;
  const x1=x*ca-y*sa, y1=x*sa+y*ca;
  const y2=y1*cb-z*sb, z2=y1*sb+z*cb;
  g.fillStyle=cols[i];
  g.fillRect(W/2+x1*s, H/2+y2*s, 2, 2);
 }
}
draw();
</script></body></html>"""


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
    html = (
        HTML
        .replace("%INFO%", f"{keep} pts, normal {np.round(nrm, 3).tolist()}, "
                           f"{inliers} inliers")
        .replace("%POINTS%", json.dumps(np.round(pts[sel], 1).tolist()))
        .replace("%COLORS%", json.dumps(colors.tolist()))
    )
    with open(args.out, "w") as f:
        f.write(html)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
