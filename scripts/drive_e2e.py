"""End-to-end drive on the real chip (verify-skill recipe): synthetic tilted
table + two hand blobs -> RANSAC plane -> full pipeline -> check groups,
labels, heights."""
import numpy as np
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache, CameraIntrinsics
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model
from beats3d_tpu.ops import plane as plane_mod, points
from beats3d_tpu.runtime.pipeline import FramePipeline


def main():
    intrin = CameraIntrinsics.d415()
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n = np.array([0.03, -0.05, 1.0]); n /= np.linalg.norm(n)
    depth = (2600.0 - n[0] * (xx - intrin.ppx) * 8 - n[1] * (yy - intrin.ppy) * 8) / n[2]
    for cx in (int(0.3 * w), int(0.7 * w)):
        blob = (xx - cx) ** 2 + (yy - h / 2) ** 2 < 130 ** 2
        depth[blob] -= 300.0
    depth = jnp.asarray(depth.astype(np.uint16))

    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)

    pts = points.deproject_points(depth, jnp.asarray(intrin.pp), jnp.float32(intrin.fx))
    cp = plane_mod.CalibratedPlane(25000, 40.0)
    mat = cp.make(pts)

    out = pipe(depth, jnp.asarray(mat))
    g = np.asarray(out["g_info"])
    labels = np.asarray(out["labels"])
    heights = np.asarray(out["heights"])
    valid = np.asarray(out["tip_valid"])

    print("g_info:\n", g)
    hist = {int(v): int(c) for v, c in zip(*np.unique(labels, return_counts=True))}
    print("label histogram:", hist)
    print("heights:\n", heights)
    print("valid:\n", valid)

    assert g[0, 0] > 0 and g[1, 0] > 0, "both hands must be found"
    assert g[0, 1] < 106 / 2 <= g[1, 1], "right/left centroid halves"
    non_bg = {k: v for k, v in hist.items() if k != 65535}
    assert len(non_bg) >= 2, "label histogram degenerate"
    got = heights[valid]
    assert got.size > 0 and np.all(np.abs(got - 300.0) < 40.0), got
    print("PASS")


if __name__ == "__main__":
    main()
