"""RANSAC plane calibration: geometry + recovery of a synthetic table plane."""

import jax
import numpy as np

from beats3d_tpu.ops import plane, points


def _synthetic_table_scene(rng, h=48, w=64):
    """Points: a dominant tilted plane + a blob of outliers above it."""
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    n = np.array([0.05, -0.1, 1.0])
    n /= np.linalg.norm(n)
    # plane z = 2000 - (n.x*x + n.y*y)/n.z-ish; construct directly
    z = (2000.0 - n[0] * xx * 10 - n[1] * yy * 10) / n[2]
    pts = np.stack([xx * 10, yy * 10, z, np.ones_like(z)], axis=-1)
    # hand blob floats 300 units above the plane (toward camera)
    blob = (xx - 30) ** 2 + (yy - 20) ** 2 < 36
    pts[blob, 2] -= 300.0
    # some invalid points
    pts[0:3, 0:5] = 0.0
    return pts.astype(np.float32), n


def test_calibrate_recovers_plane(rng):
    pts, n = _synthetic_table_scene(rng)
    key = jax.random.PRNGKey(0)
    mat = np.asarray(
        plane.calibrate_plane(key, pts, 4.0, num_candidates=2000)
    )
    # rows 0..2 of the rotation are orthonormal
    r = mat[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-2)
    # plane-space z of on-plane points ~ 0; blob points far from 0
    flat = pts.reshape(-1, 4)
    q = (mat @ flat.T).T
    on_plane = (flat[:, 3] == 1) & (np.abs(q[:, 2]) < 4.0)
    frac = on_plane.sum() / (flat[:, 3] == 1).sum()
    assert frac > 0.9
    # camera forward ray hits plane-space origin in (x, y)
    p0, p1 = mat[2, 2], mat[2, 3]
    c = mat @ np.array([0, 0, -p1 / p0, 1.0])
    assert abs(c[2]) < 0.5
    assert abs(c[0]) < 0.5 and abs(c[1]) < 0.5


def test_start_mat_seeding_keeps_good_plane(rng):
    pts, _ = _synthetic_table_scene(rng)
    key = jax.random.PRNGKey(1)
    good = plane.calibrate_plane(key, pts, 4.0, num_candidates=2000)
    # re-calibrate with candidate 0 seeded by the good plane but only junk
    # random candidates: result should score at least as well as `good`.
    key2 = jax.random.PRNGKey(2)
    refined = np.asarray(
        plane.calibrate_plane(key2, pts, 4.0, num_candidates=64, start_mat=good)
    )
    flat = pts.reshape(-1, 4)
    def inliers(m):
        q = (np.asarray(m) @ flat.T).T
        return ((flat[:, 3] == 1) & (np.abs(q[:, 2]) < 4.0)).sum()
    assert inliers(refined) >= 0.95 * inliers(good)


def test_filter_after_transform(rng):
    pts, _ = _synthetic_table_scene(rng)
    key = jax.random.PRNGKey(0)
    mat = plane.calibrate_plane(key, pts, 4.0, num_candidates=2000)
    q = np.asarray(points.transform_points(pts, mat))
    filtered = np.asarray(points.filter_points_by_plane(q, 40.0))
    # table points (|z| < 40 in plane space) zeroed; blob survives
    kept = filtered[..., 3] == 1
    assert kept.sum() > 0
    assert np.all(filtered[kept][:, 2] <= -40.0)
    # blob pixels mostly kept
    assert kept[18:22, 28:32].mean() > 0.9
