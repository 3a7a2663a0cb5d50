"""Point-splat renderer, hole fill, image cost, and pose fitting."""

import os

import numpy as np

import jax.numpy as jnp

from beats3d_tpu.ops import points, render
from beats3d_tpu.ops.posefit import CylinderTform, cylinder_surface, fit_cylinder
from beats3d_tpu.utils import CameraIntrinsics

MAX_UINT16 = 65535


def _cloud(intrin, depth):
    return points.deproject_points(
        jnp.asarray(depth), jnp.asarray(intrin.pp), jnp.float32(intrin.fx)
    )


def test_splat_identity_roundtrip(rng):
    """Deproject then splat with no transform reproduces the depth image."""
    intrin = CameraIntrinsics.d415(64, 48)
    depth = rng.integers(500, 3000, (48, 64)).astype(np.uint16)
    depth[10:14, 10:14] = 0
    pts = _cloud(intrin, depth)
    colors = rng.integers(1, 255, (48, 64, 3)).astype(np.uint8)
    d, c = render.splat_points(pts, jnp.asarray(colors), intrin.pp, intrin.fx)
    d = np.asarray(d)
    valid = depth > 0
    # allow off-by-one from float round-trips at pixel edges
    close = np.abs(d.astype(int) - depth.astype(int)) <= 1
    assert (close | ~valid).mean() > 0.98
    got_c = np.asarray(c)
    assert (got_c[valid] > 0).any()
    assert (got_c[~valid] == 0).all()


def test_splat_z_order():
    """Two points projecting to the same pixel: nearest wins."""
    intrin = CameraIntrinsics.d415(16, 16)
    pts = np.zeros((16, 16, 4), np.float32)
    # two source pixels project onto the optical axis at different z
    pts[0, 0] = [0, 0, 1000, 1]
    pts[1, 1] = [0, 0, 900, 1]
    colors = np.zeros((16, 16, 3), np.uint8)
    colors[0, 0] = (10, 10, 10)
    colors[1, 1] = (20, 20, 20)
    d, c = render.splat_points(
        jnp.asarray(pts), jnp.asarray(colors), intrin.pp, intrin.fx
    )
    cx, cy = int(intrin.ppx), int(intrin.ppy)
    assert int(d[cy, cx]) == 900
    assert int(c[cy, cx, 0]) == 20


def test_fill_holes():
    d = np.full((8, 8), 1000, np.uint16)
    c = np.full((8, 8, 3), 7, np.uint8)
    d[4, 4] = 0
    c[4, 4] = 0
    d2, c2 = render.fill_holes(jnp.asarray(d), jnp.asarray(c))
    assert int(d2[4, 4]) == 1000
    assert int(c2[4, 4, 0]) == 7
    # an isolated pixel in empty space stays empty
    d3 = np.zeros((8, 8), np.uint16)
    d3[2, 2] = 500
    d4, _ = render.fill_holes(jnp.asarray(d3), jnp.asarray(np.zeros((8, 8, 3), np.uint8)))
    assert int(d4[4, 6]) == 0


def test_calc_image_cost_cases():
    d0 = np.array([[0, 100], [100, 100]], np.uint16)
    d1 = np.array([[50, 0], [80, 0]], np.uint16)
    labels = np.array([[1, 1], [0, 1]], np.uint16)
    # (0,0): d0 missing -> free. (0,1): target, d1==0 -> 100.
    # (1,0): not target, d1!=0 -> 100. (1,1): target, d1==0 -> 100.
    cost = float(render.calc_image_cost(d0, d1, labels, 1))
    assert cost == 300.0
    d1b = np.array([[50, 90], [0, 110]], np.uint16)
    # (0,1): target overlap diff 10 -> 1.0 ; (1,0): not target, d1==0 -> 0
    # (1,1): target overlap diff 10 -> 1.0
    cost = float(render.calc_image_cost(d0, d1b, labels, 1))
    assert abs(cost - 2.0) < 1e-4


def test_fit_cylinder_improves_cost(rng):
    intrin = CameraIntrinsics.d415(106, 60)
    # observed scene: a synthetic cylinder rendered at a known pose
    true = CylinderTform()
    true.t[:] = [0.0, 0.0, -400.0]
    true.s[:] = [150.0, 150.0, 600.0]
    plane_mat = np.eye(4, dtype=np.float32)
    plane_mat[2, 3] = -2000.0  # plane space = camera shifted in z

    from beats3d_tpu.ops.posefit import render_cylinder_depth

    surface = jnp.asarray(cylinder_surface(64, 64))
    inv_plane = np.linalg.inv(plane_mat)
    obs = np.asarray(render_cylinder_depth(
        surface, jnp.asarray((inv_plane @ true.get_tform()).astype(np.float32)),
        jnp.asarray(intrin.pp), jnp.float32(intrin.fx),
        jnp.zeros((60, 106), jnp.uint16),
    ))
    labels = (obs > 0).astype(np.uint16)  # class 1 where the cylinder is

    init = true.copy()
    init.t[0] += 60.0  # start displaced
    _, c0, _ = fit_cylinder(
        obs, labels, plane_mat, init, intrin.pp, intrin.fx,
        iterations=0, rng=np.random.default_rng(0), n_samples=64,
    )
    best, c1, _ = fit_cylinder(
        obs, labels, plane_mat, init, intrin.pp, intrin.fx,
        iterations=40, rng=np.random.default_rng(0), n_samples=64,
    )
    assert c1 <= c0
    assert c1 < 0.8 * c0, (c0, c1)


def test_fit_cylinder_on_improve_and_view(rng, tmp_path):
    """The on_improve hook fires on init + every accepted pose, and the
    pose_fit orbit-view writer emits a standalone HTML from them."""
    intrin = CameraIntrinsics.d415(106, 60)
    true = CylinderTform()
    true.t[:] = [0.0, 0.0, -400.0]
    true.s[:] = [150.0, 150.0, 600.0]
    plane_mat = np.eye(4, dtype=np.float32)
    plane_mat[2, 3] = -2000.0

    from beats3d_tpu.ops.posefit import render_cylinder_depth

    surface = jnp.asarray(cylinder_surface(64, 64))
    inv_plane = np.linalg.inv(plane_mat)
    obs = np.asarray(render_cylinder_depth(
        surface, jnp.asarray((inv_plane @ true.get_tform()).astype(np.float32)),
        jnp.asarray(intrin.pp), jnp.float32(intrin.fx),
        jnp.zeros((60, 106), jnp.uint16),
    ))
    labels = (obs > 0).astype(np.uint16)
    init = true.copy()
    init.t[0] += 60.0

    poses = []
    _, cost, _ = fit_cylinder(
        obs, labels, plane_mat, init, intrin.pp, intrin.fx,
        iterations=40, rng=np.random.default_rng(0), n_samples=64,
        on_improve=lambda i, c, tf: poses.append((i, c, tf)),
    )
    assert poses and poses[0][0] == 0           # init always recorded
    costs = [c for _, c, _ in poses]
    assert costs == sorted(costs, reverse=True)  # strictly improving
    assert abs(costs[-1] - cost) < 1e-6
    # recorded tforms are snapshots, not aliases of the mutated best
    assert len({id(tf) for _, _, tf in poses}) == len(poses)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pose_fit_app",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "apps", "pose_fit.py",
        ),
    )
    app = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(app)
    # a fake plane-space point grid shaped like qf, label-1 where observed
    qf = np.zeros((60, 106, 4), np.float32)
    qf[..., 2] = obs
    out = tmp_path / "fit.html"
    app.write_fit_view(str(out), qf, labels, 1, poses)
    html = out.read_text()
    assert "pose_fit" in html and "orbit" in html and "#37e06b" in html
