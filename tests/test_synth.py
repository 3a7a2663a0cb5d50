"""Articulated synthetic hand generator (data/synth.py): part coverage,
crop-budget fit, and end-to-end group detection through the real front
(plane RANSAC -> band -> shrink -> components) on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from beats3d_tpu.data.synth import (
    FINGER_COLORS, PALM_COLOR, articulated_scene)
from beats3d_tpu.ops import components, plane as plane_ops, points
from beats3d_tpu.utils import CameraIntrinsics


def test_parts_and_crop_budget():
    intrin = CameraIntrinsics.d415()
    for seed in (0, 3, 11):
        rng = np.random.default_rng(seed)
        d, c = articulated_scene(intrin, rng, two_hands=False)
        # all six painted parts present and non-trivial
        palm = (c == np.array(PALM_COLOR, np.uint8)).all(-1)
        assert palm.sum() > 5000, seed
        for k, col in enumerate(FINGER_COLORS):
            assert (c == np.array(col, np.uint8)).all(-1).sum() > 400, (
                seed, k)
        # grown-group bbox must fit the pipeline's 448x512 crop window
        hand = c.sum(-1) > 0
        rows = np.any(hand, 1).nonzero()[0]
        cols = np.any(hand, 0).nonzero()[0]
        assert rows[-1] - rows[0] + 1 <= 440, seed
        assert cols[-1] - cols[0] + 1 <= 504, seed
        # hand sits above the table: its depth reads closer
        assert d[hand].mean() < d[~hand].mean() - 200


def test_two_hands_found_by_front():
    """The bench scene must produce exactly the two groups the pipeline
    expects (right at image-left, mirrored left at image-right)."""
    intrin = CameraIntrinsics.d415()
    d, _ = articulated_scene(
        intrin, np.random.default_rng(4), two_hands=True
    )
    dj = jnp.asarray(d)
    pp = jnp.asarray(intrin.pp)
    pts = jax.jit(points.deproject_points)(dj, pp, jnp.float32(intrin.fx))
    mat = plane_ops.CalibratedPlane(4096, 40.0).make(pts)
    band = points.plane_band_depth(dj, mat, pp, jnp.float32(intrin.fx),
                                   jnp.float32(40.0))
    small = points.shrink_image(band, 3)
    groups, g_info = components.make_hand_groups(small, jnp.float32(0.02))
    g = np.asarray(g_info)
    assert g[0, 0] > 0 and g[1, 0] > 0  # both hands found
    assert g[0, 1] < small.shape[1] / 2 <= g[1, 1]  # left/right split


def test_sensor_noise_model(rng):
    """apply_sensor_noise (VERDICT r3 #9): z^2-growing noise, edge dropout,
    speckle — missing pixels stay missing, valid interior survives."""
    from beats3d_tpu.data.synth import apply_sensor_noise

    h, w = 120, 160
    depth = np.full((h, w), 2600, np.uint16)
    depth[:, :20] = 0                      # already-missing region
    depth[40:80, 60:100] = 2100            # a raised block -> strong edges
    noisy = apply_sensor_noise(depth, rng)

    assert noisy.dtype == np.uint16
    assert (noisy[:, :20] == 0).all()      # missing stays missing
    # interior pixels jitter by a few units, not wildly
    inner = noisy[10:30, 40:60].astype(np.int64)
    live = inner > 0
    assert live.mean() > 0.9
    dev = np.abs(inner[live] - 2600)
    assert dev.mean() < 8 and dev.max() < 30
    # edge band loses a meaningful fraction of pixels to dropout
    edge_band = noisy[39:42, 60:100]
    assert (edge_band == 0).mean() > 0.15
    # speckle exists but is sparse
    flat = noisy[90:119, 40:159]
    assert 0 < (flat == 0).mean() < 0.05


def test_hand_cloud_detail_relief(rng):
    """detail > 0 adds measurable surface relief without breaking part
    structure (same point count ordering, finite coords)."""
    from beats3d_tpu.data.synth import hand_cloud

    r1 = np.random.default_rng(11)
    r2 = np.random.default_rng(11)
    p0, c0 = hand_cloud(r1, flex_scale=0.5, detail=0.0)
    p1, c1 = hand_cloud(r2, flex_scale=0.5, detail=3.0)
    assert p0.shape == p1.shape
    np.testing.assert_array_equal(c0, c1)
    dz = p1[:, 2] - p0[:, 2]
    assert np.isfinite(p1).all()
    assert np.abs(dz).max() > 1.0          # relief present
    assert np.abs(dz).max() < 12.0         # but bounded
    np.testing.assert_allclose(p1[:, :2], p0[:, :2], atol=1e-5)
