"""Datagen asset utilities (reference L8): block-matching stereo and the
projector-pattern homography pipeline."""

import numpy as np

import jax.numpy as jnp

from beats3d_tpu.ops import stereo
from beats3d_tpu.ops.warp import (
    find_homography, make_projector_pattern, warp_perspective,
)


def test_stereo_recovers_known_disparity(rng=None):
    rng = np.random.default_rng(7)
    h, w, d_true = 64, 128, 6
    texture = rng.integers(0, 255, (h, w + d_true)).astype(np.float32)
    left = texture[:, :w]
    right = texture[:, d_true:]         # right[x - d_true] == left[x]
    disp = np.asarray(stereo.block_match_disparity(
        jnp.asarray(left), jnp.asarray(right),
        max_disparity=16, block_size=7,
    ))
    interior = disp[10:-10, 24:-10]
    good = np.abs(interior - d_true) < 0.75
    assert good.mean() > 0.95, f"only {good.mean():.2%} within 0.75 px"


def test_depth_from_disparity_matches_reference_rule():
    disp = jnp.asarray(np.array([[0.0, 10.0, 50.0]], np.float32))
    depth = np.asarray(stereo.depth_from_disparity(disp))
    assert depth[0, 0] == 0                       # invalid stays 0
    assert depth[0, 1] == 10000                   # 100000 / 10
    assert depth[0, 2] == 2000                    # 100000 / 50


def test_homography_roundtrip():
    src = np.array([[10.0, 20.0], [110.0, 30.0], [120.0, 140.0], [5.0, 130.0]])
    dst = np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0]])
    H = find_homography(src, dst)
    for (x, y), (u, v) in zip(src, dst):
        p = H @ np.array([x, y, 1.0])
        np.testing.assert_allclose(p[:2] / p[2], [u, v], atol=1e-6)


def test_warp_extracts_axis_aligned_crop():
    img = np.zeros((60, 80, 3), np.float32)
    img[10:30, 20:50] = 77.0
    # identity-ish homography mapping dst (0..29, 0..19) onto src box
    src = np.array([[20.0, 10.0], [50.0, 10.0], [50.0, 30.0], [20.0, 30.0]])
    dst = np.array([[0.0, 0.0], [30.0, 0.0], [30.0, 20.0], [0.0, 20.0]])
    H = find_homography(src, dst)
    out = np.asarray(warp_perspective(
        jnp.asarray(img), jnp.asarray(np.linalg.inv(H).astype(np.float32)),
        out_h=20, out_w=30,
    ))
    assert np.all(out[2:18, 2:28] == 77.0)


def test_projector_pattern_shape_and_normalization():
    rng = np.random.default_rng(3)
    img = rng.integers(40, 200, (200, 200, 3)).astype(np.uint8)
    pts = np.array([[40.0, 40.0], [160.0, 50.0], [150.0, 170.0], [50.0, 160.0]])
    out = make_projector_pattern(img, pts, tile_size=50, num_tiles=4)
    assert out.shape == (200, 200, 3) and out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255  # min-max normalized
    # tiling periodicity
    np.testing.assert_array_equal(out[:50, :50], out[50:100, 50:100])
