"""Frame-preprocessing ops vs straightforward numpy references."""

import numpy as np

import fixtures

from beats3d_tpu.ops import points

MAX_UINT16 = 65535


def test_deproject_roundtrip(rng):
    d = fixtures.random_depth_image(rng, 1, 16, 20)[0]
    pp = np.array([9.5, 7.5], np.float32)
    f = 100.0
    pts = np.asarray(points.deproject_points(d, pp, f))
    # valid points carry w=1 and z=depth
    valid = d > 0
    assert (pts[valid][:, 3] == 1).all()
    np.testing.assert_allclose(pts[valid][:, 2], d[valid].astype(np.float32))
    assert (pts[~valid] == 0).all()
    # manual check of one pixel
    y, x = np.argwhere(valid)[0]
    np.testing.assert_allclose(
        pts[y, x, 0], d[y, x] * (x - pp[0]) / f, rtol=1e-6
    )
    back = np.asarray(points.depths_from_points(pts))
    np.testing.assert_array_equal(back, np.where(valid, d, 0))


def test_transform_points_only_w1():
    pts = np.zeros((4, 4), np.float32)
    pts[0] = [1, 2, 3, 1]
    pts[1] = [1, 2, 3, 0]  # untouched
    mat = np.eye(4, dtype=np.float32)
    mat[0, 3] = 10
    out = np.asarray(points.transform_points(pts, mat))
    np.testing.assert_allclose(out[0], [11, 2, 3, 1])
    np.testing.assert_allclose(out[1], pts[1])


def test_sentinel_ops():
    d = np.array([[0, 5], [MAX_UINT16, 7]], np.uint16)
    out = np.asarray(points.convert_0s_to_maxuint(d))
    np.testing.assert_array_equal(out, [[MAX_UINT16, 5], [MAX_UINT16, 7]])

    pts = np.zeros((2, 2, 4), np.float32)
    pts[0, 1, 3] = 1.0  # only (0,1) valid
    out = np.asarray(points.remove_missing_3d_points_from_depth_image(pts, d))
    np.testing.assert_array_equal(out, [[0, 5], [0, 0]])

    out = np.asarray(points.setup_depth_image_for_forest(pts, d))
    np.testing.assert_array_equal(out, [[MAX_UINT16, 5], [MAX_UINT16, MAX_UINT16]])


def test_gaussian_depth_filter_missing_rule(rng):
    k = points.gaussian_kernel(5, 2.0)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    d = fixtures.random_depth_image(rng, 1, 12, 16, missing_frac=0.4, far_frac=0)[0]
    got = np.asarray(points.gaussian_depth_filter(d, k))

    # scalar reference
    h, w = d.shape
    want = np.zeros_like(d)
    for y in range(h):
        for x in range(w):
            w0 = wn = sn = 0.0
            for dy in range(5):
                for dx in range(5):
                    yy, xx = y + dy - 2, x + dx - 2
                    if yy < 0 or xx < 0 or yy >= h or xx >= w:
                        continue
                    dv = float(d[yy, xx])
                    if dv == 0:
                        w0 += k[dy, dx]
                    else:
                        wn += k[dy, dx]
                        sn += dv * k[dy, dx]
            want[y, x] = 0 if w0 > wn else int(np.float32(sn) / np.float32(wn))
    # floor of float division: allow off-by-one at exact boundaries
    diff = got.astype(np.int64) - want.astype(np.int64)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.02


def test_shrink_flip_stencil(rng):
    d = fixtures.random_depth_image(rng, 1, 16, 24, missing_frac=0)[0]
    s = np.asarray(points.shrink_image(d, 2))
    np.testing.assert_array_equal(s, d[::4, ::4])

    fl = np.asarray(points.flip_x(d))
    np.testing.assert_array_equal(fl, d[:, ::-1])

    groups = np.zeros((4, 6), np.uint16)
    groups[1, 2] = 1
    out = np.asarray(points.stencil_depth_image_by_group(groups, d, 2, 1))
    want = np.zeros_like(d)
    want[4:8, 8:12] = d[4:8, 8:12]
    np.testing.assert_array_equal(out, want)


def test_grow_groups_priority():
    g = np.zeros((5, 5), np.uint16)
    g[2, 1] = 1  # left of (2,2)
    g[2, 3] = 2  # right of (2,2)
    out = np.asarray(points.grow_groups(g))
    assert out[2, 2] == 1  # left neighbor wins
    assert out[2, 0] == 1 and out[1, 1] == 1 and out[3, 1] == 1
    assert out[2, 4] == 2
    assert out[0, 0] == 0


def test_write_pixel_groups_scatter():
    coords = np.array([[1, 2, 1], [3, 4, 2], [0, 0, 9]], np.int32)
    out = np.asarray(
        points.write_pixel_groups_to_stencil_image(coords, 2, (5, 6))
    )
    assert out[1, 2] == 1 and out[3, 4] == 2
    assert out[0, 0] == 0  # beyond num_coords
    assert out.sum() == 3


def test_rgba_helpers(rng):
    labels = np.array([[0, 1], [2, MAX_UINT16]], np.uint16)
    colors = np.array([[10, 20, 30, 255], [40, 50, 60, 255]], np.uint8)
    rgba = np.asarray(points.make_rgba_from_labels(labels, colors))
    np.testing.assert_array_equal(rgba[0, 0], [0, 0, 0, 0])
    np.testing.assert_array_equal(rgba[0, 1], [10, 20, 30, 255])
    np.testing.assert_array_equal(rgba[1, 0], [40, 50, 60, 255])
    np.testing.assert_array_equal(rgba[1, 1], [0, 0, 0, 0])

    d = np.array([[0, 100], [MAX_UINT16, 300]], np.uint16)
    out = np.asarray(points.make_depth_rgba(d, 50, 250))
    np.testing.assert_array_equal(out[0, 0], [195, 157, 152, 255])
    np.testing.assert_array_equal(out[1, 0], [157, 195, 152, 255])
    np.testing.assert_array_equal(out[1, 1], [157, 152, 195, 255])


def test_filter_points_by_plane():
    pts = np.array(
        [
            [1, 1, -100, 1],  # above plane band: kept
            [1, 1, -10, 1],  # inside band: zeroed
            [1, 1, 5, 1],  # below: zeroed
            [1, 1, 5, 0],  # w!=1: untouched
        ],
        np.float32,
    )
    out = np.asarray(points.filter_points_by_plane(pts, 40.0))
    np.testing.assert_array_equal(out[0], pts[0])
    assert (out[1] == 0).all() and (out[2] == 0).all()
    np.testing.assert_array_equal(out[3], pts[3])
