"""Parity of the fused Pallas preproc kernel (interpret mode) vs the XLA
plane_band_depth -> gaussian_depth_filter chain.

The two implementations sum the gaussian taps in different orders (separable
vs 2D) and derive the missing-majority weight differently (wtot - wn vs a
third conv channel), so parity is: identical missing masks and smoothed
depth within one unit (floor-of-mean boundary), like the scalar-oracle test
for the XLA op itself.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from beats3d_tpu.ops import points
from beats3d_tpu.ops.preproc_pallas import plane_band_gauss

import fixtures


@pytest.fixture
def plane_mat():
    return jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
        np.float32))


def _xla_chain(d, mat, pp, focal, thr, ksize, sigma):
    k = jnp.asarray(points.gaussian_kernel(ksize, sigma))

    def one(img):
        d1 = points.plane_band_depth(img, mat, pp, focal, thr)
        return points.gaussian_depth_filter(d1, k)

    if d.ndim == 2:
        return one(d)
    return jnp.stack([one(d[i]) for i in range(d.shape[0])])


def _compare(got, want):
    got = np.asarray(got).astype(np.int32)
    want = np.asarray(want).astype(np.int32)
    # missing masks must agree exactly (a flip would be a wtot/w0 bug, not
    # a floor boundary)
    np.testing.assert_array_equal(got == 0, want == 0)
    assert np.abs(got - want).max() <= 1


def test_parity_random(rng, plane_mat):
    pp = jnp.asarray([31.0, 17.0])
    d = fixtures.random_depth_image(
        rng, 1, 48, 144, missing_frac=0.3, far_frac=0.0)[0]
    # push depths into the band (below the plane z=-2600 threshold 40)
    d = np.where(d > 0, (d % 500) + 2300, 0).astype(np.uint16)
    got = plane_band_gauss(
        jnp.asarray(d), plane_mat, pp, 200.0, 40.0, ksize=5, sigma=2.0,
        interpret=True)
    want = _xla_chain(jnp.asarray(d), plane_mat, pp, 200.0, 40.0, 5, 2.0)
    _compare(got, want)
    assert np.asarray(got).any(), "degenerate scene: everything filtered"


def test_parity_batched_and_borders(rng, plane_mat):
    pp = jnp.asarray([64.0, 24.0])
    d = fixtures.random_depth_image(
        rng, 3, 40, 128, missing_frac=0.15, far_frac=0.0)
    d = np.where(d > 0, (d % 400) + 2350, 0).astype(np.uint16)
    # constant stripe: exercises the uniform-window floor boundary
    d[:, 8:16, :] = 2500
    got = plane_band_gauss(
        jnp.asarray(d), plane_mat, pp, 180.0, 40.0, ksize=5, sigma=2.0,
        interpret=True)
    want = _xla_chain(jnp.asarray(d), plane_mat, pp, 180.0, 40.0, 5, 2.0)
    assert got.shape == d.shape
    _compare(got, want)


def test_band_filters_out_of_band(plane_mat):
    """Pixels at/above the plane band must be zeroed exactly like the XLA
    band (the gaussian then treats them as missing)."""
    pp = jnp.asarray([16.0, 16.0])
    d = np.full((32, 128), 2500, np.uint16)
    d[:16, :] = 2599  # within 40 units of the plane -> filtered
    got = np.asarray(plane_band_gauss(
        jnp.asarray(d), plane_mat, pp, 150.0, 40.0, interpret=True))
    want = np.asarray(_xla_chain(
        jnp.asarray(d), plane_mat, pp, 150.0, 40.0, 5, 2.0))
    _compare(got, want)
    assert (got[:12, :] == 0).all()
    assert (got[20:, :] != 0).all()
