"""Native C++ grouping: builds, runs, and agrees with the oracle and the
on-device implementation."""

import numpy as np

import fixtures
import oracle

from beats3d_tpu.native import make_groups_native
from beats3d_tpu.native.grouping import _load, _make_groups_py
from beats3d_tpu.ops import components


def test_native_builds():
    assert _load() is not None, "native .so failed to build"


def test_native_matches_oracle(rng):
    d = fixtures.blob_scene()
    want_groups, want_info = oracle.make_groups(d, 0.01)
    got_groups, got_info = make_groups_native(d, 0.01)
    np.testing.assert_array_equal(got_groups, want_groups)
    np.testing.assert_allclose(got_info, want_info, rtol=1e-5)


def test_native_matches_device_on_noise(rng):
    d = (rng.random((60, 106)) < 0.45).astype(np.uint16) * 1000
    ng, ni = make_groups_native(d, 0.02)
    dg, di = components.make_hand_groups(d, 0.02)
    np.testing.assert_array_equal(ng, np.asarray(dg))
    np.testing.assert_allclose(ni, np.asarray(di), rtol=1e-5)


def test_python_fallback_matches_native(rng):
    d = (rng.random((30, 50)) < 0.4).astype(np.uint16) * 900
    ng, ni = make_groups_native(d, 0.02)
    pg, pi = _make_groups_py(d, 0.02)
    np.testing.assert_array_equal(ng, pg)
    np.testing.assert_allclose(ni, pi, rtol=1e-5)
