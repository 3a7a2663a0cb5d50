"""Mean-shift parity vs the double-precision oracle."""

import numpy as np

import oracle

from beats3d_tpu.ops import meanshift


def _labels_with_clusters(rng, h=60, w=80, num_classes=3):
    labels = np.zeros((h, w), np.uint16)
    centers = [(15, 20), (40, 55), (20, 60)]
    for c, (cy, cx) in enumerate(centers, start=1):
        for _ in range(150):
            y = int(np.clip(rng.normal(cy, 4), 0, h - 1))
            x = int(np.clip(rng.normal(cx, 4), 0, w - 1))
            labels[y, x] = c
    return labels


def test_meanshift_parity(rng):
    labels = _labels_with_clusters(rng)
    variances = np.array([8.0, 8.0, 8.0], np.float32)
    want = oracle.mean_shift(labels, variances, 3, 6)
    got = np.asarray(
        meanshift.mean_shift(labels, variances, num_classes=3, num_rounds=6)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_meanshift_absent_class_nan(rng):
    labels = _labels_with_clusters(rng)
    variances = np.array([8.0, 8.0, 8.0, 8.0], np.float32)
    got = np.asarray(
        meanshift.mean_shift(labels, variances, num_classes=4, num_rounds=6)
    )
    assert np.isnan(got[3]).all()
    assert np.isfinite(got[:3]).all()


def test_meanshift_finds_modes(rng):
    labels = _labels_with_clusters(rng)
    variances = np.array([8.0, 8.0, 8.0], np.float32)
    got = np.asarray(
        meanshift.mean_shift(labels, variances, num_classes=3, num_rounds=6)
    )
    for c, (cy, cx) in enumerate([(15, 20), (40, 55), (20, 60)]):
        assert abs(got[c, 0] - cx) < 3.0
        assert abs(got[c, 1] - cy) < 3.0
