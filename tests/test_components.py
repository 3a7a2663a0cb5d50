"""On-device connected components vs BFS oracle, incl. adversarial topology."""

import numpy as np

import fixtures
import oracle

from beats3d_tpu.ops import components


def test_blob_grouping_matches_oracle():
    d = fixtures.blob_scene()
    want_groups, want_info = oracle.make_groups(d, 0.01)
    got_groups, got_info = components.make_hand_groups(d, 0.01)
    np.testing.assert_array_equal(np.asarray(got_groups), want_groups)
    np.testing.assert_allclose(np.asarray(got_info), want_info, rtol=1e-5)


def test_grouping_random_noise(rng):
    d = (rng.random((60, 106)) < 0.45).astype(np.uint16) * 1000
    want_groups, want_info = oracle.make_groups(d, 0.02)
    got_groups, got_info = components.make_hand_groups(d, 0.02)
    np.testing.assert_array_equal(np.asarray(got_groups), want_groups)
    np.testing.assert_allclose(np.asarray(got_info), want_info, rtol=1e-5)


def test_grouping_threshold_discards_small():
    d = fixtures.blob_scene(blobs=((10, 20, 2), (40, 80, 12)))
    # small blob (r=2, ~13 px of 6360) below 1% threshold -> discarded
    got_groups, got_info = components.make_hand_groups(d, 0.01)
    got_groups = np.asarray(got_groups)
    assert (got_groups == 1).sum() == 0  # right half blob was too small
    assert (got_groups == 2).sum() > 0
    assert np.asarray(got_info)[0, 0] == 0


def test_components_serpentine_converges():
    # worst-case: a serpentine path snaking the full grid -> longest geodesic
    h, w = 30, 53
    d = np.zeros((h, w), np.uint16)
    for r in range(0, h, 2):
        d[r, :] = 1
        if r + 1 < h:
            d[r + 1, -1 if (r // 2) % 2 == 0 else 0] = 1
    labels = np.asarray(components.label_components(d > 0))
    ids = np.unique(labels[d > 0])
    assert len(ids) == 1  # single component fully merged

def test_two_hands_side_assignment():
    d = fixtures.blob_scene(blobs=((30, 25, 9), (30, 80, 9)))
    groups, info = components.make_hand_groups(d, 0.01)
    groups = np.asarray(groups)
    info = np.asarray(info)
    # centroid x<53 -> group 1 (right hand), else group 2
    assert groups[30, 25] == 1
    assert groups[30, 80] == 2
    assert info[0, 1] < 53 and info[1, 1] > 53
