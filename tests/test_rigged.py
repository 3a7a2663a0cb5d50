"""Skinned-rig hand generator (data/rigged.py) — the libhand-parity asset
(reference datagen/Rigged Hand.blend + datagen/libhand/).  Checks the rig's
kinematics and skinning, and that its output drives the existing splat
datagen path unchanged."""
import numpy as np

from beats3d_tpu.data.rigged import rigged_hand_cloud
from beats3d_tpu.data.synth import (
    FINGER_COLORS, PALM_COLOR, articulated_scene)
from beats3d_tpu.utils import CameraIntrinsics


def _digit_pts(pts, cols, color):
    return pts[(cols == np.array(color, np.uint8)).all(axis=1)]


def test_contract_and_labels():
    rng = np.random.default_rng(0)
    pts, cols = rigged_hand_cloud(rng)
    assert pts.shape == (len(cols), 3) and pts.dtype == np.float32
    assert np.isfinite(pts).all()
    # all six paint labels present: palm + thumb + four fingers
    for color in [PALM_COLOR] + FINGER_COLORS:
        assert len(_digit_pts(pts, cols, color)) > 50, color
    # hand-unit envelope: stays inside the pipeline's crop window scale
    assert np.abs(pts[:, 0]).max() < 260
    assert pts[:, 1].max() < 320 and pts[:, 1].min() > -260


def test_determinism():
    a = rigged_hand_cloud(np.random.default_rng(7))
    b = rigged_hand_cloud(np.random.default_rng(7))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_extended_fingers_reach_farther_than_flexed():
    """flex_scale=0 keeps digits extended (+y); full flex curls them back
    over the palm — the z-buffer occlusion regime the flagship trains on."""
    reaches = {0.0: [], 1.0: []}
    for seed in range(6):
        for fs in (0.0, 1.0):
            pts, cols = rigged_hand_cloud(
                np.random.default_rng(seed), flex_scale=fs)
            # middle finger (color index 2) tip reach along +y
            tip = _digit_pts(pts, cols, FINGER_COLORS[2])[:, 1].max()
            reaches[fs].append(tip)
    assert np.mean(reaches[0.0]) > np.mean(reaches[1.0]) + 30


def test_flexed_fingers_rise_above_palm():
    pts, cols = rigged_hand_cloud(np.random.default_rng(3), flex_scale=1.0)
    palm_z = _digit_pts(pts, cols, PALM_COLOR)[:, 2].max()
    finger_z = max(
        _digit_pts(pts, cols, c)[:, 2].max() for c in FINGER_COLORS[1:])
    assert finger_z > palm_z  # curled digits stand off the palm surface


def test_thumb_opposes_across_palm():
    """The thumb's rotated flex plane must sweep it toward the palm
    CENTER (x decreasing from its radial base), unlike the four fingers
    whose flex stays in their own vertical plane."""
    x_rel = []
    for seed in range(8):
        ext, ce = rigged_hand_cloud(
            np.random.default_rng(seed), flex_scale=0.0)
        flex, cf = rigged_hand_cloud(
            np.random.default_rng(seed), flex_scale=1.0)
        tx_ext = _digit_pts(ext, ce, FINGER_COLORS[0])[:, 0].max()
        tx_flex = _digit_pts(flex, cf, FINGER_COLORS[0])[:, 0].max()
        x_rel.append(tx_ext - tx_flex)
    # flexed thumbs end well inboard of extended ones
    assert np.mean(x_rel) > 25


def test_skinning_keeps_joints_closed():
    """LBS blend: across every knuckle the surface stays connected — the
    max nearest-neighbor gap along a flexed digit stays under the capsule
    radius (the old capsule chains tear here)."""
    pts, cols = rigged_hand_cloud(np.random.default_rng(5), flex_scale=1.0)
    digit = _digit_pts(pts, cols, FINGER_COLORS[1])
    # order digit points by distance from the palm attachment, then check
    # consecutive shells overlap (no gap > 8 hand units ~ capsule radius)
    d = np.linalg.norm(digit - digit.mean(0), axis=1)
    order = np.argsort(d)
    gaps = np.diff(d[order])
    assert gaps.max() < 8.0


def test_rigged_scene_through_splat_path():
    intrin = CameraIntrinsics.d415()
    depth, color = articulated_scene(
        intrin, np.random.default_rng(11), two_hands=False, rigged=True)
    assert depth.shape == (intrin.height, intrin.width)
    hand = (color.sum(axis=2) > 0)
    assert 8000 < hand.sum() < 200000  # hand-sized footprint
    # hand sits above the table: its depth reads closer than the plane
    table_med = np.median(depth[~hand])
    assert np.median(depth[hand]) < table_med - 150
