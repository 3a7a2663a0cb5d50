"""Per-hand crop window: cropping the group bbox must be output-identical to
full-frame evaluation (the stencil already zeroes everything outside the
group), and oversize hands must fall back to the full-frame path."""

import numpy as np

import fixtures

import jax.numpy as jnp

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.pipeline import FramePipeline, PipelineConfig
from beats3d_tpu.utils import CameraIntrinsics

H, W = 160, 256


def _scene(intrin, radius_frac):
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.full((h, w), 2600.0, np.float32)
    r = int(radius_frac * w)
    for cx in (int(0.25 * w), int(0.75 * w)):
        blob = (xx - cx) ** 2 + (yy - h / 2) ** 2 < r * r
        depth[blob] -= 320.0
    return depth.astype(np.uint16)


def _pipes(tmp_path, rng, crop):
    intrin = CameraIntrinsics.d415(W, H)
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    ch, cw = crop
    pipe = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=H, width=W, labels_reduce=2,
                           crop_h=ch, crop_w=cw),
        group_min_size=0.01,
    )
    full = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=H, width=W, labels_reduce=2,
                           crop_h=H, crop_w=W),  # >= dims -> crop disabled
        group_min_size=0.01,
    )
    return intrin, pipe, full


def _assert_same(out_a, out_b):
    np.testing.assert_array_equal(
        np.asarray(out_a["labels"]), np.asarray(out_b["labels"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["heights"]), np.asarray(out_b["heights"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["g_info"]), np.asarray(out_b["g_info"])
    )


def test_crop_matches_full(tmp_path, rng):
    intrin, pipe, full = _pipes(tmp_path, rng, crop=(96, 128))
    depth = _scene(intrin, radius_frac=0.12)  # hands fit the crop
    plane = np.eye(4, dtype=np.float32)
    plane[2, 3] = -2600.0
    out_a = pipe(jnp.asarray(depth), jnp.asarray(plane))
    out_b = full(jnp.asarray(depth), jnp.asarray(plane))
    assert np.asarray(out_a["g_info"])[0, 0] > 0  # a hand is actually present
    assert (np.asarray(out_a["labels"]) != 65535).any()
    _assert_same(out_a, out_b)


def test_crop_oversize_falls_back(tmp_path, rng):
    intrin, pipe, full = _pipes(tmp_path, rng, crop=(32, 32))
    depth = _scene(intrin, radius_frac=0.16)  # blobs far exceed 32px crops
    plane = np.eye(4, dtype=np.float32)
    plane[2, 3] = -2600.0
    out_a = pipe(jnp.asarray(depth), jnp.asarray(plane))
    out_b = full(jnp.asarray(depth), jnp.asarray(plane))
    _assert_same(out_a, out_b)


def test_crop_absent_hand(tmp_path, rng):
    """One hand only: the absent group must not force the fallback or crash."""
    intrin, pipe, full = _pipes(tmp_path, rng, crop=(96, 128))
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.full((h, w), 2600.0, np.float32)
    blob = (xx - 0.25 * w) ** 2 + (yy - h / 2) ** 2 < (0.12 * w) ** 2
    depth[blob] -= 320.0
    plane = np.eye(4, dtype=np.float32)
    plane[2, 3] = -2600.0
    out_a = pipe(jnp.asarray(depth.astype(np.uint16)), jnp.asarray(plane))
    out_b = full(jnp.asarray(depth.astype(np.uint16)), jnp.asarray(plane))
    g = np.asarray(out_a["g_info"])
    assert g[0, 0] > 0 and g[1, 0] == 0
    _assert_same(out_a, out_b)
