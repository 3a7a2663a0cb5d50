"""frame_step_batched must match the per-frame path: labels exactly, means
and heights up to reduction order (mean shift runs on crops)."""

import numpy as np

import fixtures

import jax.numpy as jnp

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.pipeline import FramePipeline, PipelineConfig
from beats3d_tpu.utils import CameraIntrinsics

H, W = 160, 256


def _scene(intrin, t):
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.full((h, w), 2600.0, np.float32)
    r = int(0.12 * w)
    for cx in (int(0.25 * w) + 3 * t, int(0.75 * w) - 2 * t):
        blob = (xx - cx) ** 2 + (yy - h / 2 - t) ** 2 < r * r
        depth[blob] -= 300.0 + 5.0 * t
    return depth.astype(np.uint16)


def test_batched_matches_single(tmp_path, rng):
    intrin = CameraIntrinsics.d415(W, H)
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    pipe = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=H, width=W, labels_reduce=2,
                           crop_h=96, crop_w=128),
        group_min_size=0.01,
    )
    frames = np.stack([_scene(intrin, t) for t in range(3)])
    plane = np.eye(4, dtype=np.float32)
    plane[2, 3] = -2600.0

    out_b = pipe.batch(jnp.asarray(frames), jnp.asarray(plane))
    for t in range(3):
        out_s = pipe(jnp.asarray(frames[t]), jnp.asarray(plane))
        np.testing.assert_array_equal(
            np.asarray(out_b["labels"][t]), np.asarray(out_s["labels"])
        )
        np.testing.assert_allclose(
            np.asarray(out_b["means"][t]), np.asarray(out_s["means"]),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_b["heights"][t]), np.asarray(out_s["heights"]),
            rtol=1e-4, atol=1e-2,
        )
        np.testing.assert_array_equal(
            np.asarray(out_b["g_info"][t]), np.asarray(out_s["g_info"])
        )


def test_batched_oversize_falls_back(tmp_path, rng):
    intrin = CameraIntrinsics.d415(W, H)
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    pipe = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=H, width=W, labels_reduce=2,
                           crop_h=32, crop_w=32),
        group_min_size=0.01,
    )
    frames = np.stack([_scene(intrin, t) for t in range(2)])
    plane = np.eye(4, dtype=np.float32)
    plane[2, 3] = -2600.0
    out_b = pipe.batch(jnp.asarray(frames), jnp.asarray(plane))
    for t in range(2):
        out_s = pipe(jnp.asarray(frames[t]), jnp.asarray(plane))
        np.testing.assert_array_equal(
            np.asarray(out_b["labels"][t]), np.asarray(out_s["labels"])
        )


def test_batched_mixed_oversize_rescue(tmp_path, rng):
    """PER-FRAME fallback granularity: a batch with one oversized-hand frame
    keeps the crop path for clean frames and rescues the oversized one in
    the budgeted full-frame dispatch — every frame must still match the
    single-frame path."""
    intrin = CameraIntrinsics.d415(W, H)
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    pipe = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=H, width=W, labels_reduce=2,
                           crop_h=96, crop_w=128),
        group_min_size=0.01,
    )

    def big_scene():
        h, w = intrin.height, intrin.width
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        depth = np.full((h, w), 2600.0, np.float32)
        blob = (xx - 0.3 * w) ** 2 + (yy - h / 2) ** 2 < 55 ** 2  # > crop_h
        depth[blob] -= 300.0
        blob2 = (xx - 0.8 * w) ** 2 + (yy - h / 2) ** 2 < 20 ** 2
        depth[blob2] -= 300.0
        return depth.astype(np.uint16)

    frames = np.stack([_scene(intrin, 0), big_scene(), _scene(intrin, 2)])
    plane = np.eye(4, dtype=np.float32)
    plane[2, 3] = -2600.0

    out_b = pipe.batch(jnp.asarray(frames), jnp.asarray(plane))
    for t in range(3):
        out_s = pipe(jnp.asarray(frames[t]), jnp.asarray(plane))
        np.testing.assert_array_equal(
            np.asarray(out_b["labels"][t]), np.asarray(out_s["labels"]),
            err_msg=f"frame {t}",
        )
        np.testing.assert_allclose(
            np.asarray(out_b["means"][t]), np.asarray(out_s["means"]),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_b["heights"][t]), np.asarray(out_s["heights"]),
            rtol=1e-4, atol=1e-2,
        )
