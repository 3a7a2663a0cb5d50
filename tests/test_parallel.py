"""Sharded paths on the 8-virtual-CPU-device mesh: results must equal the
single-device paths exactly."""

import numpy as np

import fixtures

import jax
import jax.numpy as jnp

from beats3d_tpu.models.forest import PackedForest
from beats3d_tpu.ops import forest_eval
from beats3d_tpu.parallel import (
    evaluate_forest_sharded,
    make_mesh,
    sharded_histogram_step,
    sharded_train_step,
)
from beats3d_tpu.train import make_random_features
from beats3d_tpu.train.trainer import _histogram_step, _pick_best_step


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_eval_sharded_matches_single(rng):
    depth = fixtures.random_depth_image(rng, 8, 16, 24)
    forest = fixtures.random_forest_flat(rng, 4, 4, 5)
    packed = PackedForest.from_flat(forest)

    want = np.asarray(forest_eval.evaluate_forest(depth, packed.tables()))

    mesh = make_mesh(n_data=4, n_model=2)
    got = np.asarray(
        evaluate_forest_sharded(jnp.asarray(depth), packed.tables(), mesh)
    )
    np.testing.assert_array_equal(got, want)


def test_histogram_sharded_matches_single(rng):
    depth, labels = fixtures.synthetic_hand_dataset(rng, n=4, h=16, w=24)
    nodes = np.where(labels > 0, 0, -1).astype(np.int32)
    props = make_random_features(8, rng)
    kw = dict(num_classes=4, w2=1, node_lo=0, chunk=256)

    lw, tw = _histogram_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes),
        jnp.asarray(props), use_matmul=True, **kw
    )
    mesh = make_mesh(n_data=4, n_model=2)
    lg, tg = sharded_histogram_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes),
        jnp.asarray(props), mesh, **kw
    )
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lw))
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tw))


def test_train_step_sharded_matches_single(rng):
    depth, labels = fixtures.synthetic_hand_dataset(rng, n=4, h=16, w=24)
    nodes = np.where(labels > 0, 0, -1).astype(np.int32)
    props = make_random_features(8, rng)
    c = 4
    parent = np.zeros((1, c), np.float32)
    for k in range(1, c):
        parent[0, k] = np.sum(labels == k)
    active = jnp.asarray(np.array([0], np.int32))
    pc = jnp.asarray(parent)
    init = (
        jnp.full((1,), -1.0, jnp.float32),
        jnp.zeros((1, 5), jnp.float32),
        jnp.zeros((1, c), jnp.float32),
        jnp.zeros((1, c), jnp.float32),
    )
    kw = dict(num_classes=c, w2=1, node_lo=0, chunk=256)

    lw, tw = _histogram_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes),
        jnp.asarray(props), use_matmul=True, **kw
    )
    want = _pick_best_step(
        active, pc, lw, tw, jnp.asarray(props), *init, w2=1, parent_lo=0
    )

    mesh = make_mesh(n_data=4, n_model=2)
    got = sharded_train_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes),
        jnp.asarray(props), active, pc, *init, mesh, **kw
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_pipeline_batch_sharded_matches_batch(tmp_path, rng):
    """The full fused inference pipeline, data-parallel over frames on the
    mesh, must match the single-device batched path exactly (pure DP — no
    collectives, per SURVEY.md §5.8)."""
    import fixtures
    from beats3d_tpu.models import LayeredDecisionForest
    from beats3d_tpu.runtime.pipeline import FramePipeline, PipelineConfig
    from beats3d_tpu.utils import CameraIntrinsics

    H, W = 160, 256
    intrin = CameraIntrinsics.d415(W, H)
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    pipe = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=H, width=W, labels_reduce=2,
                           crop_h=96, crop_w=128),
        group_min_size=0.01,
    )

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = []
    for t in range(8):
        d = np.full((H, W), 2600.0, np.float32)
        r = int(0.12 * W)
        for cx in (int(0.25 * W) + 2 * t, int(0.75 * W) - t):
            d[(xx - cx) ** 2 + (yy - H / 2 - t) ** 2 < r * r] -= 300.0 + 4 * t
        frames.append(d.astype(np.uint16))
    frames = jnp.asarray(np.stack(frames))
    plane = np.eye(4, dtype=np.float32)
    plane[2, 3] = -2600.0
    plane = jnp.asarray(plane)

    want = pipe.batch(frames, plane)
    mesh = make_mesh(n_data=4, n_model=2)
    got = pipe.batch_sharded(frames, plane, mesh)
    for k in ("labels", "g_info", "tip_valid", "tip_px"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
    np.testing.assert_allclose(
        np.asarray(got["heights"]), np.asarray(want["heights"]),
        rtol=1e-5, atol=1e-3,
    )
