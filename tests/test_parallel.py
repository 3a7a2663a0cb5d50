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
