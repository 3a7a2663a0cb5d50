"""Parity tests: TPU forest evaluator vs the scalar reference-semantics oracle."""

import numpy as np
import pytest

import fixtures
import oracle

from beats3d_tpu.models.forest import DecisionForest, PackedForest, forest_config
from beats3d_tpu.ops import forest_eval

MAX_UINT16 = 65535


def test_forest_config():
    assert forest_config(8, 7) == (255, 256, 21)


def test_forest_npy_roundtrip(tmp_path, rng):
    flat = fixtures.random_forest_flat(rng, 3, 5, 6)
    path = str(tmp_path / "f.npy")
    np.save(path, flat)
    f = DecisionForest.load(path)
    assert (f.num_trees, f.max_depth, f.num_classes) == (3, 5, 6)
    np.testing.assert_array_equal(f.data, flat)

    packed = f.pack()
    assert len(packed.levels) == 5
    assert packed.levels[2].uv.shape == (3, 4, 4)
    assert packed.levels[4].pdf.shape == (3, 16, 2, 6)


def test_single_tree_eval_parity(rng):
    depth = fixtures.random_depth_image(rng, 2, 24, 32)
    tree = fixtures.random_tree_flat(rng, 5, 4)
    want = oracle.eval_tree(depth, tree, 5, 4)

    packed = PackedForest.from_flat(tree[None])
    got = np.asarray(forest_eval.evaluate_tree(depth, packed.tables()))
    np.testing.assert_array_equal(got, want)


def test_forest_eval_parity(rng):
    depth = fixtures.random_depth_image(rng, 2, 24, 32)
    forest = fixtures.random_forest_flat(rng, 3, 5, 5)
    want = oracle.eval_forest(depth, forest, 5, 5)

    packed = PackedForest.from_flat(forest)
    got = np.asarray(forest_eval.evaluate_forest(depth, packed.tables()))
    np.testing.assert_array_equal(got, want)


def test_forest_eval_labels_reduce_and_scale(rng):
    depth = fixtures.random_depth_image(rng, 1, 24, 32)
    forest = fixtures.random_forest_flat(rng, 2, 4, 5)
    want = oracle.eval_forest(
        depth, forest, 4, 5, labels_reduce=2, scale_factor=0.5
    )
    packed = PackedForest.from_flat(forest)
    got = np.asarray(
        forest_eval.evaluate_forest(
            depth, packed.tables(), labels_reduce=2, scale_factor=0.5
        )
    )
    np.testing.assert_array_equal(got, want)


def test_forest_eval_filter_images(rng):
    depth = fixtures.random_depth_image(rng, 1, 24, 32)
    forest = fixtures.random_forest_flat(rng, 2, 4, 5)
    filt = rng.integers(0, 3, size=(1, 12, 16)).astype(np.uint16)
    want = oracle.eval_forest(
        depth, forest, 4, 5, labels_reduce=2, filter_images=filt, filter_class=1
    )
    packed = PackedForest.from_flat(forest)
    got = np.asarray(
        forest_eval.evaluate_forest(
            depth,
            packed.tables(),
            labels_reduce=2,
            filter_images=filt,
            filter_class=1,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_composite_labels_parity(rng):
    h, w = 10, 14
    # two layer images with labels 0..2 / 0..3 + some 65535
    l0 = rng.integers(0, 3, size=(h, w)).astype(np.uint16)
    l1 = rng.integers(0, 4, size=(h, w)).astype(np.uint16)
    l0[0, 0] = MAX_UINT16
    l1[1, 1] = MAX_UINT16
    conditions = np.array([[1, 2], [0, 1], [0, 2], [0, 3], [0, 4]], dtype=np.int32)
    want = oracle.composite_labels([l0, l1], conditions)
    got = np.asarray(
        forest_eval.composite_labels(
            np.stack([l0, l1])[:, None], conditions
        )
    )[0]
    np.testing.assert_array_equal(got, want)


def test_eval_all_missing_gives_unlabeled(rng):
    depth = np.zeros((1, 8, 8), dtype=np.uint16)
    forest = fixtures.random_forest_flat(rng, 2, 3, 4)
    packed = PackedForest.from_flat(forest)
    got = np.asarray(forest_eval.evaluate_forest(depth, packed.tables()))
    assert (got == MAX_UINT16).all()
