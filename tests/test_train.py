"""Trainer parity vs the scalar oracle trainer, plus end-to-end learning."""

import os

import numpy as np
import pytest

import fixtures
import oracle

from beats3d_tpu.data.dataset import ArrayDataset
from beats3d_tpu.models.forest import DecisionTree, PackedForest
from beats3d_tpu.ops import forest_eval
from beats3d_tpu.train import DecisionTreeTrainer, make_random_features, train_forest
from beats3d_tpu.train.trainer import _histogram_step


def test_histogram_matmul_vs_segment_paths(rng):
    depth, labels = fixtures.synthetic_hand_dataset(rng, n=2, h=16, w=24)
    nodes = np.where(labels > 0, 0, -1).astype(np.int32)
    props = make_random_features(8, rng)
    import jax.numpy as jnp

    kw = dict(num_classes=4, w2=1, node_lo=0, chunk=256)
    l1, t1 = _histogram_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes),
        jnp.asarray(props), use_matmul=True, **kw
    )
    l2, t2 = _histogram_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes),
        jnp.asarray(props), use_matmul=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # left + right == parent counts (the device assert at tree_train.cu:156)
    parent = np.array(
        [np.sum(labels == c) for c in range(4)], dtype=np.int64
    )
    parent[0] = 0
    np.testing.assert_array_equal(np.asarray(t1)[0], parent)


def test_trainer_matches_oracle(rng):
    depth, labels = fixtures.synthetic_hand_dataset(rng, n=3, h=16, w=24)
    num_classes, max_depth = 4, 4
    # fixed proposals so both trainers see the same feature pool
    proposals = [[make_random_features(16, rng)] for _ in range(max_depth)]

    want = oracle.train_tree(
        depth, labels, [p[0] for p in proposals], max_depth, num_classes
    )

    ds = ArrayDataset(depth, labels, num_classes)
    trainer = DecisionTreeTrainer(3, 16)
    trainer.allocate(ds, 16, max_depth)
    tree = DecisionTree(max_depth, num_classes)
    trainer.train(ds, tree, proposals_per_level=proposals)

    got = tree.data
    # structure: split params + l/r status must match exactly
    np.testing.assert_array_equal(
        np.floor(got[:, 5:7]), np.floor(want[:, 5:7])
    )
    np.testing.assert_allclose(got[:, 0:5], want[:, 0:5], rtol=1e-6)
    # pdfs: float tolerance (count ratios)
    np.testing.assert_allclose(got[:, 7:], want[:, 7:], atol=1e-5)


def test_trained_tree_actually_learns(rng):
    depth, labels = fixtures.synthetic_hand_dataset(rng, n=4, h=24, w=32)
    ds = ArrayDataset(depth, labels, 4)
    trainer = DecisionTreeTrainer(4, 32)
    trainer.allocate(ds, 32, 6)
    tree = DecisionTree(6, 4)
    trainer.train(ds, tree, rng=np.random.default_rng(7))

    import jax.numpy as jnp

    packed = PackedForest.from_flat(tree.data[None])
    pred = np.asarray(
        forest_eval.evaluate_tree(jnp.asarray(depth), packed.tables())
    )
    # accuracy on labeled pixels should be high (depth bands are separable)
    labeled = labels > 0
    acc = np.mean(pred[labeled] == labels[labeled])
    assert acc > 0.8, acc


def test_train_forest_driver(rng):
    depth, labels = fixtures.synthetic_hand_dataset(rng, n=6, h=16, w=24)
    train = ArrayDataset(depth[:4], labels[:4], 4)
    test = ArrayDataset(depth[4:], labels[4:], 4)
    forest = train_forest(
        train, test,
        num_random_features=16, proposals_per_block=16,
        max_tree_depth=4, trees_in_forest=2, trees_to_try=3,
        rng=np.random.default_rng(3), log=lambda *a: None,
    )
    assert forest.data.shape == (2, 15, 15)
    assert forest.pct_match > 0.5


def test_streaming_matches_resident(rng):
    """streaming=True (host blocks shipped per use, compressed) must produce
    the bit-identical tree."""
    from beats3d_tpu.data.blocks import CompressedDataset

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=4, h=16, w=24)
    ds = ArrayDataset(depth, labels, 4, images_per_block=2)
    proposals = [[make_random_features(16, rng)] for _ in range(4)]

    def run(dataset, streaming):
        trainer = DecisionTreeTrainer(2, 16, streaming=streaming)
        trainer.allocate(dataset, 16, 4)
        tree = DecisionTree(4, 4)
        trainer.train(dataset, tree, proposals_per_level=proposals)
        return tree.data

    a = run(ds, False)
    b = run(CompressedDataset(ds), True)
    np.testing.assert_array_equal(a, b)


def test_mesh_training_matches_single(rng):
    """The (data, model) mesh path must produce the bit-identical tree (exact
    integer psum merge + lowest-global-index tie resolution)."""
    from beats3d_tpu.parallel import make_mesh

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=4, h=16, w=24)
    ds = ArrayDataset(depth, labels, 4, images_per_block=4)
    proposals = [[make_random_features(16, rng)] for _ in range(4)]

    def run(mesh):
        trainer = DecisionTreeTrainer(4, 16, mesh=mesh)
        trainer.allocate(ds, 16, 4)
        tree = DecisionTree(4, 4)
        trainer.train(ds, tree, proposals_per_level=proposals)
        return tree.data

    a = run(None)
    b = run(make_mesh(n_data=4, n_model=2))
    np.testing.assert_array_equal(a, b)


def test_train_feature_bits_matches_chunk_features(rng):
    """Pallas (interpret) packed split bits == the XLA feature evaluator's
    f < thresh, including OOB/zero-center rules."""
    import jax.numpy as jnp
    from beats3d_tpu.ops.train_features_pallas import train_feature_bits
    from beats3d_tpu.train.trainer import _chunk_features

    depth, _ = fixtures.synthetic_hand_dataset(rng, n=2, h=24, w=40)
    depth[0, 3, 5] = 0      # zero-center pixel
    depth[1, 0, 0] = 65535  # sentinel pixel
    props = make_random_features(40, rng)
    n, h, w = depth.shape

    bits = np.asarray(train_feature_bits(
        jnp.asarray(depth), jnp.asarray(props), interpret=True
    ))
    p = props.shape[0]
    got = np.zeros((n, p, h, w), bool)
    for pp in range(p):
        got[:, pp] = (bits[:, pp // 32] >> (pp % 32)) & 1

    lin = np.arange(n * h * w, dtype=np.int32)
    f = np.asarray(_chunk_features(
        jnp.asarray(depth.reshape(-1)),
        jnp.asarray(lin // (h * w)),
        jnp.asarray((lin % (h * w)) // w),
        jnp.asarray(lin % w),
        jnp.asarray(depth.reshape(-1)),
        jnp.asarray(props), h, w,
    ))
    want = (f < props[:, 4][:, None]).reshape(p, n, h, w).transpose(1, 0, 2, 3)
    np.testing.assert_array_equal(got, want)


def test_histogram_from_bits_matches_direct(rng):
    import jax.numpy as jnp
    from beats3d_tpu.ops.train_features_pallas import train_feature_bits
    from beats3d_tpu.train.trainer import _histogram_step_from_bits

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=2, h=16, w=24)
    nodes = np.where(labels > 0, 0, -1).astype(np.int32)
    props = make_random_features(8, rng)
    kw = dict(num_classes=4, w2=1, node_lo=0, chunk=256, use_matmul=True)
    l1, t1 = _histogram_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes),
        jnp.asarray(props), **kw
    )
    bits = train_feature_bits(
        jnp.asarray(depth), jnp.asarray(props), interpret=True
    )
    l2, t2 = _histogram_step_from_bits(
        bits, jnp.asarray(labels), jnp.asarray(nodes), num_props=8, **kw
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_train_forest_checkpoint_resume(rng, tmp_path):
    """Per-candidate-tree checkpointing: a run killed after tree 1 and
    relaunched produces a forest BIT-IDENTICAL to an uninterrupted run
    (the rng stream rides the checkpoint)."""
    from beats3d_tpu.data.dataset import ArrayDataset
    from beats3d_tpu.train import driver as drv

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=6, h=24, w=40)
    tr = ArrayDataset(depth[:4], labels[:4], 4, images_per_block=4)
    te = ArrayDataset(depth[4:], labels[4:], 4, images_per_block=2)
    cfg = dict(
        num_random_features=8, proposals_per_block=8, max_tree_depth=4,
        trees_in_forest=2, trees_to_try=2, log=lambda *a: None,
    )
    want = drv.train_forest(
        tr, te, rng=np.random.default_rng(42), **cfg
    )

    ck = str(tmp_path / "ck")
    calls = {"n": 0}
    orig_eval = drv.evaluate_tree_accuracy

    def dying_eval(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # wedge during candidate tree 2
            raise RuntimeError("simulated wedged RPC")
        return orig_eval(*a, **kw)

    drv.evaluate_tree_accuracy = dying_eval
    try:
        with pytest.raises(RuntimeError):
            drv.train_forest(
                tr, te, rng=np.random.default_rng(42),
                checkpoint_dir=ck, **cfg,
            )
    finally:
        drv.evaluate_tree_accuracy = orig_eval
    assert os.path.exists(os.path.join(ck, "forest_ckpt.npz"))

    got = drv.train_forest(
        tr, te, rng=np.random.default_rng(42), checkpoint_dir=ck, **cfg
    )
    np.testing.assert_array_equal(got.data, want.data)
    assert got.pct_match == want.pct_match
    # a finished run clears its checkpoint
    assert not os.path.exists(os.path.join(ck, "forest_ckpt.npz"))
