"""Layered forest: config loading + end-to-end parity vs oracle composition."""

import numpy as np

import fixtures
import oracle

from beats3d_tpu.models import LayeredDecisionForest


def test_layered_load_and_run(tmp_path, rng):
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    ldf = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    assert ldf.num_layered_classes == 4
    assert len(ldf.layers) == 2
    assert ldf.layers[1].filter_model == 0
    assert ldf.layers[1].filter_model_class == 1

    depth = fixtures.random_depth_image(rng, 1, 24, 32)
    got = np.asarray(ldf.run(depth, scale_factor=1.0))

    # oracle: layer 0 unfiltered, layer 1 filtered by layer-0 class 1, composite
    f0 = np.load(tmp_path / "m0.npy")
    f1 = np.load(tmp_path / "m1.npy")
    l0 = oracle.eval_forest(depth, f0, 4, 3, labels_reduce=2)
    l1 = oracle.eval_forest(
        depth, f1, 4, 4, labels_reduce=2, filter_images=l0, filter_class=1
    )
    conditions = np.array([[1, 2], [0, 1], [0, 2], [0, 3], [0, 4]], dtype=np.int32)
    want = oracle.composite_labels([l0[0], l1[0]], conditions)
    np.testing.assert_array_equal(got[0], want)
