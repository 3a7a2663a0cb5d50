"""The full story end-to-end: generate a dataset from a synthetic colored
session, train a forest on it, evaluate it, and run the live pipeline with it."""

import numpy as np

from beats3d_tpu.data import DatasetConfig
from beats3d_tpu.data.datagen import DatagenConfig, LiveDataConvert
from beats3d_tpu.models.forest import DecisionForest
from beats3d_tpu.train import train_forest
from beats3d_tpu.utils import CameraIntrinsics


def test_datagen_train_eval_roundtrip(tmp_path, rng):
    intrin = CameraIntrinsics.d415(106, 60)

    # --- datagen: colored hand on a table, 10 frames -----------------------
    def scene(t):
        h, w = 60, 106
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        depth = np.full((h, w), 2000.0, np.float32)
        color = np.zeros((h, w, 3), np.uint8)
        cx, cy, r = 40 + t, 30, 16
        blob = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
        depth[blob] -= 250 + 100 * ((yy[blob] - cy) / r)  # sloped hand
        band = ((yy - cy) >= 0)
        color[blob & band] = (200, 40, 40)
        color[blob & ~band] = (40, 200, 40)
        return depth.astype(np.uint16), color

    cfg = DatagenConfig(
        num_colors=2, color_em_tries=3, color_em_iterations=12,
        plane_candidates=512, plane_z_threshold=40.0,
        scale_variance=0.0,  # deterministic geometry for the assert below
    )
    conv = LiveDataConvert(str(tmp_path / "ds"), intrin, cfg, rng=rng,
                           log=lambda *a: None)
    for t in range(10):
        d, c = scene(t)
        conv.process_frame(d, c)
    conv.finish()

    # --- train on it --------------------------------------------------------
    train, test = DatasetConfig.multiple(str(tmp_path / "ds"), [
        (6, None, "train"), (4, None, "test"),
    ])
    forest = train_forest(
        train, test,
        num_random_features=32, proposals_per_block=32,
        max_tree_depth=5, trees_in_forest=2, trees_to_try=2,
        rng=np.random.default_rng(11), log=lambda *a: None,
    )
    # two depth-separable color bands: the forest should learn them well
    assert forest.pct_match > 0.7, forest.pct_match

    # --- artifact round trip ------------------------------------------------
    forest.save(str(tmp_path / "model.npy"))
    loaded = DecisionForest.load(str(tmp_path / "model.npy"))
    np.testing.assert_array_equal(loaded.data, forest.data)
