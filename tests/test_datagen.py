"""Datagen end-to-end: synthetic colored session -> labeled dataset on disk ->
trainable."""

import json

import numpy as np
import pytest

from beats3d_tpu.data import DatasetConfig
from beats3d_tpu.data.datagen import DatagenConfig, LiveDataConvert, make_color_mapping
from beats3d_tpu.utils import CameraIntrinsics


def _colored_scene(intrin, t=0):
    """Table + hand blob; the hand painted in 3 distinct colors (skin-paint
    stand-in), background black."""
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.full((h, w), 2000.0, np.float32)
    color = np.zeros((h, w, 3), np.uint8)
    cx, cy, r = w // 2 + t, h // 2, int(0.25 * h)
    blob = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
    depth[blob] -= 300
    # three color bands inside the blob
    band = ((yy - cy) // (r // 2)).astype(int)
    colors = {0: (200, 40, 40), 1: (40, 200, 40), -1: (40, 40, 200)}
    for b, c in colors.items():
        m = blob & (band == b)
        color[m] = c
    return depth.astype(np.uint16), color


def test_color_mapping_recovers_palette(rng):
    intrin = CameraIntrinsics.d415(106, 60)
    _, color = _colored_scene(intrin)
    cfg = DatagenConfig(num_colors=3, color_em_tries=4, color_em_iterations=16)
    pal = make_color_mapping(color, cfg, rng)
    want = {(200, 40, 40), (40, 200, 40), (40, 40, 200)}
    got = [tuple(int(x) for x in row) for row in pal]
    # every true color is captured by some palette entry (a dead cluster may
    # leave one garbage row, as in the reference's EM)
    for wt in want:
        assert min(sum((a - b) ** 2 for a, b in zip(g, wt)) for g in got) < 300


def test_live_data_convert_end_to_end(tmp_path, rng):
    intrin = CameraIntrinsics.d415(106, 60)
    cfg = DatagenConfig(
        num_colors=3, color_em_tries=3, color_em_iterations=12,
        plane_candidates=512, plane_z_threshold=40.0, max_images=5,
        scale_variance=0.05,
    )
    conv = LiveDataConvert(str(tmp_path / "ds"), intrin, cfg, rng=rng,
                           log=lambda *a: None)
    for t in range(5):
        depth, color = _colored_scene(intrin, t)
        assert conv.process_frame(depth, color)
    out_cfg = conv.finish()
    assert out_cfg["num_images"] == 5
    assert len(out_cfg["id_to_color"]) == 3

    # loadable through the standard dataset loader, and labels non-degenerate
    ds = DatasetConfig(str(tmp_path / "ds"), num_images=5, name="train")
    labels = ds.get_labels_block(0)
    depth = ds.get_depth_block(0)
    assert labels.shape == (5, 60, 106)
    assert (labels > 0).sum() > 100  # the hand got labeled
    assert set(np.unique(labels)).issubset({0, 1, 2, 3})
    assert (depth != 0).all()  # written with 65535 sentinel for missing


def test_compressed_blocks_roundtrip(rng):
    from beats3d_tpu.data.blocks import (
        CompressedBlocksDynamic, CompressedDataset,
    )
    from beats3d_tpu.data.dataset import ArrayDataset
    import fixtures

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=4, h=16, w=24)
    ds = ArrayDataset(depth, labels, 4, images_per_block=2)
    cds = CompressedDataset(ds)
    np.testing.assert_array_equal(cds.get_depth_block(1), depth[2:4])
    np.testing.assert_array_equal(cds.get_labels_block(0), labels[0:2])
    assert cds.depth.compression_ratio > 2.0

    dyn = CompressedBlocksDynamic(2, 2, (24, 16))
    arr = rng.integers(-1, 100, (2, 16, 24)).astype(np.int32)
    dyn.write_block(1, arr)
    np.testing.assert_array_equal(dyn.get_block(1), arr)
    assert (dyn.get_block(0) == 0).all()


def test_compressed_dataset_trains(rng):
    from beats3d_tpu.data.blocks import CompressedDataset
    from beats3d_tpu.data.dataset import ArrayDataset
    from beats3d_tpu.models.forest import DecisionTree
    from beats3d_tpu.train import DecisionTreeTrainer
    import fixtures

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=2, h=16, w=24)
    cds = CompressedDataset(ArrayDataset(depth, labels, 4))
    trainer = DecisionTreeTrainer(2, 8)
    trainer.allocate(cds, 8, 3)
    tree = DecisionTree(3, 4)
    trainer.train(cds, tree, rng=np.random.default_rng(0))
    assert np.abs(tree.data).sum() > 0


def test_timestamp_gate_rejects_skewed_pairs(tmp_path, rng):
    """Pairs with |depth_ts - color_ts| > frames_timestamp_max_diff ms are
    skipped without consuming an output slot (live_data_convert.py:306-317)."""
    intrin = CameraIntrinsics.d415(106, 60)
    cfg = DatagenConfig(
        num_colors=3, color_em_tries=2, color_em_iterations=8,
        plane_candidates=512, frames_timestamp_max_diff=6.0,
    )
    conv = LiveDataConvert(str(tmp_path / "ds"), intrin, cfg, rng=rng,
                           log=lambda *a: None)
    depth, color = _colored_scene(intrin)
    assert conv.process_frame(depth, color, depth_timestamp=0.0,
                              color_timestamp=0.004)      # 4 ms: ok
    assert conv.process_frame(depth, color, depth_timestamp=0.1,
                              color_timestamp=0.110)      # 10 ms: rejected
    assert conv.process_frame(depth, color)               # no timestamps: ok
    assert conv.frame_count == 2
    assert conv.frames_skipped == 1


def test_gaussian_noise_smooths_output(tmp_path, rng):
    """gaussian_noise > 0.1 must actually change (and smooth) the re-rendered
    depth (the previously dead DatagenConfig.gaussian_noise)."""
    intrin = CameraIntrinsics.d415(106, 60)
    depth, color = _colored_scene(intrin)
    depth = depth + (rng.integers(0, 12, depth.shape)).astype(np.uint16)

    outs = {}
    for sigma in (0.0, 3.0):
        cfg = DatagenConfig(
            num_colors=3, color_em_tries=2, color_em_iterations=8,
            plane_candidates=512, gaussian_noise=sigma, max_images=1,
        )
        conv = LiveDataConvert(str(tmp_path / f"ds{sigma}"), intrin, cfg,
                               rng=np.random.default_rng(0), log=lambda *a: None)
        assert conv.process_frame(depth, color)
        from PIL import Image
        outs[sigma] = np.asarray(
            Image.open(tmp_path / f"ds{sigma}" / "00000000_depth.png")
        ).astype(np.int64)

    a, b = outs[0.0], outs[3.0]
    assert (a != b).any(), "gaussian_noise changed nothing"
    # smoothed surface has lower local roughness on valid pixels
    def roughness(d):
        v = d.copy()
        m = (v != 65535)
        dx = np.abs(np.diff(v, axis=1))
        mm = m[:, 1:] & m[:, :-1]
        return dx[mm].mean()
    assert roughness(b) < roughness(a), (roughness(a), roughness(b))
