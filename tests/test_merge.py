"""Dataset merging with label remapping (reference mapping-JSON schema)."""

import json

import numpy as np

from beats3d_tpu.data import DatasetConfig
from beats3d_tpu.data.dataset import write_dataset
from beats3d_tpu.data.merge import load_plan, merge_datasets


def _write_source(path, n, label_val, depth_val):
    depth = np.full((n, 12, 16), depth_val, np.uint16)
    labels = np.zeros((n, 12, 16), np.uint16)
    labels[:, 2:6, 3:9] = label_val
    write_dataset(
        str(path), depth, labels,
        {label_val: np.array([10 * label_val, 0, 0, 255], np.uint8)},
    )


def test_merge_remaps_and_concatenates(tmp_path):
    _write_source(tmp_path / "a", 3, 1, 1000)
    _write_source(tmp_path / "b", 2, 2, 2000)
    plan = {
        "datasets": [[str(tmp_path / "a"), 0], [str(tmp_path / "b"), 1]],
        "labels": {
            # out label 1 <- a's 1; out label 2 <- b's 2
            "1": {"0": 1, "1": 0, "new_color": [255, 0, 0]},
            "2": {"0": 0, "1": 2, "new_color": [0, 255, 0]},
        },
    }
    plan_path = tmp_path / "plan.json"
    plan_path.write_text(json.dumps(plan))

    out = merge_datasets(load_plan(str(plan_path)), str(tmp_path / "m"),
                         log=lambda *a: None)
    assert out["num_images"] == 5

    merged = DatasetConfig(
        str(tmp_path / "m"), num_images=5, image_idxes=list(range(5)),
    )
    labels = merged.get_labels_block(0)
    depth = merged.get_depth_block(0)
    # first 3 images from a: label 1; last 2 from b: label 2
    assert set(np.unique(labels[:3])) == {0, 1}
    assert set(np.unique(labels[3:])) == {0, 2}
    assert (depth[:3] == 1000).all() and (depth[3:] == 2000).all()
    assert merged.id_to_color[1].tolist() == [255, 0, 0, 255]
    assert merged.id_to_color[2].tolist() == [0, 255, 0, 255]


def test_merge_images_per_set_cap(tmp_path):
    _write_source(tmp_path / "a", 3, 1, 1000)
    plan = {
        "datasets": [[str(tmp_path / "a"), 0]],
        "labels": {"1": {"0": 1, "new_color": [9, 9, 9]}},
    }
    out = merge_datasets(plan, str(tmp_path / "m"), images_per_set=1,
                         log=lambda *a: None)
    assert out["num_images"] == 1
