#!/usr/bin/env python3
"""Merge multiple labeled datasets with per-dataset label remapping
(reference src/merge_datasets.py:12-96; same mapping JSON schema).

Mapping JSON: {"datasets": [[dir, id], ...],
               "labels": {"<out_label>": {"<dataset_id>": in_label,
                                          "new_color": [r, g, b]}}}
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from beats3d_tpu.data import DatasetConfig


def main():
    parser = argparse.ArgumentParser(description="Combine multiple datasets")
    parser.add_argument("-m", "--mapping", required=True, type=str,
                        help="Path to JSON file describing merge")
    parser.add_argument("-o", "--out", required=True, type=str,
                        help="Out directory for merged datasets")
    parser.add_argument("--only_one", action="store_true",
                        help="only output one image per set")
    args = parser.parse_args()

    with open(args.mapping) as f:
        mapping = json.load(f)
    os.makedirs(args.out, exist_ok=True)

    out_color = {
        m: np.array(o["new_color"], dtype=np.uint8)
        for m, o in mapping["labels"].items()
    }
    configs = {m[1]: (DatasetConfig(m[0]), m[0]) for m in mapping["datasets"]}

    img_dims = {c[0].img_dims for c in configs.values()}
    assert len(img_dims) == 1, "datasets must share image dims"
    num_colors = {len(c[0].id_to_color) for c in configs.values()}
    assert len(num_colors) == 1, "datasets must share class count"
    num_colors = num_colors.pop()

    j = 0
    for c_id, (cfg, cdir) in configs.items():
        n = 1 if args.only_one else cfg.total_available_images
        print(f"dataset: {c_id}, num_images: {n}")
        for i in range(n):
            in_pfx = os.path.join(cdir, f"{i:08d}_")
            out_pfx = os.path.join(args.out, f"{j:08d}_")
            shutil.copy(in_pfx + "depth.png", out_pfx + "depth.png")
            if os.path.exists(in_pfx + "depth_rgba.png"):
                shutil.copy(in_pfx + "depth_rgba.png", out_pfx + "depth_rgba.png")

            in_labels = np.array(Image.open(in_pfx + "labels.png")).astype(np.uint16)
            out_labels = np.zeros_like(in_labels)
            out_rgba = np.zeros(in_labels.shape + (4,), dtype=np.uint8)
            for label_idx in range(1, num_colors):
                src = mapping["labels"][str(label_idx)][str(c_id)]
                hit = in_labels == src
                out_labels[hit] = label_idx
                out_rgba[hit, 0:3] = out_color[str(label_idx)][0:3]
                out_rgba[hit, 3] = 255
            Image.fromarray(out_labels).save(out_pfx + "labels.png")
            Image.fromarray(out_rgba).save(out_pfx + "labels_rgba.png")
            j += 1

    cfg_out = {
        "img_dims": list(img_dims.pop()),
        "num_images": j,
        "id_to_color": {
            str(c): [int(x) for x in out_color[str(c)][0:3]] + [255]
            for c in range(1, num_colors)
        },
    }
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(cfg_out, f)


if __name__ == "__main__":
    main()
