#!/usr/bin/env python3
"""Offline forest evaluation on a saved dataset: prints pct_match and writes
rendered label PNGs (reference src/test_on_saved_model.py:23-67)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax.numpy as jnp

from beats3d_tpu.data import DatasetConfig
from beats3d_tpu.models import DecisionForest
from beats3d_tpu.ops import forest_eval

MAX_UINT16 = 65535


def main():
    parser = argparse.ArgumentParser(
        description="Evaluate a saved RDF model on a saved dataset"
    )
    parser.add_argument("-m", "--model", required=True, type=str,
                        help="Path to .npy model input file")
    parser.add_argument("-d", "--data", required=True, type=str,
                        help="Directory holding data")
    parser.add_argument("-o", "--out", required=True, type=str,
                        help="Directory to save output renderings")
    parser.add_argument("--test", required=True, type=int,
                        help="Num images to evaluate")
    parser.add_argument("--backend", choices=["xla", "pallas"], default="xla",
                        help="pallas = fused TPU kernel")
    args = parser.parse_args()

    print("loading forest")
    forest = DecisionForest.load(args.model)
    packed = forest.pack()

    print("loading data")
    dataset = DatasetConfig(args.data, num_images=args.test, name="test")
    depth = dataset.get_depth_block(0)
    labels = dataset.get_labels_block(0)

    print("evaluating forest..")
    if args.backend == "pallas":
        from beats3d_tpu.ops import forest_eval_pallas as fep

        tables, meta = fep.pack_tables_pallas(forest.data)
        pred = np.asarray(
            fep.evaluate_forest_pallas(jnp.asarray(depth), tables, meta)
        )
    else:
        pred = np.asarray(
            forest_eval.evaluate_forest(jnp.asarray(depth), packed.tables())
        )

    pct_match = np.sum(pred == labels) / np.sum(labels > 0)
    print("FOREST pct. matching pixels: ", pct_match)

    print("saving forest renders..")
    os.makedirs(args.out, exist_ok=True)
    from PIL import Image

    renders = dataset.convert_ids_to_colors(np.where(pred == MAX_UINT16, 0, pred))
    for i in range(dataset.num_images):
        Image.fromarray(renders[i]).save(
            os.path.join(args.out, f"eval_labels_{i:08d}.png")
        )


if __name__ == "__main__":
    main()
