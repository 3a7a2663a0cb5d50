#!/usr/bin/env python3
"""Train a per-pixel classifier RDF on a labeled depth dataset
(reference src/train_model.py:33-148; same CLI contract)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from beats3d_tpu.data import DatasetConfig
from beats3d_tpu.train import train_forest


def main():
    parser = argparse.ArgumentParser(
        description="Train a classifier RDF for depth images"
    )
    parser.add_argument("--train", required=True, type=int,
                        help="Num training images")
    parser.add_argument("--train_block", required=False, type=int,
                        help="Images per training block (default: all)")
    parser.add_argument("--test", required=True, type=int,
                        help="Num test images")
    parser.add_argument("--proposals", required=True, type=int,
                        help="Num proposals tested per node")
    parser.add_argument("--proposals_block", required=True, type=int,
                        help="Num proposals per proposal block")
    parser.add_argument("--out_trees", required=True, type=int,
                        help="Num trees in final forest")
    parser.add_argument("--trees_to_try", required=False, type=int,
                        help="Num candidate trees generated for forest")
    parser.add_argument("--depth", required=True, type=int,
                        help="Max depth for a tree in the forest")
    parser.add_argument("-o", "--out", required=True, type=str,
                        help="Where to save the output model")
    parser.add_argument("-d", "--data", required=True, type=str,
                        help="Directory containing the training data")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--streaming", action="store_true",
                        help="Ship image blocks host->device per use "
                             "(bounded HBM; compressed host storage)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Distribute training over a device mesh, "
                             "'DATAxMODEL' (e.g. 4x2): histograms are "
                             "data-parallel over images and model-parallel "
                             "over proposals, bit-identical to single-chip")
    args = parser.parse_args()

    print("loading training data")
    train_data, test_data = DatasetConfig.multiple(args.data, [
        (args.train, args.train_block, "train"),
        (args.test, None, "test"),
    ])

    mesh = None
    if args.mesh:
        from beats3d_tpu.parallel import make_mesh
        n_data, n_model = (int(v) for v in args.mesh.split("x"))
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        print(f"training on mesh data={n_data} model={n_model}")

    if args.streaming:
        from beats3d_tpu.data.blocks import CompressedDataset
        train_data = CompressedDataset(train_data)
        print(f"streaming compressed blocks: depth "
              f"{train_data.depth.compression_ratio:.1f}x, labels "
              f"{train_data.labels.compression_ratio:.1f}x")

    forest = train_forest(
        train_data,
        test_data,
        num_random_features=args.proposals,
        proposals_per_block=args.proposals_block,
        images_per_block=args.train_block,
        max_tree_depth=args.depth,
        trees_in_forest=args.out_trees,
        trees_to_try=args.trees_to_try,
        rng=np.random.default_rng(args.seed),
        streaming=args.streaming,
        mesh=mesh,
    )

    print("saving model output!")
    forest.save(args.out)


if __name__ == "__main__":
    main()
