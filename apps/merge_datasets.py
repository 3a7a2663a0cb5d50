#!/usr/bin/env python3
"""Merge labeled datasets with per-dataset label remapping.

Artifact-compatible with the reference's mapping JSON and merged-dataset
layout (src/merge_datasets.py defines the FORMAT); the merge itself is
array-level — see beats3d_tpu.data.merge.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from beats3d_tpu.data.merge import load_plan, merge_datasets


def main():
    parser = argparse.ArgumentParser(description="Combine multiple datasets")
    parser.add_argument("-m", "--mapping", required=True, type=str,
                        help="Path to JSON file describing merge")
    parser.add_argument("-o", "--out", required=True, type=str,
                        help="Out directory for merged dataset")
    parser.add_argument("--only_one", action="store_true",
                        help="Only take one image per source (debug)")
    args = parser.parse_args()

    result = merge_datasets(
        load_plan(args.mapping), args.out,
        images_per_set=1 if args.only_one else None,
    )
    print(f"merged {result['num_images']} images "
          f"({result['num_classes'] - 1} classes) into {args.out}")


if __name__ == "__main__":
    main()
