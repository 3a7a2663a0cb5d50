"""Stereo pair -> disparity -> depth PNG (reference datagen/stereo_alg.py).

    python apps/stereo_depth.py --left l.png --right r.png --out depth.png
"""
import argparse

import numpy as np
from PIL import Image

import jax.numpy as jnp

from beats3d_tpu.ops import stereo


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min_disparity", type=int, default=0)
    p.add_argument("--max_disparity", type=int, default=32)
    p.add_argument("--block_size", type=int, default=11)
    p.add_argument("--depth_scale", type=float, default=100000.0,
                   help="depth = scale / disparity (stereo_alg.py:32)")
    args = p.parse_args()

    def grayscale(path):
        a = np.asarray(Image.open(path))
        return a[:, :, 0] if a.ndim == 3 else a  # stereo_alg.py:15-16

    disp = stereo.block_match_disparity(
        jnp.asarray(grayscale(args.left)),
        jnp.asarray(grayscale(args.right)),
        min_disparity=args.min_disparity,
        max_disparity=args.max_disparity,
        block_size=args.block_size,
    )
    depth = np.asarray(stereo.depth_from_disparity(disp, args.depth_scale))
    Image.fromarray(depth).save(args.out)
    valid = depth > 0
    print(f"depth: {args.out}  valid px {int(valid.sum())}/{depth.size}  "
          f"range [{int(depth[valid].min()) if valid.any() else 0}, "
          f"{int(depth.max())}]")


if __name__ == "__main__":
    main()
