"""Photographed projector tile -> normalized tiled pattern image
(reference datagen/make_proj_image.py).

    python apps/make_proj_image.py --src l2_green.png \
        --corners 884,417 976,567 1124,458 1028,304 --out pattern.png
"""
import argparse

import numpy as np
from PIL import Image

from beats3d_tpu.ops.warp import make_projector_pattern


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--corners", nargs=4, required=True,
                   help="four x,y corners of the tile in the photo "
                        "(make_proj_image.py:10-13 order)")
    p.add_argument("--out", required=True)
    p.add_argument("--tile_size", type=int, default=100)
    p.add_argument("--num_tiles", type=int, default=20)
    args = p.parse_args()

    pts = np.array([[float(v) for v in c.split(",")] for c in args.corners])
    img = np.asarray(Image.open(args.src).convert("RGB"))
    out = make_projector_pattern(
        img, pts, tile_size=args.tile_size, num_tiles=args.num_tiles
    )
    Image.fromarray(out).save(args.out)
    print(f"pattern: {args.out}  {out.shape[1]}x{out.shape[0]}")


if __name__ == "__main__":
    main()
