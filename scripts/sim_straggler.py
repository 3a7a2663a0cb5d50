"""Straggler statistics of the trained flagship fine forest (pure numpy).

Questions this answers (no TPU needed):
  1. Per (8,128) label tile, at which level is the LAST lane's walk done?
     (The Pallas kernel pays full per-level probe machinery for a tile until
     every lane x tree walk is done — one straggler lane keeps the whole
     tile walking.)
  2. What is the total tile-level count (sum over tiles of last-done level)
     vs the lane-occupancy-weighted ideal (sum over levels of
     ceil(active_lanes / 1024))?  The gap is the upper bound on what
     mid-walk lane compaction could save.
  3. How clustered are active lanes' node ids / probe targets at deep
     levels (exact-sweep cost proxy)?

Approximates the bench scene: two flagship-geometry hands over the tilted
plane, band-filtered, cropped at 320x448 around each hand, labels_reduce=2.
"""
import gzip
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FLAGSHIP = os.path.join(REPO, "models", "flagship")

H, W = 480, 848
PPX, PPY = W / 2.0, H / 2.0
FX = 615.0


def scene_hands(t):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    n = np.array([0.02, -0.04, 1.0])
    n /= np.linalg.norm(n)
    depth = (2600.0 - n[0] * (xx - PPX) * 8 - n[1] * (yy - PPY) * 8) / n[2]

    def hand(cx, cy, mirror):
        palm_r = 95.0
        depth[(xx - cx) ** 2 + (yy - cy) ** 2 < palm_r ** 2] -= 320.0
        s = -1.0 if mirror else 1.0
        for k in range(5):
            ang = np.pi * (0.75 + 0.125 * k) + 0.1 * np.sin(0.4 * t + k)
            fx_ = cx + s * (palm_r + 55) * np.cos(ang)
            fy = cy - (palm_r + 55) * abs(np.sin(ang))
            tap = 0.5 + 0.5 * np.sin(0.5 * t + 1.3 * k)
            fr = 26.0 + 2 * k
            depth[(xx - fx_) ** 2 + (yy - fy) ** 2 < fr ** 2] -= (
                340.0 + 40.0 * tap + 15 * k
            )

    hand(0.3 * W, H * 0.55, False)
    hand(0.7 * W, H * 0.55, True)
    return depth.astype(np.uint16)


def band_filter(depth):
    """Keep pixels meaningfully above the table plane (approximate
    plane_band_depth: the synthetic table is at plane height 0)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    n = np.array([0.02, -0.04, 1.0])
    n /= np.linalg.norm(n)
    table = (2600.0 - n[0] * (xx - PPX) * 8 - n[1] * (yy - PPY) * 8) / n[2]
    keep = depth.astype(np.float32) < table - 40.0
    # pipeline converts stenciled 0s to the 65535 sentinel before eval
    return np.where(keep, depth, 65535).astype(np.uint16)


def load_forest():
    with gzip.open(os.path.join(FLAGSHIP, "m1.npy.gz"), "rb") as f:
        fine = np.load(f)
    coarse = np.load(os.path.join(FLAGSHIP, "m0.npy"))
    return coarse, fine


def walk_depths(forest, depth_img, ys, xs, scale):
    """Per-pixel per-tree leaf level + per-level node ids, vectorized."""
    t, total, els = forest.shape
    d = int(np.log2(total + 1))
    dcen = depth_img[ys, xs].astype(np.float32)
    safe = np.where(dcen == 0, 1.0, dcen)
    out_lvl = np.zeros((t, len(ys)), np.int32)
    node_hist = []  # per level: (t, P) dense node id or -1 when done
    g = np.zeros((t, len(ys)), np.int64)
    done = np.zeros((t, len(ys)), bool)
    hw = depth_img.shape
    for j in range(d):
        node_hist.append(np.where(done, -1, g).astype(np.int64))
        lo = (1 << j) - 1
        nodes = forest[:, lo:][np.arange(t)[:, None], g]  # (t, P, els)
        du = np.floor(scale * nodes[..., 0] / safe).astype(np.int64)
        dv = np.floor(scale * nodes[..., 2] / safe).astype(np.int64)
        duy = np.floor(scale * nodes[..., 1] / safe).astype(np.int64)
        dvy = np.floor(scale * nodes[..., 3] / safe).astype(np.int64)

        def probe(dy, dx):
            py = ys[None] + dy
            px = xs[None] + dx
            oob = (py < 0) | (py >= hw[0]) | (px < 0) | (px >= hw[1])
            v = depth_img[np.clip(py, 0, hw[0] - 1), np.clip(px, 0, hw[1] - 1)]
            return np.where(oob, 65535, v).astype(np.float32)

        f = probe(duy, du) - probe(dvy, dv)
        f = np.where(dcen == 0, 0.0, f)
        left = f < nodes[..., 4]
        nxt = np.where(left, nodes[..., 5], nodes[..., 6])
        is_leaf = np.floor(nxt) != -1
        hit = (~done) & is_leaf
        out_lvl = np.where(hit, j, out_lvl)
        done |= is_leaf
        g = np.where(done, g, 2 * g + np.where(left, 0, 1))
    return out_lvl, node_hist


def main():
    depth = band_filter(scene_hands(0))
    coarse, fine = load_forest()
    scale = 1.0
    r = 2

    # label-grid pixels inside the two 320x448 crops around the hands
    stats_all = []
    for cx in (int(0.3 * W), int(0.7 * W)):
        y0 = max(0, int(H * 0.55) - 160)
        x0 = max(0, cx - 224)
        ys, xs = np.mgrid[0:320:r, 0:448:r]
        ys = (ys + y0).reshape(-1)
        xs = (xs + x0).reshape(-1)
        # tiles: (8,128) over the 160x224 label grid
        lvl_fine, _ = walk_depths(fine, depth, ys, xs, scale)
        dcen = depth[ys, xs]
        elig = (dcen != 0) & (dcen != 65535)
        # max leaf level over trees per pixel; ineligible = -1
        per_px = np.where(elig, lvl_fine.max(axis=0), -1)
        tile = per_px.reshape(160 // 8, 8, 224 // 128 + 1, -1)[
            :, :, :, :128
        ]  # 20 x 8 x 1.75 -> pad: simpler below
        # redo tiling properly with padding to 256 lanes wide
        grid = np.full((160, 256), -1, np.int64)
        grid[:, :224] = per_px.reshape(160, 224)
        tiles = grid.reshape(20, 8, 2, 128).transpose(0, 2, 1, 3).reshape(
            40, 8 * 128
        )
        occupied = (tiles >= 0).any(axis=1)
        t_last = tiles.max(axis=1)  # last-done level per tile
        # per-level active lane count (walk still running at START of j)
        occ = tiles[occupied]
        lane_lvls = occ  # (ntiles, 1024)
        total_tile_levels = (t_last[occupied] + 1).sum()
        ideal = 0
        act_hist = []
        for j in range(16):
            act = (lane_lvls >= j).sum(axis=1)  # per tile active lanes
            act_hist.append(act.sum())
            ideal += int(np.ceil(act.sum() / 1024.0))
        stats_all.append((occupied.sum(), total_tile_levels, ideal, act_hist,
                          t_last[occupied]))

    for i, (nocc, tot, ideal, hist, tl) in enumerate(stats_all):
        print(f"crop {i}: occupied tiles {nocc}, tile-levels paid {tot}, "
              f"perfect-compaction tile-levels {ideal}")
        print(f"  last-done level percentiles: "
              f"p50={np.percentile(tl,50):.0f} p90={np.percentile(tl,90):.0f} "
              f"max={tl.max()}")
        print("  active lanes by level:",
              " ".join(f"{j}:{h}" for j, h in enumerate(hist)))


if __name__ == "__main__":
    main()
