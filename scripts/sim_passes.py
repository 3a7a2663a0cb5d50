"""How many anchored 2-row x 2-chunk window passes would serve each level's
probes, per tile?  (Pure numpy; predicts the B3D_EVAL_PASSES_DEEP payoff.)

For each (tile, level, tree): compute both probes' target (row, chunk) over
active lanes, then greedily count window anchors (min-combined-id corner, FAST
geometry) until all lanes served; also count distinct (8-row block, chunk)
needed-set blocks (the exact sweep's iteration count).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sim_straggler import (  # noqa: E402
    H, W, band_filter, load_forest, scene_hands,
)

LANE = 128
SUB = 8
ROWS = 2   # _FAST_ROWS
KC = 2     # _FAST_KC


def greedy_passes(srows, chunks):
    """Anchored-window pass count to serve all (srow, chunk) targets.

    Kernel geometry: a window anchored at srow base sb serves srow in
    [2*(sb//2), 2*(sb//2) + ROWS - 1] (nh = ROWS//2 packed rows) and chunks
    [cb, cb + KC - 1]; the anchor is the min combined id (BASE1)."""
    n_chunks_img = (448 + LANE - 1) // LANE
    alive = np.ones(len(srows), bool)
    passes = 0
    while alive.any() and passes < 50:
        cid = srows[alive] * n_chunks_img + chunks[alive]
        m = cid.min()
        sb, cb = m // n_chunks_img, m % n_chunks_img
        rb = sb // 2 * 2
        served = (
            (srows >= rb) & (srows <= rb + ROWS - 1)
            & (chunks >= cb) & (chunks <= cb + KC - 1)
        )
        alive &= ~served
        passes += 1
    return passes


def main():
    depth = band_filter(scene_hands(0))
    _, fine = load_forest()
    r = 2
    t_, total, els = fine.shape
    d = int(np.log2(total + 1))

    for cx in (int(0.3 * W),):
        y0 = max(0, int(H * 0.55) - 160)
        x0 = max(0, cx - 224)
        ys, xs = np.mgrid[0:320:r, 0:448:r]
        ys = (ys + y0).reshape(-1)
        xs = (xs + x0).reshape(-1)
        dcen = depth[ys, xs].astype(np.float32)
        elig = (dcen != 0) & (dcen != 65535)
        safe = np.where(dcen == 0, 1, dcen)

        # tile ids over the 160x224 label grid (pad to 2 chunks wide)
        ty = (np.arange(160)[:, None] // 8 * 2).repeat(224, 1)
        tx = (np.arange(224)[None, :] // 128).repeat(160, 0)
        tile_of = (ty + tx).reshape(-1)

        g = np.zeros((t_, len(ys)), np.int64)
        done = ~np.tile(elig, (t_, 1))
        stats = {j: [] for j in range(d)}
        for j in range(d):
            lo = (1 << j) - 1
            nodes = fine[:, lo:][np.arange(t_)[:, None], g]
            for tr in range(t_):
                act = ~done[tr]
                if not act.any():
                    continue
                for (ox, oy) in ((0, 1), (2, 3)):
                    du = np.floor(nodes[tr, :, ox] / safe).astype(np.int64)
                    dy = np.floor(nodes[tr, :, oy] / safe).astype(np.int64)
                    py = np.clip(ys + dy - y0, 0, 319)
                    px = np.clip(xs + du - x0, 0, 447)
                    # window-start coords: srow = yc + APRON - 2*ii; at r=2
                    # the label sublane ii = ((y - y0)//2) % 8
                    ii = ((ys - y0) // 2) % 8
                    srow = py + 16 - 2 * ii
                    chunk = px // LANE
                    for t_id in np.unique(tile_of[act]):
                        sel = act & (tile_of == t_id)
                        if sel.sum() == 0:
                            continue
                        p = greedy_passes(srow[sel], chunk[sel])
                        nblocks = len(
                            np.unique(
                                srow[sel] // (2 * SUB) * 8 + chunk[sel]
                            )
                        )
                        stats[j].append((p, nblocks, sel.sum()))

            # advance walks
            du = np.floor(nodes[..., 0] / safe).astype(np.int64)
            duy = np.floor(nodes[..., 1] / safe).astype(np.int64)
            dv = np.floor(nodes[..., 2] / safe).astype(np.int64)
            dvy = np.floor(nodes[..., 3] / safe).astype(np.int64)

            def probe(ddy, ddx):
                py = ys[None] + ddy
                px = xs[None] + ddx
                oob = (py < 0) | (py >= H) | (px < 0) | (px >= W)
                v = depth[np.clip(py, 0, H - 1), np.clip(px, 0, W - 1)]
                return np.where(oob, 65535, v).astype(np.float32)

            f = probe(duy, du) - probe(dvy, dv)
            f = np.where(dcen == 0, 0.0, f)
            left = f < nodes[..., 4]
            nxt = np.where(left, nodes[..., 5], nodes[..., 6])
            is_leaf = np.floor(nxt) != -1
            done |= is_leaf
            g = np.where(done, g, 2 * g + np.where(left, 0, 1))

        print("level | probe-sets | mean passes | p90 | mean blocks | "
              "served-by-3 %")
        for j in range(d):
            if not stats[j]:
                continue
            a = np.array([s[0] for s in stats[j]])
            b = np.array([s[1] for s in stats[j]])
            print(f"  {j:2d}  | {len(a):6d}     | {a.mean():5.2f}       | "
                  f"{np.percentile(a, 90):3.0f} | {b.mean():5.2f}       | "
                  f"{(a <= 3).mean() * 100:5.1f}")


if __name__ == "__main__":
    main()
