"""Predicted exact-sweep cost: 8-row-BLOCK granularity (current, ~200
vector-ops per iteration: 8 rolls + 64 shuffles) vs single-PACKED-ROW
granularity (~60 ops: 1 roll + 8 shuffles), after P anchored passes.

Union needed-sets are over all 8 probes (4 trees x u/v) of a (tile, level),
matching gather_probes_exact's union sweep.  Pure numpy.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sim_passes import greedy_passes  # noqa: E402,F401
from sim_straggler import (  # noqa: E402
    H, W, band_filter, load_forest, scene_hands,
)

LANE = 128
SUB = 8
ROWS = 2
KC = 2
N_CHUNKS = 4  # 448 / 128 rounded up

BLOCK_COST = 8 + 8 * 8 + 8 * 16   # rolls + shuffles + selects (approx)
ROW_COST = 4 + 8 * (1 + 4)        # load/roll/bcast + per-probe shuffle+sel
PASS_COST = 8 * (1 + 2 + 2 + 6)   # per extra anchored pass (all 8 probes)


def unserved_after(srows, chunks, n_passes):
    alive = np.ones(len(srows), bool)
    for _ in range(n_passes):
        if not alive.any():
            break
        cid = srows[alive] * N_CHUNKS + chunks[alive]
        m = cid.min()
        sb, cb = m // N_CHUNKS, m % N_CHUNKS
        rb = sb // 2 * 2
        served = (
            (srows >= rb) & (srows <= rb + ROWS - 1)
            & (chunks >= cb) & (chunks <= cb + KC - 1)
        )
        alive &= ~served
    return alive


def main():
    depth = band_filter(scene_hands(0))
    _, fine = load_forest()
    r = 2
    t_, total, els = fine.shape
    d = int(np.log2(total + 1))

    for passes in (3, 5, 7):
        tot_block = 0.0
        tot_row = 0.0
        tot_pass = 0.0
        for cx in (int(0.3 * W),):
            y0 = max(0, int(H * 0.55) - 160)
            x0 = max(0, cx - 224)
            ys, xs = np.mgrid[0:320:r, 0:448:r]
            ys = (ys + y0).reshape(-1)
            xs = (xs + x0).reshape(-1)
            dcen = depth[ys, xs].astype(np.float32)
            elig = (dcen != 0) & (dcen != 65535)
            safe = np.where(dcen == 0, 1, dcen)
            ty = (np.arange(160)[:, None] // 8 * 2).repeat(224, 1)
            tx = (np.arange(224)[None, :] // 128).repeat(160, 0)
            tile_of = (ty + tx).reshape(-1)
            ii = ((ys - y0) // 2) % 8

            g = np.zeros((t_, len(ys)), np.int64)
            done = ~np.tile(elig, (t_, 1))
            for j in range(d):
                lo = (1 << j) - 1
                nodes = fine[:, lo:][np.arange(t_)[:, None], g]
                # per tile: collect all 8 probes' straggler (q, chunk) ids
                per_tile_q = {}
                per_tile_b = {}
                for tr in range(t_):
                    act = ~done[tr]
                    for (ox, oy) in ((0, 1), (2, 3)):
                        du = np.floor(nodes[tr, :, ox] / safe).astype(np.int64)
                        dy = np.floor(nodes[tr, :, oy] / safe).astype(np.int64)
                        py = np.clip(ys + dy - y0, 0, 319)
                        px = np.clip(xs + du - x0, 0, 447)
                        srow = py + 16 - 2 * ii
                        chunk = px // LANE
                        for t_id in np.unique(tile_of[act]):
                            sel = np.flatnonzero(act & (tile_of == t_id))
                            if len(sel) == 0:
                                continue
                            al = unserved_after(
                                srow[sel], chunk[sel], passes
                            )
                            if not al.any():
                                continue
                            s = sel[al]
                            qid = (srow[s] // 2) * N_CHUNKS + chunk[s]
                            bid = (srow[s] // 16) * N_CHUNKS + chunk[s]
                            per_tile_q.setdefault(t_id, set()).update(
                                qid.tolist())
                            per_tile_b.setdefault(t_id, set()).update(
                                bid.tolist())
                n_active_tiles = len(np.unique(tile_of[(~done).any(axis=0)]))
                tot_pass += n_active_tiles * (passes - 1) * PASS_COST
                for t_id, qs in per_tile_q.items():
                    tot_row += len(qs) * ROW_COST
                for t_id, bs in per_tile_b.items():
                    tot_block += len(bs) * BLOCK_COST

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

        print(f"passes={passes}: extra-pass ops {tot_pass:9.0f}  "
              f"block-sweep ops {tot_block:9.0f}  row-sweep ops "
              f"{tot_row:9.0f}  (block total {tot_pass + tot_block:9.0f}, "
              f"row total {tot_pass + tot_row:9.0f})")


if __name__ == "__main__":
    main()
