"""Predicted trip counts for MULTI-ROW serving of the SWEEP=4 probe loop.

Hypothesis (round 5): a probe's needed (packed-row, chunk) cells are mostly
CONTIGUOUS ROW RUNS within a chunk (depth slope varies smoothly across a
tile), so one trip can serve D consecutive same-chunk rows from ONE window
load — D extra (roll + shuffle + shift + select) per probe, ~21 ns each,
with NO extra min-extraction round-trip.  Trip count (the serial-chain
multiplier) then drops toward cells/D while serve-slot vector work stays
proportional to D per trip.

Prints, per D: total trips, mean trips/(tile,level) instance, and a
cost-model estimate per instance using the measured per-op costs
(try_opcost.py) with serve work overlapping the min-extraction chain.

Run: JAX_PLATFORMS=cpu python scripts/sim_rowspan.py [nframes]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import importlib

sim = importlib.import_module("scripts.sim_v2_serve")

SUB, LANE, APRON_T, R = sim.SUB, sim.LANE, sim.APRON_T, sim.R
H, W = sim.H, sim.W


def greedy_trips(cells, n_chunks, d):
    """Trips to drain a cell set serving rows q..q+d-1 of the min cell's
    chunk per trip (cell id = q * n_chunks + chunk)."""
    rem = set(cells)
    trips = 0
    while rem:
        m = min(rem)
        for k in range(d):
            rem.discard(m + k * n_chunks)
        trips += 1
    return trips


def main():
    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    crops, model = sim.make_crops(nframes)
    fine = np.asarray(model.layers[1].flat)
    coarse = np.asarray(model.layers[0].flat)
    n_chunks = W // LANE
    ds = (1, 2, 3, 4, 6, 8)
    tot_trips = {d: 0 for d in ds}
    tot_inst = 0
    tot_cells = 0
    yl, xl = np.mgrid[0:H // R, 0:W // R]
    yf0, xf0 = yl * R, xl * R
    nty, ntx = (H // R) // SUB, (W // R) // LANE
    for ci, crop in enumerate(crops):
        lab0, recs0, _ = sim.walk_layer(
            crop, coarse, np.ones((H // R, W // R), bool))
        filt = lab0 == 1
        _, recs1, _ = sim.walk_layer(crop, fine, filt)
        for recs in (recs0, recs1):
            by_lvl_tile = {}
            for (tree, j, g, act, duy, dux, dvy, dvx) in recs:
                for pi, (dy, dx) in enumerate(((duy, dux), (dvy, dvx))):
                    y, x = yf0 + dy, xf0 + dx
                    oob = (y < 0) | (y >= H) | (x < 0) | (x >= W)
                    serve = act & ~oob
                    yc = np.clip(y, 0, H - 1)
                    xc = np.clip(x, 0, W - 1)
                    srow = yc + APRON_T - 2 * (yl % SUB)
                    cell = (srow // 2) * n_chunks + xc // LANE
                    for ty in range(nty):
                        for tx in range(ntx):
                            sl = (slice(ty * SUB, (ty + 1) * SUB),
                                  slice(tx * LANE, (tx + 1) * LANE))
                            sv = serve[sl]
                            if not sv.any():
                                continue
                            by_lvl_tile.setdefault((j, ty, tx), {}).setdefault(
                                (tree, pi), set()
                            ).update(np.unique(cell[sl][sv]).tolist())
            for key, probes in by_lvl_tile.items():
                tot_inst += 1
                tot_cells += sum(len(v) for v in probes.values())
                for d in ds:
                    tot_trips[d] += max(
                        greedy_trips(v, n_chunks, d) for v in probes.values()
                    )

    print(f"instances={tot_inst} cells={tot_cells} "
          f"(mean {tot_cells/tot_inst:.1f}/inst)")
    print(" D | trips | trips/inst | est ns/inst (max(serve, chain) model)")
    for d in ds:
        t = tot_trips[d]
        # serve work per trip: 8 probes x (load + d*(roll+shuf+shift+2sel));
        # chain per trip: reduce+scratch+readback ~230 ns + loop ~60
        serve = 8 * ((6 if d > 1 else 4) + d * 19)
        per_trip = max(serve, 290)
        print(f"{d:2d} | {t:6d} | {t/tot_inst:10.2f} | "
              f"{t/tot_inst*per_trip:8.0f}")


if __name__ == "__main__" and "rect" not in sys.argv and "box" not in sys.argv:
    main()


def greedy_trips_rect(cells, n_chunks, dr, dc):
    """Trips serving the {q..q+dr-1} x {c..c+dc-1} rectangle anchored at
    the min cell per trip (dc loads + dr*dc shuffles per trip)."""
    rem = set(cells)
    trips = 0
    while rem:
        m = min(rem)
        for g in range(dc):
            for k in range(dr):
                rem.discard(m + k * n_chunks + g)
        trips += 1
    return trips


def rect_main():
    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    crops, model = sim.make_crops(nframes)
    fine = np.asarray(model.layers[1].flat)
    coarse = np.asarray(model.layers[0].flat)
    n_chunks = W // LANE
    shapes = [(1, 1), (2, 1), (1, 2), (2, 2), (3, 2), (4, 2), (8, 2),
              (2, 3), (4, 4)]
    tot = {s: 0 for s in shapes}
    tot_inst = 0
    tot_cells = 0
    nrows_l, nchunks_l = [], []
    yl, xl = np.mgrid[0:H // R, 0:W // R]
    yf0, xf0 = yl * R, xl * R
    nty, ntx = (H // R) // SUB, (W // R) // LANE
    for ci, crop in enumerate(crops):
        lab0, recs0, _ = sim.walk_layer(
            crop, coarse, np.ones((H // R, W // R), bool))
        filt = lab0 == 1
        _, recs1, _ = sim.walk_layer(crop, fine, filt)
        for recs in (recs0, recs1):
            by_lvl_tile = {}
            for (tree, j, g, act, duy, dux, dvy, dvx) in recs:
                for pi, (dy, dx) in enumerate(((duy, dux), (dvy, dvx))):
                    y, x = yf0 + dy, xf0 + dx
                    oob = (y < 0) | (y >= H) | (x < 0) | (x >= W)
                    serve = act & ~oob
                    yc = np.clip(y, 0, H - 1)
                    xc = np.clip(x, 0, W - 1)
                    srow = yc + APRON_T - 2 * (yl % SUB)
                    cell = (srow // 2) * n_chunks + xc // LANE
                    for ty in range(nty):
                        for tx in range(ntx):
                            sl = (slice(ty * SUB, (ty + 1) * SUB),
                                  slice(tx * LANE, (tx + 1) * LANE))
                            sv = serve[sl]
                            if not sv.any():
                                continue
                            by_lvl_tile.setdefault((j, ty, tx), {}).setdefault(
                                (tree, pi), set()
                            ).update(np.unique(cell[sl][sv]).tolist())
            for key, probes in by_lvl_tile.items():
                tot_inst += 1
                for v in probes.values():
                    tot_cells += len(v)
                    nrows_l.append(len({c // n_chunks for c in v}))
                    nchunks_l.append(len({c % n_chunks for c in v}))
                for s in shapes:
                    tot[s] += max(
                        greedy_trips_rect(v, n_chunks, *s)
                        for v in probes.values()
                    )

    print(f"instances={tot_inst} cells={tot_cells} "
          f"(mean {tot_cells/tot_inst:.1f}/inst)")
    print(f"per-probe distinct rows p50/p90: "
          f"{np.percentile(nrows_l, 50):.0f}/{np.percentile(nrows_l, 90):.0f}"
          f"  distinct chunks p50/p90: {np.percentile(nchunks_l, 50):.0f}/"
          f"{np.percentile(nchunks_l, 90):.0f}")
    print("dr x dc | trips | trips/inst | est ns/inst")
    for (dr, dc) in shapes:
        t = tot[(dr, dc)]
        serve = 8 * (dc * 6 + dr * dc * 19)
        per_trip = max(serve, 290)
        print(f"{dr} x {dc}  | {t:6d} | {t/tot_inst:10.2f} | "
              f"{t/tot_inst*per_trip:8.0f}")


if __name__ == "__main__" and "rect" in sys.argv:
    rect_main()


def box_main():
    """Per-probe bounding-BOX scan economics: serve every (row-band, chunk)
    of each probe's own box with bounds computed ONCE per level (2 batched
    reduces), no per-trip min-extraction chain.  Reports box spans, trips
    (= max over probes of bands*chunkspan), and total serve ops; plus the
    node-chunk / leaf-chunk structure for the table-sweep equivalents."""
    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    crops, model = sim.make_crops(nframes)
    fine = np.asarray(model.layers[1].flat)
    coarse = np.asarray(model.layers[0].flat)
    n_chunks = W // LANE
    tot_inst = 0
    trips11 = 0  # current needed-set baseline
    box_trips = {1: 0, 2: 0, 4: 0, 8: 0}  # band height -> trips
    box_serves = {1: 0, 2: 0, 4: 0, 8: 0}
    rspans, cspans = [], []
    yl, xl = np.mgrid[0:H // R, 0:W // R]
    yf0, xf0 = yl * R, xl * R
    nty, ntx = (H // R) // SUB, (W // R) // LANE
    for ci, crop in enumerate(crops):
        lab0, recs0, _ = sim.walk_layer(
            crop, coarse, np.ones((H // R, W // R), bool))
        filt = lab0 == 1
        _, recs1, _ = sim.walk_layer(crop, fine, filt)
        for recs in (recs0, recs1):
            by_lvl_tile = {}
            for (tree, j, g, act, duy, dux, dvy, dvx) in recs:
                for pi, (dy, dx) in enumerate(((duy, dux), (dvy, dvx))):
                    y, x = yf0 + dy, xf0 + dx
                    oob = (y < 0) | (y >= H) | (x < 0) | (x >= W)
                    serve = act & ~oob
                    yc = np.clip(y, 0, H - 1)
                    xc = np.clip(x, 0, W - 1)
                    srow = yc + APRON_T - 2 * (yl % SUB)
                    cell = (srow // 2) * n_chunks + xc // LANE
                    for ty in range(nty):
                        for tx in range(ntx):
                            sl = (slice(ty * SUB, (ty + 1) * SUB),
                                  slice(tx * LANE, (tx + 1) * LANE))
                            sv = serve[sl]
                            if not sv.any():
                                continue
                            by_lvl_tile.setdefault((j, ty, tx), {}).setdefault(
                                (tree, pi), set()
                            ).update(np.unique(cell[sl][sv]).tolist())
            for key, probes in by_lvl_tile.items():
                tot_inst += 1
                trips11 += max(
                    greedy_trips_rect(v, n_chunks, 1, 1)
                    for v in probes.values()
                )
                pb = {1: [], 2: [], 4: [], 8: []}
                for v in probes.values():
                    rows = sorted({c // n_chunks for c in v})
                    chs = sorted({c % n_chunks for c in v})
                    rs = rows[-1] - rows[0] + 1
                    cs = chs[-1] - chs[0] + 1
                    rspans.append(rs)
                    cspans.append(cs)
                    for band in pb:
                        t = ((rs + band - 1) // band) * cs
                        pb[band].append(t)
                for band in pb:
                    box_trips[band] += max(pb[band])
                    box_serves[band] += sum(
                        t * band for t in pb[band]
                    )
    print(f"instances={tot_inst} baseline needed-set trips/inst="
          f"{trips11/tot_inst:.2f}")
    print(f"per-probe ROW-SPAN p50/p90/p99: {np.percentile(rspans,50):.0f}/"
          f"{np.percentile(rspans,90):.0f}/{np.percentile(rspans,99):.0f}"
          f"   CHUNK-SPAN p50/p90/max: {np.percentile(cspans,50):.0f}/"
          f"{np.percentile(cspans,90):.0f}/{max(cspans)}")
    print("band | box trips/inst | serve-ops/inst (8 probes lockstep)")
    for band in (1, 2, 4, 8):
        print(f"{band:4d} | {box_trips[band]/tot_inst:14.2f} | "
              f"{8*box_trips[band]*band/tot_inst:10.1f}")


if __name__ == "__main__" and "box" in sys.argv:
    box_main()


def tables_main():
    """Chunk-adjacency of the CBATCH table sweeps: per (tile, level, tree)
    node-chunk needed sets (comps) and per (tile, tree) leaf-chunk sets
    (deferred pdf); greedy trips at chunk span 1 vs 2 vs 3 predict the
    _CSPAN knob's trip savings."""
    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    crops, model = sim.make_crops(nframes)
    fine = np.asarray(model.layers[1].flat)
    coarse = np.asarray(model.layers[0].flat)
    yl, xl = np.mgrid[0:H // R, 0:W // R]
    nty, ntx = (H // R) // SUB, (W // R) // LANE

    def compact_ids(forest):
        """dense g -> compact per-level id, per tree (pack_tables_pallas
        renumbering), plus DFS leaf ids."""
        t, total, els = forest.shape
        d = int(np.log2(total + 1))
        comp_of = [dict() for _ in range(t)]
        leaf_of = [dict() for _ in range(t)]  # (level, g, side) -> leaf id

        for tree in range(t):
            ids = [[0]]
            j = 0
            cnt = [0]

            def dfs(j, g):
                node = forest[tree, (1 << j) - 1 + g]
                for side, gg in ((0, 2 * g), (1, 2 * g + 1)):
                    if np.floor(node[5 + side]) == -1:
                        dfs(j + 1, gg)
                    else:
                        cnt[0] += 1
                        leaf_of[tree][(j, g, side)] = cnt[0] - 1

            # build compact numbering BFS like pack_tables
            j = 0
            while ids[j]:
                nxt = []
                for qi, g in enumerate(ids[j]):
                    comp_of[tree][(j, g)] = qi
                    node = forest[tree, (1 << j) - 1 + g]
                    if np.floor(node[5]) == -1:
                        nxt.append(2 * g)
                    if np.floor(node[6]) == -1:
                        nxt.append(2 * g + 1)
                ids.append(nxt)
                j += 1
                if j >= d:
                    break
            import sys as _s
            _s.setrecursionlimit(100000)
            dfs(0, 0)
        return comp_of, leaf_of

    for name, forest, act_fn in (
        ("coarse", coarse, None), ("fine", fine, None),
    ):
        comp_of, _ = compact_ids(forest)
        comps_trips = {1: 0, 2: 0, 3: 0}
        pdf_trips = {1: 0, 2: 0, 3: 0}
        n_comp_inst = n_pdf_inst = 0
        for ci, crop in enumerate(crops):
            lab0, recs0, _ = sim.walk_layer(
                crop, coarse, np.ones((H // R, W // R), bool))
            if name == "coarse":
                recs = recs0
            else:
                _, recs, _ = sim.walk_layer(crop, fine, lab0 == 1)
            # comps: per (level, tile): per tree the compact-id chunk set
            by_lvl = {}
            for (tree, j, g, act, duy, dux, dvy, dvx) in recs:
                for ty in range(nty):
                    for tx in range(ntx):
                        sl = (slice(ty * SUB, (ty + 1) * SUB),
                              slice(tx * LANE, (tx + 1) * LANE))
                        ga = g[sl][act[sl]]
                        if not len(ga):
                            continue
                        cset = {
                            comp_of[tree].get((j, gg), 0) // LANE
                            for gg in np.unique(ga)
                        }
                        by_lvl.setdefault((j, ty, tx), {}).setdefault(
                            tree, set()).update(cset)
            for key, trees in by_lvl.items():
                n_comp_inst += 1
                for spn in comps_trips:
                    comps_trips[spn] += max(
                        greedy_trips(v, 1, spn)
                        for v in trees.values()
                    )
        q = lambda d: {k: round(v / max(n_comp_inst, 1), 2)
                       for k, v in d.items()}
        print(f"{name}: comps instances={n_comp_inst} "
              f"trips/inst by span: {q(comps_trips)}")


if __name__ == "__main__" and "tables" in sys.argv:
    tables_main()
