"""Instrumented host-side traversal of the flagship-v2 model on the bench
scene: measures, per (label tile, level, probe), the structure the Pallas
eval kernel's image-probe serving actually faces — needed-set cell counts at
several granularities, straggler survival through the anchored fast passes,
distinct node/leaf chunks — and prices alternative serving schemes from op
cost models (try_opcost.py: shuffle ~13 ns, roll/select ~1-2 ns, cross-lane
reduce ~150-200 ns serial).

Pure host work (JAX-CPU for scene/crops, numpy for the walk); no TPU needed.
Run: JAX_PLATFORMS=cpu python scripts/sim_v2_serve.py [B]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SUB, LANE = 8, 128
APRON_T = 16
R = 2  # labels_reduce
H, W = 448, 512  # crop dims

# op cost model (ns)
C_SHUF = 13.0
C_ROLL = 2.0
C_SEL = 1.0
C_LOAD = 4.0
C_REDUCE = 170.0  # cross-lane reduce + scalar extract, serial
C_LOOP = 60.0     # dynamic-trip loop iteration overhead (scf, no pipelining)


def make_crops(nframes):
    import jax
    import jax.numpy as jnp
    from bench import _scene_hands, load_flagship
    from beats3d_tpu.runtime.pipeline import (
        FramePipeline, _preproc_front, _crop_origins, _stencil_crops)
    from beats3d_tpu.ops import plane as plane_ops
    from beats3d_tpu.ops import points as points_ops
    from beats3d_tpu.utils import CameraIntrinsics

    intrin = CameraIntrinsics.d415()
    model = load_flagship()
    pipe = FramePipeline(model, intrin)
    cfg = pipe.cfg
    h, w = intrin.height, intrin.width
    frames = jnp.asarray(
        np.stack([_scene_hands(intrin, t) for t in range(nframes)]))
    pts = jax.jit(points_ops.deproject_points)(frames[0], pipe._pp, pipe._fx)
    plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

    def front(raw):
        depth1, grown, g_info, _ = _preproc_front(
            raw, plane_mat, pipe._pp, pipe._fx, pipe.gauss_kernel,
            pipe._zthr, pipe._gms, cfg)
        oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
        return _stencil_crops(depth1, grown, oys, oxs, cfg, h, w)

    crops = jax.jit(lambda: jax.vmap(front)(frames))()
    return np.asarray(crops).reshape(-1, cfg.crop_h, cfg.crop_w), model


def walk_layer(crop, forest, active0):
    """Vectorized per-pixel walk of one dense forest over one crop.

    Returns labels (hl, wl) and a per-level record list:
    [(tree, g_ids (hl, wl), act (hl, wl), duy, dux, dvy, dvx)]."""
    t, total, els = forest.shape
    d = int(np.log2(total + 1))
    c = (els - 7) // 2
    hl, wl = H // R, W // R
    dc = crop[::R, ::R].astype(np.float32)
    eligible = (crop[::R, ::R] != 0) & (crop[::R, ::R] != 65535) & active0
    safe = np.where(dc == 0, 1.0, dc)
    yl, xl = np.mgrid[0:hl, 0:wl]
    yf0, xf0 = yl * R, xl * R

    recs = []
    pdf_sum = np.zeros((hl, wl, c), np.float32)
    leaf_level = np.zeros((t, hl, wl), np.int32)
    for tree in range(t):
        g = np.zeros((hl, wl), np.int64)
        act = eligible.copy()
        for j in range(d):
            if not act.any():
                break
            lo = (1 << j) - 1
            node = forest[tree, lo + g]  # (hl, wl, els)
            duy = np.floor(node[..., 1] / safe).astype(np.int64)
            dux = np.floor(node[..., 0] / safe).astype(np.int64)
            dvy = np.floor(node[..., 3] / safe).astype(np.int64)
            dvx = np.floor(node[..., 2] / safe).astype(np.int64)
            recs.append((tree, j, g.copy(), act.copy(), duy, dux, dvy, dvx))

            def probe(dy, dx):
                y, x = yf0 + dy, xf0 + dx
                oob = (y < 0) | (y >= H) | (x < 0) | (x >= W)
                v = crop[np.clip(y, 0, H - 1), np.clip(x, 0, W - 1)]
                return np.where(oob, 65535, v).astype(np.float32)

            f = probe(duy, dux) - probe(dvy, dvx)
            f = np.where(dc == 0, 0.0, f)
            left = f < node[..., 4]
            nxt_marker = np.where(left, node[..., 5], node[..., 6])
            descend = np.floor(nxt_marker) == -1
            hit = act & ~descend
            pdfs = np.where(left[..., None], node[..., 7:7 + c],
                            node[..., 7 + c:7 + 2 * c])
            pdf_sum += np.where(hit[..., None], pdfs, 0.0)
            leaf_level[tree] = np.where(hit, j, leaf_level[tree])
            g = np.where(act & descend, 2 * g + np.where(left, 0, 1), g)
            act = act & descend
    labels = np.where(eligible, pdf_sum.argmax(-1), 65535)
    # strictly-greater argmax with all-zero pdf -> class 0; matches oracle
    return labels, recs, eligible


def tile_metrics(crop, recs, n_trees):
    """Aggregate serving-structure metrics per (tile, level)."""
    hl, wl = H // R, W // R
    nty, ntx = hl // SUB, wl // LANE
    n_chunks = W // LANE  # full-res chunks (x targets full-res)
    out = {}  # level -> dict of accumulators
    dc = crop[::R, ::R]

    # organize recs: (tree, level) -> entry
    for (tree, j, g, act, duy, dux, dvy, dvx) in recs:
        yl, xl = np.mgrid[0:hl, 0:wl]
        yf0, xf0 = yl * R, xl * R
        lev = out.setdefault(j, {
            "tiles": {},  # (ty,tx) -> per-probe lists
        })
        for (dy, dx) in ((duy, dux), (dvy, dvx)):
            y, x = yf0 + dy, xf0 + dx
            oob = (y < 0) | (y >= H) | (x < 0) | (x >= W)
            serve = act & ~oob
            yc = np.clip(y, 0, H - 1)
            xc = np.clip(x, 0, W - 1)
            srow = yc + APRON_T - 2 * (yl % SUB)
            chunk = xc // LANE
            for ty in range(nty):
                for tx in range(ntx):
                    sl = (slice(ty * SUB, ty * SUB + SUB),
                          slice(tx * LANE, tx * LANE + LANE))
                    sv = serve[sl]
                    if not sv.any():
                        continue
                    tile = lev["tiles"].setdefault((ty, tx), [])
                    tile.append({
                        "srow": srow[sl][sv], "chunk": chunk[sl][sv],
                        "g": g[sl][act[sl]] if act[sl].any() else
                        np.zeros(0, np.int64),
                        "n_serve": int(sv.sum()),
                    })
    return out


def fast_pass_survivors(srow, chunk, n_chunks, passes, rows=2, kc=2):
    """Straggler count after `passes` anchored (rows x kc) windows."""
    alive = np.ones(len(srow), bool)
    for _ in range(passes):
        if not alive.any():
            break
        cid = srow[alive].astype(np.int64) * n_chunks + chunk[alive]
        m = cid.min()
        sb, cb = m // n_chunks, m % n_chunks
        hb = sb // 2
        served = ((srow >= 2 * hb) & (srow <= 2 * hb + rows - 1)
                  & (chunk >= cb) & (chunk <= cb + kc - 1))
        alive &= ~served
    return alive


def main():
    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    crops, model = make_crops(nframes)
    fine = np.asarray(model.layers[1].flat)
    coarse = np.asarray(model.layers[0].flat)
    print(f"crops {crops.shape}, coarse {coarse.shape}, fine {fine.shape}",
          flush=True)

    n_chunks = W // LANE
    # per-level aggregates over all (crop, tile)
    agg = {}
    for ci, crop in enumerate(crops):
        lab0, recs0, elig0 = walk_layer(crop, coarse, np.ones(
            (H // R, W // R), bool))
        filt = lab0 == 1
        lab1, recs1, _ = walk_layer(crop, fine, filt)
        for (tree, j, g, act, duy, dux, dvy, dvx) in recs1:
            yl, xl = np.mgrid[0:H // R, 0:W // R]
            yf0, xf0 = yl * R, xl * R
            a = agg.setdefault(j, dict(
                tiles=0, probes=0, srow_cells=[], blk_cells=[],
                union_blk=[], strag3=[], nodes=[], node_chunks=[],
                per_probe_blk=[], tile_ids=set()))
            for (dy, dx) in ((duy, dux), (dvy, dvx)):
                y, x = yf0 + dy, xf0 + dx
                oob = (y < 0) | (y >= H) | (x < 0) | (x >= W)
                serve = act & ~oob
                yc, xc = np.clip(y, 0, H - 1), np.clip(x, 0, W - 1)
                srow = yc + APRON_T - 2 * (yl % SUB)
                chunk = xc // LANE
                nty, ntx = (H // R) // SUB, (W // R) // LANE
                for ty in range(nty):
                    for tx in range(ntx):
                        sl = (slice(ty * SUB, (ty + 1) * SUB),
                              slice(tx * LANE, (tx + 1) * LANE))
                        sv = serve[sl]
                        if not sv.any():
                            continue
                        key = (ci, ty, tx)
                        a["tile_ids"].add((key, tree))
                        sr, ch = srow[sl][sv], chunk[sl][sv]
                        a["probes"] += 1
                        rowc = len(np.unique(sr // 2 * n_chunks + ch))
                        blkc = len(np.unique(sr // 16 * n_chunks + ch))
                        a["srow_cells"].append(rowc)
                        a["blk_cells"].append(blkc)
                        alive = fast_pass_survivors(sr, ch, n_chunks, 3)
                        a["strag3"].append(int(alive.sum()))
                        if alive.any():
                            a["per_probe_blk"].append(len(np.unique(
                                sr[alive] // 16 * n_chunks + ch[alive])))
                        else:
                            a["per_probe_blk"].append(0)
                        ga = g[sl][act[sl]]
                        a["nodes"].append(len(np.unique(ga)))
                        a["node_chunks"].append(
                            len(np.unique(ga // LANE)) if len(ga) else 0)

    print("\nlvl | probes | srow-cells p50/p90/max | blk-cells p50/p90 | "
          "strag3 p50/p90 (of 1024) | resid-blk p50/p90 | nodes p50/p90")
    for j in sorted(agg):
        a = agg[j]
        if not a["probes"]:
            continue
        q = lambda v, p: np.percentile(v, p) if len(v) else 0
        print(f"{j:3d} | {a['probes']:6d} | "
              f"{q(a['srow_cells'],50):5.1f}/{q(a['srow_cells'],90):5.1f}/"
              f"{max(a['srow_cells']):4d} | "
              f"{q(a['blk_cells'],50):4.1f}/{q(a['blk_cells'],90):4.1f} | "
              f"{q(a['strag3'],50):5.1f}/{q(a['strag3'],90):6.1f} | "
              f"{q(a['per_probe_blk'],50):4.1f}/{q(a['per_probe_blk'],90):4.1f} | "
              f"{q(a['nodes'],50):5.1f}/{q(a['nodes'],90):6.1f}")


if __name__ == "__main__" and "iters" not in sys.argv:
    main()


def iter_stats(nframes=2):
    """Predicted SWEEP=4 loop economics: per (tile, level) the iteration
    count is max-cells over the 8 probes; serve work is 8*iters (every
    probe serves every iteration, finished probes waste theirs)."""
    crops, model = make_crops(nframes)
    fine = np.asarray(model.layers[1].flat)
    coarse = np.asarray(model.layers[0].flat)
    n_chunks = W // LANE
    tot_iters = 0
    tot_cells = 0
    tot_inst = 0
    tot_pair_iters = 0
    for ci, crop in enumerate(crops):
        lab0, recs0, _ = walk_layer(crop, coarse,
                                    np.ones((H // R, W // R), bool))
        filt = lab0 == 1
        _, recs1, _ = walk_layer(crop, fine, filt)
        for recs in (recs0, recs1):
            # group by (level): collect per (tile) per probe cell sets
            by_lvl_tile = {}
            for (tree, j, g, act, duy, dux, dvy, dvx) in recs:
                yl, xl = np.mgrid[0:H // R, 0:W // R]
                yf0, xf0 = yl * R, xl * R
                for pi, (dy, dx) in enumerate(((duy, dux), (dvy, dvx))):
                    y, x = yf0 + dy, xf0 + dx
                    oob = (y < 0) | (y >= H) | (x < 0) | (x >= W)
                    serve = act & ~oob
                    yc, xc = np.clip(y, 0, H - 1), np.clip(x, 0, W - 1)
                    srow = yc + APRON_T - 2 * (yl % SUB)
                    cell = (srow // 2) * n_chunks + xc // LANE
                    nty, ntx = (H // R) // SUB, (W // R) // LANE
                    for ty in range(nty):
                        for tx in range(ntx):
                            sl = (slice(ty * SUB, (ty + 1) * SUB),
                                  slice(tx * LANE, (tx + 1) * LANE))
                            sv = serve[sl]
                            if not sv.any():
                                continue
                            key = (j, ty, tx)
                            by_lvl_tile.setdefault(key, {}).setdefault(
                                (tree, pi), set()
                            ).update(np.unique(cell[sl][sv]).tolist())
            for key, probes in by_lvl_tile.items():
                cs = [len(v) for v in probes.values()]
                tot_iters += max(cs)
                tot_cells += sum(cs)
                tot_inst += 1
                # u/v paired serving: union per (tree), max over trees
                pairs = {}
                for (tree, pi), v in probes.items():
                    pairs.setdefault(tree, set()).update(v)
                tot_pair_iters += max(len(v) for v in pairs.values())
    print(f"instances={tot_inst} iters={tot_iters} cells={tot_cells} "
          f"pair_iters={tot_pair_iters}")
    print(f"mean iters/inst={tot_iters/tot_inst:.1f} "
          f"mean cells/inst={tot_cells/tot_inst:.1f} "
          f"serve_slots={8*tot_iters} waste={8*tot_iters-tot_cells} "
          f"pair_slots={8*tot_pair_iters}")


if __name__ == "__main__" and "iters" in sys.argv:
    iter_stats()
