"""CPU-side simulator of the eval kernel's gather economics on the flagship
workload.  Replays the exact per-level traversal in vectorized numpy and
reports, per level: how many (tile, level) steps run, how many lanes the
static fast windows serve, and the blocked-sweep iteration counts of the
exact cleanup under the CURRENT policy and under candidate policies —
letting window/sweep strategies be compared in seconds instead of a
5-minute Mosaic compile each.

Usage:
  JAX_PLATFORMS=cpu python scripts/sim_sweep.py --gen   # once: build crops
  python scripts/sim_sweep.py [--rows 4] [--kc 3]
"""
import argparse
import os
import sys

import numpy as np

CROPS_NPZ = "/tmp/sim_crops.npz"
BENCH_CROPS_NPZ = "/tmp/sim_crops_bench.npz"
MAX_U16 = 65535
SUB, LANE = 8, 128
APRON_T = 16


def gen_crops(bench=False):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from beats3d_tpu.utils import CameraIntrinsics
    from beats3d_tpu.runtime.pipeline import (
        FramePipeline, _preproc_front, _crop_origins, _stencil_crops)
    from scripts.profile_flagship_batch import load_flagship, B
    from scripts.flagship_e2e import scene
    if bench:
        from __graft_entry__ import (
            _synthetic_layered_model, _synthetic_frame)

    intrin = CameraIntrinsics.d415()
    model = (_synthetic_layered_model("/tmp/graft_model") if bench
             else load_flagship())
    pipe = FramePipeline(model, intrin)
    cfg = pipe.cfg
    h, w = intrin.height, intrin.width
    rng = np.random.default_rng(0)
    if bench:
        frames = jnp.asarray(np.stack([np.asarray(_synthetic_frame(intrin))
                                       for _ in range(1)]))
    else:
        frames = jnp.asarray(np.stack(
            [scene(intrin, t, rng)[0] for t in range(B)]))
    plane_mat = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
        np.float32))

    def front(raw):
        depth1, grown, g_info, _ = _preproc_front(
            raw, plane_mat, pipe._pp, pipe._fx, pipe.gauss_kernel,
            pipe._zthr, pipe._gms, cfg)
        oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
        return _stencil_crops(depth1, grown, oys, oxs, cfg, h, w), too_big

    crops, too_big = jax.jit(lambda: jax.vmap(front)(frames))()
    crops = np.asarray(crops).reshape(-1, cfg.crop_h, cfg.crop_w)
    print("too_big any:", bool(np.asarray(too_big).any()))
    path = BENCH_CROPS_NPZ if bench else CROPS_NPZ
    np.savez_compressed(path, crops=crops.astype(np.uint16))
    print("wrote", path, crops.shape)


def load_model_np():
    from scripts.profile_flagship_batch import load_flagship
    model = load_flagship()
    layers = []
    for layer in model.layers:
        layers.append(np.asarray(layer.flat, np.float32))
    specs = tuple((l.filter_model, l.filter_model_class)
                  for l in model.layers)
    return layers, specs


def probe_targets(depth_c, ys, xs, u0, u1, scale):
    """Vectorized floor(scale*u/df) target math (f32, floor, same as kernel)."""
    df = depth_c.astype(np.float32)
    safe = np.where(df == 0, 1.0, df).astype(np.float32)
    dx = np.floor(
        np.float32(scale) * u0.astype(np.float32) / safe).astype(np.int64)
    dy = np.floor(
        np.float32(scale) * u1.astype(np.float32) / safe).astype(np.int64)
    return ys + dy, xs + dx


def run_layer(depth, forest, eligible, r, scale, stats, level_cb):
    """Vectorized level-synchronous traversal of one forest over one crop.
    depth: (H, W) uint16; eligible: (hl, wl) bool; returns (hl, wl) labels."""
    t_, total, els = forest.shape
    d = int(np.log2(total + 1))
    c = (els - 7) // 2
    h, w = depth.shape
    hl, wl = h // r, w // r
    ys = (np.arange(hl) * r)[:, None] * np.ones((1, wl), np.int64)
    xs = (np.arange(wl) * r)[None, :] * np.ones((hl, 1), np.int64)
    ys = ys.astype(np.int64)
    xs = xs.astype(np.int64)
    d_center = depth[::r, ::r]
    elig = eligible & (d_center != 0) & (d_center != MAX_U16)

    def dget(yy, xx):
        oob = (yy < 0) | (yy >= h) | (xx < 0) | (xx >= w)
        yc = np.clip(yy, 0, h - 1)
        xc = np.clip(xx, 0, w - 1)
        v = depth[yc, xc].astype(np.float32)
        return np.where(oob, np.float32(MAX_U16), v)

    pdf_sum = np.zeros((c, hl, wl), np.float32)
    for tree in range(t_):
        g = np.zeros((hl, wl), np.int64)
        active = elig.copy()
        probes_by_level = []
        for lev in range(d):
            lo = (1 << lev) - 1
            nd = forest[tree, lo + np.clip(g, 0, (1 << lev) - 1)]
            df = d_center.astype(np.float32)
            safe = np.where(df == 0, 1.0, df).astype(np.float32)
            zc = df == 0

            def off(comp):
                return np.floor(np.float32(scale) * nd[..., comp] / safe
                                ).astype(np.int64)

            uxp = xs + off(0)
            uyp = ys + off(1)
            vxp = xs + off(2)
            vyp = ys + off(3)
            level_cb(lev, tree, active, uyp, uxp, vyp, vxp)
            f = np.where(zc, np.float32(0),
                         dget(uyp, uxp) - dget(vyp, vxp))
            left = f < nd[..., 4]
            child = np.where(left, nd[..., 5], nd[..., 6])
            is_leaf = np.floor(child) != -1
            hit = active & is_leaf
            pdf = np.where(left[None], nd[..., 7:7 + c].transpose(2, 0, 1),
                           nd[..., 7 + c:7 + 2 * c].transpose(2, 0, 1))
            pdf_sum += np.where(hit[None], pdf, 0)
            g = np.where(left, 2 * g, 2 * g + 1)
            active = active & ~is_leaf
            if not active.any():
                break
            probes_by_level = None
    best_v = np.zeros((hl, wl), np.float32)
    best_c = np.zeros((hl, wl), np.int64)
    for k in range(c):
        better = pdf_sum[k] > best_v
        best_v = np.where(better, pdf_sum[k], best_v)
        best_c = np.where(better, k, best_c)
    return np.where(elig, best_c, MAX_U16)


class TileStats:
    """Accumulates per-(tile, level) fast-window service + sweep metrics.
    Collect probes per (level) for all trees first, then analyze per tile
    (the kernel unions all 2T probes of a level in one gather call)."""

    def __init__(self, h, w, hl, wl, r, rows, kc, nlev):
        self.h, self.w, self.r = h, w, r
        self.hl, self.wl = hl, wl
        self.rows, self.kc = rows, kc
        self.wl_pad = ((wl + LANE - 1) // LANE) * LANE
        self.hl_pad = ((hl + SUB - 1) // SUB) * SUB
        self.nty = self.hl_pad // SUB
        self.ntx = self.wl_pad // LANE
        self.n_chunks_img = (w + LANE - 1) // LANE
        self.max_half = (h + APRON_T - 1) // r
        self.nlev = nlev
        self.level_probes = [[] for _ in range(nlev)]
        # totals[level] = dict of metric -> value
        self.totals = [dict(steps=0, calls=0, cleanups=0, iters=0,
                            iters_perprobe=0, iters_needed=0, lanes=0,
                            unserved=0, needed2=0, nofast=0, nofast2=0)
                       for _ in range(nlev)]

    def add(self, lev, tree, active, uy, ux, vy, vx):
        self.level_probes[lev].append((active, uy, ux))
        self.level_probes[lev].append((active, vy, vx))

    def pad_tile(self, a, fill):
        out = np.full((self.hl_pad, self.wl_pad), fill, a.dtype)
        out[:self.hl, :self.wl] = a
        return out.reshape(self.nty, SUB, self.ntx, LANE
                           ).transpose(0, 2, 1, 3)

    def analyze(self):
        r = self.r
        ii = np.arange(SUB)[:, None] * np.ones((1, LANE), np.int64)
        for lev in range(self.nlev):
            probes = self.level_probes[lev]
            if not probes:
                continue
            tiles = [
                (self.pad_tile(a, False), self.pad_tile(y, 0),
                 self.pad_tile(x, 0)) for (a, y, x) in probes
            ]
            tt = self.totals[lev]
            anyact = np.zeros((self.nty, self.ntx), bool)
            for (a, _, _) in tiles:
                anyact |= a.any(axis=(2, 3))
            tt["steps"] += int(anyact.sum())
            for ty in range(self.nty):
                for tx in range(self.ntx):
                    if not anyact[ty, tx]:
                        continue
                    tt["calls"] += 1
                    over_spans = []
                    all_spans = []
                    for (a, yy, xx) in tiles:
                        act = a[ty, tx]
                        yv, xv = yy[ty, tx], xx[ty, tx]
                        oob = ((yv < 0) | (yv >= self.h)
                               | (xv < 0) | (xv >= self.w))
                        serve = act & ~oob
                        tt["lanes"] += int(serve.sum())
                        if not serve.any():
                            continue
                        y_px = (ty * SUB + ii) * r
                        x_px = tx * LANE + np.arange(LANE)[None, :]
                        x_px = x_px * r
                        yc = np.where(serve, np.clip(yv, 0, self.h - 1),
                                      y_px)
                        xc = np.where(serve, np.clip(xv, 0, self.w - 1),
                                      x_px)
                        chunk = xc // LANE
                        srow = yc + APRON_T - r * ii
                        sb = srow[serve].min()
                        cb = np.clip(chunk[serve].min(), 0,
                                     self.n_chunks_img - self.kc)
                        if r == 2:
                            nh = self.rows // 2
                            half = np.clip(sb // 2, 0, self.max_half - nh)
                            lo_row, hi_row = 2 * half, 2 * half + self.rows - 1
                        else:
                            lo_row = np.clip(sb, 0,
                                             self.max_half - self.rows + 1)
                            hi_row = lo_row + self.rows - 1
                        over = serve & (
                            (srow < lo_row) | (srow > hi_row)
                            | (chunk < cb) | (chunk > cb + self.kc - 1))
                        n_over = int(over.sum())
                        tt["unserved"] += n_over
                        all_spans.append((srow[serve], chunk[serve]))
                        if n_over:
                            over_spans.append(
                                (srow[over], chunk[over]))
                    if all_spans:
                        sa = np.concatenate([s for s, _ in all_spans])
                        ca = np.concatenate([c for _, c in all_spans])
                        tt["nofast"] += len(set(zip(
                            (sa // (SUB * r)).tolist(), ca.tolist())))
                        tt["nofast2"] += len(set(zip(
                            (sa // (2 * SUB * r)).tolist(), ca.tolist())))
                    if over_spans:
                        tt["cleanups"] += 1
                        s_all = np.concatenate([s for s, _ in over_spans])
                        c_all = np.concatenate([c for _, c in over_spans])
                        b_lo, b_hi = (s_all.min() // (SUB * r),
                                      s_all.max() // (SUB * r))
                        c_lo, c_hi = c_all.min(), c_all.max()
                        tt["iters"] += int(
                            (b_hi - b_lo + 1) * (c_hi - c_lo + 1))
                        # candidate policy 1: per-probe rectangles
                        for s, cc in over_spans:
                            tt["iters_perprobe"] += int(
                                (s.max() // (SUB * r) - s.min() // (SUB * r)
                                 + 1) * (cc.max() - cc.min() + 1))
                        # candidate policy 2: only blocks some lane needs
                        need = set(zip((s_all // (SUB * r)).tolist(),
                                       c_all.tolist()))
                        tt["iters_needed"] += len(need)
                        # candidate policy 3: 16-bit row-packed planes — one
                        # block serves 2x the rows
                        tt["needed2"] += len(set(zip(
                            (s_all // (2 * SUB * r)).tolist(),
                            c_all.tolist())))

    def report(self):
        print(f"{'lev':>3} {'steps':>6} {'cleanup':>7} {'iters':>7} "
              f"{'perprobe':>8} {'needed':>7} {'need2':>6} {'nofast':>7} "
              f"{'nofst2':>6} {'lanes':>9} {'unserved':>8}")
        tot = dict(steps=0, cleanups=0, iters=0, iters_perprobe=0,
                   iters_needed=0, needed2=0, nofast=0, nofast2=0, lanes=0,
                   unserved=0)
        for lev, tt in enumerate(self.totals):
            if tt["steps"] == 0:
                continue
            print(f"{lev:>3} {tt['steps']:>6} {tt['cleanups']:>7} "
                  f"{tt['iters']:>7} {tt['iters_perprobe']:>8} "
                  f"{tt['iters_needed']:>7} {tt['needed2']:>6} "
                  f"{tt['nofast']:>7} {tt['nofast2']:>6} {tt['lanes']:>9} "
                  f"{tt['unserved']:>8}")
            for k in tot:
                tot[k] += tt[k]
        print(f"TOT {tot['steps']:>6} {tot['cleanups']:>7} {tot['iters']:>7} "
              f"{tot['iters_perprobe']:>8} {tot['iters_needed']:>7} "
              f"{tot['needed2']:>6} {tot['nofast']:>7} {tot['nofast2']:>6} "
              f"{tot['lanes']:>9} {tot['unserved']:>8}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--rows", type=int, default=2)
    ap.add_argument("--kc", type=int, default=2)
    ap.add_argument("--crops", type=int, default=32)
    ap.add_argument("--bench", action="store_true",
                    help="use the bench.py synthetic adversarial model")
    ap.add_argument("--both", action="store_true",
                    help="collect stats for BOTH layers, not just the fine")
    args = ap.parse_args()
    if args.gen:
        gen_crops(bench=args.bench)
        return

    if args.bench:
        import jax
        jax.config.update("jax_platforms", "cpu")
        from __graft_entry__ import _synthetic_layered_model
        model = _synthetic_layered_model("/tmp/graft_model")
        layers = [np.asarray(l.flat, np.float32) for l in model.layers]
        specs = tuple((l.filter_model, l.filter_model_class)
                      for l in model.layers)
        crops = np.load(BENCH_CROPS_NPZ)["crops"][: args.crops]
    else:
        layers, specs = load_model_np()
        crops = np.load(CROPS_NPZ)["crops"][: args.crops]
    r = 2
    scale = 1.0
    h, w = crops.shape[1:]
    hl, wl = h // r, w // r
    coarse, fine = layers
    nlev_f = int(np.log2(fine.shape[1] + 1))

    acc = None
    for ci, crop in enumerate(crops):
        stats = TileStats(h, w, hl, wl, r, args.rows, args.kc, nlev_f)
        base_elig = np.ones((hl, wl), bool)
        lab0 = run_layer(crop, coarse, base_elig, r, scale,
                         None, stats.add if args.both else lambda *a: None)
        if args.both:
            stats.analyze()
            for lp in stats.level_probes:
                lp.clear()
        elig1 = lab0 == specs[1][1]
        run_layer(crop, fine, elig1, r, scale, None, stats.add)
        stats.analyze()
        if acc is None:
            acc = stats
        else:
            for lev in range(nlev_f):
                for k, v in stats.totals[lev].items():
                    acc.totals[lev][k] += v
    acc.report()


if __name__ == "__main__":
    main()
