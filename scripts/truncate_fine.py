"""Model-side serving lever: truncate the fine forest to depth Dt with an
EXACT leaf-pdf refit, and measure the accuracy/throughput tradeoff.

The roofline verdict (ROADMAP) says the eval kernel's cost is dominated by
per-(tile, level) serial trips — levels, not arithmetic.  Depth is therefore
a direct serving lever: a D=12 fine layer runs ~25% fewer trip levels than
D=16.  Rather than retrain, truncate the trained flagship fine forest at
depth Dt and REFIT the new terminal pdfs from the training set:

  pdf(new leaf g*2+side at level Dt-1) =
      normalized label histogram of the training pixels that reach node g
      at level Dt-1 and branch to `side`, with the trainer's 99.9% cutoff
      one-hot rule applied (train/trainer.py finalize; reference
      tree_train.cu termination semantics).

This reproduces EXACTLY what the trainer would have written had it stopped
at depth Dt with the same split structure above (its terminal pdfs are the
same label histograms), so the truncated model is a true "trained at Dt"
operating point, not an approximation.

Self-validation: at level Dt-1 the ORIGINAL tree also has terminal leaves
(cutoff + final-level ones).  The same histogram walk must reproduce their
STORED pdfs bit-near-exactly (they were computed from the same training
pixels by the real trainer); `pdf_check` reports the max abs deviation over
non-double-leaf terminals as proof the refit walk matches the training
walk.  (Double leaves — no-gain nodes that write the PARENT pdf to both
sides, trainer.py:643-649 — are excluded: their stored pdf is the parent
histogram, deliberately not the side histogram.)

Usage (chip, after the flagship dataset exists at /tmp/flagship_v2_ds):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/truncate_fine.py \
      [Dt ...]                # default 15 14 13 12
Writes models/flagship/TRUNC_SWEEP.json and truncated model dirs under
/tmp/trunc_fine_D{Dt}/ for the fps A/B (ab_flagship_knobs-style worker).
"""
import gzip
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP = os.environ.get("B3D_V2_OUT", "models/flagship")
DS = os.environ.get("B3D_V2_DS", "/tmp/flagship_v2_ds")

from beats3d_tpu.train.trainer import CUTOFF_THRESH as CUTOFF  # noqa: E402


def load_fine_flat():
    with gzip.open(os.path.join(FLAGSHIP, "m1.npy.gz"), "rb") as f:
        return np.load(f)


def walk_ids(depth, tables, dt):
    """Per-lane (new-leaf id, active) after walking levels 0..dt-1.

    Mirrors ops/forest_eval.forest_pdf_sum's traversal exactly (same
    feature, floor rounding, lr semantics); returns for each (pixel, tree)
    lane the would-be child id 2g+side at level dt-1 and whether the lane
    was still descending there (those are the lanes a depth-dt truncation
    turns into new-leaf samples).
    """
    import jax
    import jax.numpy as jnp
    from beats3d_tpu.ops.forest_eval import depth_difference_feature

    n, h, w = depth.shape
    num_trees = tables[0][0].shape[0]
    yl = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xl = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    yd = yl[None, :, :, None]
    xd = xl[None, :, :, None]
    d_center = depth
    d_center_t = d_center[..., None]

    lane_shape = (n, h, w, num_trees)
    g = jnp.zeros(lane_shape, dtype=jnp.int32)
    done = jnp.zeros(lane_shape, dtype=jnp.bool_)
    tree_base = jnp.arange(num_trees, dtype=jnp.int32)

    new_leaf = jnp.zeros(lane_shape, dtype=jnp.int32)
    active = jnp.zeros(lane_shape, dtype=jnp.bool_)
    term_leaf = jnp.zeros(lane_shape, dtype=jnp.int32)  # original terminal
    term_here = jnp.zeros(lane_shape, dtype=jnp.bool_)  # ... at level dt-1

    for j in range(dt):
        uv, thresh, lr_next, pdf = tables[j]
        g_level = 1 << j
        gidx = tree_base * g_level + g
        uv_g = jnp.take(uv.reshape(num_trees * g_level, 4), gidx, axis=0)
        th_g = jnp.take(thresh.reshape(num_trees * g_level), gidx, axis=0)
        f = depth_difference_feature(
            depth, yd, xd, d_center_t, uv_g[..., 0:2], uv_g[..., 2:4], 1.0)
        left = f < th_g
        side = jnp.where(left, 0, 1).astype(jnp.int32)
        lr_g = jnp.take(
            lr_next.reshape(num_trees * g_level * 2), gidx * 2 + side,
            axis=0)
        descend = lr_g == -1
        if j == dt - 1:
            new_leaf = 2 * g + side
            active = (~done) & descend
            term_leaf = 2 * g + side
            term_here = (~done) & (~descend)
        g = jnp.where((~done) & descend, 2 * g + side, g)
        done = done | (~done) & (~descend)

    # NOTE: the returned masks carry NO pixel-eligibility filter — the
    # caller must apply the trainer's (labels > 0, trainer.py:479-480).
    return new_leaf, active, term_leaf, term_here


def refit_counts(flat, dt, train_depth, train_labels, chunk=2):
    """Histogram training labels into the depth-dt new leaves (and, for
    validation, into the original level-(dt-1) terminal leaves).

    Histograms accumulate ON DEVICE (segment_sum per tree) so only the
    (T, 2**dt, C) count arrays cross the tunnel per chunk — the per-lane
    id/mask arrays (~40 MB/chunk) never leave the chip."""
    import jax
    import jax.numpy as jnp
    from beats3d_tpu.models.forest import PackedForest

    t, _, els = flat.shape
    c = (els - 7) // 2
    packed = PackedForest.from_flat(flat)
    tables = packed.tables()[:dt]
    nleaf = 1 << dt

    @jax.jit
    def step(d, lab):
        ids, act, tids, there = walk_ids(d, tables, dt)
        lab4 = jnp.broadcast_to(lab[..., None], ids.shape)
        # the trainer trains on LABELED pixels only (nodes[lab > 0] = 0,
        # trainer.py:479-480) — the refit must histogram the same set
        labeled = lab4 > 0

        def hist(idz, msk):
            key = idz * c + lab4
            w = (msk & labeled).astype(jnp.float32)
            return jnp.stack([
                jax.ops.segment_sum(
                    w[..., tt].ravel(), key[..., tt].ravel(),
                    num_segments=nleaf * c)
                for tt in range(t)
            ])
        return hist(ids, act), hist(tids, there)

    counts = np.zeros((t, nleaf, c), np.int64)
    vcounts = np.zeros((t, nleaf, c), np.int64)
    for lo in range(0, train_depth.shape[0], chunk):
        d = jnp.asarray(train_depth[lo : lo + chunk])
        lab = jnp.asarray(
            train_labels[lo : lo + chunk].astype(np.int32))
        a, b = step(d, lab)
        counts += np.asarray(a).astype(np.int64).reshape(t, nleaf, c)
        vcounts += np.asarray(b).astype(np.int64).reshape(t, nleaf, c)
    return counts, vcounts


def pdf_check(flat, dt, vcounts):
    """Validate the refit walk against the REAL trainer's output: compare
    the refit histograms to the stored pdfs of the original terminal
    leaves at level dt-1.  Mixed (frac) leaves must match to float32
    rounding; cutoff one-hot leaves must match to (1 - CUTOFF) (the
    trainer rounded a >=99.9% histogram up to 1.0).  Double leaves are
    excluded — their stored pdf is the PARENT histogram by design
    (trainer.py no-gain branch).

    Returns a dict: worst mixed/cutoff deviation, leaves checked/mixed,
    plus the count of leaves deviating > 0.01 and the total pixel mass in
    them (distinguishes rare boundary-flip strays — a handful of pixels
    landing one node over when refit and training run on different
    platforms' float rounding — from systematic walk divergence)."""
    t, _, els = flat.shape
    c = (els - 7) // 2
    base = (1 << (dt - 1)) - 1
    lvl = flat[:, base : base + (1 << (dt - 1))]
    out = {"dev_mixed": 0.0, "dev_cutoff": 0.0, "checked": 0, "mixed": 0,
           "bad_leaves": 0, "bad_pixels": 0, "pixels": 0}
    for tt in range(t):
        lr = np.floor(lvl[tt, :, 5:7]).astype(np.int32)
        lpdf = lvl[tt, :, 7 : 7 + c]
        rpdf = lvl[tt, :, 7 + c : 7 + 2 * c]
        dbl = (lr[:, 0] != -1) & (lr[:, 1] != -1) & (
            np.abs(lpdf - rpdf).max(axis=1) == 0.0)
        for side, pdf in ((0, lpdf), (1, rpdf)):
            term = (lr[:, side] != -1) & ~dbl
            for gg in np.nonzero(term)[0]:
                cnt = vcounts[tt, 2 * gg + side]
                s = cnt.sum()
                if s == 0:
                    continue
                dev = float(np.abs(cnt / s - pdf[gg]).max())
                out["checked"] += 1
                out["pixels"] += int(s)
                if dev > 0.01:
                    out["bad_leaves"] += 1
                    out["bad_pixels"] += int(s)
                if pdf[gg].max() >= 1.0:
                    out["dev_cutoff"] = max(out["dev_cutoff"], dev)
                else:
                    out["dev_mixed"] = max(out["dev_mixed"], dev)
                    out["mixed"] += 1
    return out


def truncate(flat, dt, counts):
    """Depth-dt flat array with refit terminal pdfs (trainer semantics)."""
    t, _, els = flat.shape
    c = (els - 7) // 2
    total = (1 << dt) - 1
    out = flat[:, :total].copy()
    base = (1 << (dt - 1)) - 1
    empty = 0
    for tt in range(t):
        lvl = out[tt, base:total]
        lr = np.floor(lvl[:, 5:7]).astype(np.int32)
        for gg in np.nonzero((lr[:, 0] == -1) | (lr[:, 1] == -1))[0]:
            for side in (0, 1):
                if lr[gg, side] != -1:
                    continue
                cnt = counts[tt, 2 * gg + side].astype(np.float64)
                s = cnt.sum()
                pdf0 = 7 + side * c
                lvl[gg, 5 + side] = 0.0
                lvl[gg, pdf0 : pdf0 + c] = 0.0
                if s == 0:
                    empty += 1  # no training pixel: emit uniform-zero pdf
                    continue
                frac = cnt / s
                cut = np.nonzero(frac >= CUTOFF)[0]
                if cut.size:
                    lvl[gg, pdf0 + cut[0]] = 1.0
                else:
                    lvl[gg, pdf0 : pdf0 + c] = frac.astype(np.float32)
    return out, empty


def heldout_acc(model_dir, test_depth, test_labels):
    """Layered held-out pct_match (flagship_v2.py step-5 semantics)."""
    import jax.numpy as jnp
    from beats3d_tpu.models import LayeredDecisionForest
    from beats3d_tpu.models.layered import run_layered

    model = LayeredDecisionForest.load(
        os.path.join(model_dir, "model_cfg.json"), labels_reduce=2)
    fs = tuple((l.filter_model, l.filter_model_class) for l in model.layers)
    outs = []
    for lo in range(0, test_depth.shape[0], 2):
        d = jnp.asarray(test_depth[lo : lo + 2])
        o = run_layered(
            d, model.layer_tables(), model.conditions, filter_specs=fs,
            labels_reduce=1, scale_factor=jnp.float32(1.0), backend="xla")
        outs.append(np.asarray(o))
    lab = np.concatenate(outs)
    labeled = test_labels > 0
    return float((lab[labeled] == test_labels[labeled]).mean())


def main():
    # phases so the CPU-heavy refit can overlap a chip-holding run:
    #   --refit-only : walk + histogram + write truncated model dirs
    #                  (B3D_TRUNC_CPU=1 forces the CPU backend)
    #   --acc-only   : held-out accuracy for already-written model dirs
    # default: both.
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    refit_only = "--refit-only" in sys.argv
    acc_only = "--acc-only" in sys.argv
    if os.environ.get("B3D_TRUNC_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from beats3d_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from beats3d_tpu.data import DatasetConfig

    dts = [int(a) for a in args] or [15, 14, 13, 12]
    # ordered=True: the SAME split every process — test is the datagen's
    # final 16 frames (the disjoint-rng unseen-pose stream), train the
    # 120 the flagship run trained on (see flagship_v2.py)
    train_data, test_data = DatasetConfig.multiple(DS, [
        (120, 4, "train"), (16, None, "test")], ordered=True)
    test_depth = test_data.get_depth_block(0)
    test_labels = test_data.get_labels_block(0)

    flat = load_fine_flat()
    out = os.path.join(FLAGSHIP, "TRUNC_SWEEP.json")
    if acc_only and os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    else:
        results = {"baseline_depth": int(np.log2(flat.shape[1] + 1)),
                   "sweep": []}

    if not acc_only:
        train_depth = np.concatenate([
            train_data.get_depth_block(i)
            for i in range(train_data.num_image_blocks)])
        train_labels = np.concatenate([
            train_data.get_labels_block(i)
            for i in range(train_data.num_image_blocks)]).astype(np.int64)
        for dt in dts:
            t0 = time.time()
            counts, vcounts = refit_counts(
                flat, dt, train_depth, train_labels)
            chk = pdf_check(flat, dt, vcounts)
            trunc, empty = truncate(flat, dt, counts)
            mdir = f"/tmp/trunc_fine_D{dt}"
            os.makedirs(mdir, exist_ok=True)
            shutil.copy(os.path.join(FLAGSHIP, "m0.npy"),
                        os.path.join(mdir, "m0.npy"))
            shutil.copy(os.path.join(FLAGSHIP, "model_cfg.json"),
                        os.path.join(mdir, "model_cfg.json"))
            np.save(os.path.join(mdir, "m1.npy"), trunc)
            row = {
                "depth": dt,
                "refit_check": chk,
                "empty_leaves": empty, "model_dir": mdir,
                "refit_s": round(time.time() - t0, 1),
                "refit_platform": (
                    "cpu" if os.environ.get("B3D_TRUNC_CPU") else "tpu"),
            }
            results["sweep"].append(row)
            print(f"[trunc] {row}", flush=True)

    if not refit_only:
        base_acc = heldout_acc(_stage_base(), test_depth, test_labels)
        results["baseline_acc"] = round(base_acc, 4)
        print(f"[trunc] baseline D=16 held-out acc {base_acc:.4f}",
              flush=True)
        for row in results["sweep"]:
            acc = heldout_acc(row["model_dir"], test_depth, test_labels)
            row["acc"] = round(acc, 4)
            row["acc_delta"] = round(acc - base_acc, 4)
            print(f"[trunc] D={row['depth']} acc={acc:.4f} "
                  f"(delta {acc - base_acc:+.4f})", flush=True)

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[trunc] wrote {out}", flush=True)


def _stage_base():
    tmp = "/tmp/trunc_base_model"
    os.makedirs(tmp, exist_ok=True)
    for f in ("m0.npy", "model_cfg.json"):
        shutil.copy(os.path.join(FLAGSHIP, f), os.path.join(tmp, f))
    with gzip.open(os.path.join(FLAGSHIP, "m1.npy.gz"), "rb") as src, \
            open(os.path.join(tmp, "m1.npy"), "wb") as dst:
        shutil.copyfileobj(src, dst)
    return tmp


if __name__ == "__main__":
    main()
