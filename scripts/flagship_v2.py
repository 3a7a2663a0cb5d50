"""Flagship v2: articulated hands at streaming scale (VERDICT r2 item 5).

Round 2's flagship was trained on 28 images of rigid circle-geometry hands —
trivially separable.  This script makes the ML proof real:

* an ARTICULATED synthetic hand — palm disk + 5 three-segment jointed
  fingers, built as a camera-space point cloud and rendered through the
  framework's own splat z-buffer renderer (ops/render.py: splat_points +
  fill_holes, the datagen path) — with per-frame random pose: global
  rotation, scale, position, per-finger spread and per-joint flex (tucked
  fingers occlude the palm; the z-buffer resolves it);
* hundreds of 848x480 frames through the full datagen path
  (data/datagen.LiveDataConvert: color-EM labeling, plane fit, augmentation,
  smoothing — reference src/live_data_convert.py semantics);
* coarse D=8 + fine D=16 forests trained with --streaming FORCED
  (zlib-compressed depth/label blocks + CompressedBlocksDynamic node state —
  reference compressed_blocks.py economy) and host-RAM numbers recorded;
* held-out pct_match on UNSEEN POSES (disjoint rng stream), goldens +
  RESULTS.json refreshed.

Reference operating point being matched: skin-paint-labeled articulated hands,
/root/reference/src/live_data_convert.py + datagen/libhand, readme.md:30-47;
training flow /root/reference/src/train_model.py:33-148.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/flagship_v2.py [N_train] [N_test]
"""

import json
import os
import resource
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "models/flagship"
DS = "/tmp/flagship_v2_ds"
FINE_DEPTH = 16
COARSE_DEPTH = 8
TREES = 4
PROPOSALS = 128
PROPOSALS_BLOCK = 64
IMAGES_PER_BLOCK = 4

FINGER_COLORS = [
    (220, 40, 40), (40, 220, 40), (40, 40, 220),
    (220, 220, 40), (220, 40, 220),
]
PALM_COLOR = (210, 160, 120)


def _rot2(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s], [s, c]], np.float32)


def hand_cloud(rng, mirror=False):
    """One articulated hand as (P, 3) float32 points (hand-local mm, y up
    toward fingers, z = height above the table) + (P, 3) uint8 colors.

    Palm: filled disk with a shallow dome.  Fingers: 3-segment capsule
    chains; each joint flexes toward the palm plane (z drops and the segment
    forshortens in-plane), so strongly flexed fingers fold OVER the palm and
    the splat z-buffer occludes palm points underneath — real articulated
    occlusion, not paint.
    """
    scale = rng.uniform(0.82, 1.25)
    palm_r = 95.0 * scale
    pts, cols = [], []

    # palm: dense disk (upper surface), slight dome
    n_p = 5200
    rr = palm_r * np.sqrt(rng.uniform(0, 1, n_p))
    th = rng.uniform(0, 2 * np.pi, n_p)
    px = rr * np.cos(th)
    py = rr * np.sin(th) * rng.uniform(0.88, 1.0)  # slightly oval
    pz = 14.0 * scale * np.cos(np.clip(rr / palm_r, 0, 1) * np.pi / 2)
    pts.append(np.stack([px, py, pz], 1))
    cols.append(np.tile(np.array(PALM_COLOR, np.uint8), (n_p, 1)))

    # forearm stub below the palm (labeled as palm—same part)
    n_a = 2200
    ax = rng.uniform(-0.55, 0.55, n_a) * palm_r
    ay = -palm_r - rng.uniform(0, 1, n_a) * 150.0 * scale
    az = np.full(n_a, 8.0 * scale)
    pts.append(np.stack([ax, ay, az], 1).astype(np.float32))
    cols.append(np.tile(np.array(PALM_COLOR, np.uint8), (n_a, 1)))

    # fingers: 3-segment chains from the palm rim
    for k in range(5):
        base_ang = np.deg2rad(180.0 - (30.0 + 30.0 * k))  # spread across top
        base_ang += rng.uniform(-0.09, 0.09)
        if mirror:
            base_ang = np.pi - base_ang
        base = np.array(
            [palm_r * np.cos(base_ang) * 0.95,
             palm_r * np.sin(base_ang) * 0.95, 12.0 * scale], np.float32
        )
        seg_len = np.array([52.0, 36.0, 26.0]) * scale * (
            1.0 + 0.22 * np.sin(np.pi * k / 4)
        )
        seg_rad = np.array([13.5, 11.5, 9.5]) * scale
        # joint flex: 0 = flat, up to ~100 deg folds over the palm
        flex = rng.uniform(0.0, 1.0)
        j_ang = np.deg2rad(
            np.array([
                rng.uniform(-8, 20) + 62 * flex,
                rng.uniform(0, 16) + 46 * flex,
                rng.uniform(0, 10) + 28 * flex,
            ])
        )
        # in-plane direction: away from the palm centre
        dir2 = np.array([np.cos(base_ang), np.sin(base_ang)], np.float32)
        pos = base.copy()
        pitch = 0.0  # cumulative flex out of the palm plane
        for s in range(3):
            pitch += j_ang[s]
            d3 = np.array(
                [dir2[0] * np.cos(pitch), dir2[1] * np.cos(pitch),
                 np.sin(pitch)], np.float32
            )  # z up at first, folding over as pitch grows past 90
            # flexing folds DOWN toward/over the palm: z component rises
            # then the segment tips toward the palm; model fold-over by
            # letting pitch > 90 deg reverse in-plane travel
            n_s = int(130 * seg_len[s] / 40.0)
            t = rng.uniform(0, 1, n_s)
            ring = rng.uniform(0, np.pi, n_s)  # upper half circumference
            off_axis = np.stack([-dir2[1], dir2[0], np.zeros_like(dir2[0])])
            p = (
                pos[None, :]
                + t[:, None] * d3[None, :] * seg_len[s]
                + np.cos(ring)[:, None] * off_axis[None, :] * seg_rad[s]
            )
            zz = p[:, 2] + np.sin(ring) * seg_rad[s] * 0.8 + seg_rad[s] * 0.4
            pts.append(
                np.stack([p[:, 0], p[:, 1], zz], 1).astype(np.float32)
            )
            cols.append(
                np.tile(np.array(FINGER_COLORS[k], np.uint8), (n_s, 1))
            )
            pos = pos + d3 * seg_len[s]

    return np.concatenate(pts).astype(np.float32), np.concatenate(cols)


def scene_v2(intrin, rng):
    """One full-res articulated-hand frame: tilted table + one right hand in
    random pose.  Returns (depth uint16, color uint8 HxWx3)."""
    import jax.numpy as jnp
    from beats3d_tpu.ops.render import splat_points, fill_holes

    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n = np.array([0.02, -0.04, 1.0])
    n /= np.linalg.norm(n)
    table_z = (
        2600.0 - n[0] * (xx - intrin.ppx) * 8 - n[1] * (yy - intrin.ppy) * 8
    ) / n[2]

    local, cols = hand_cloud(rng)
    # global pose: in-plane rotation + position + height above the table
    rot = _rot2(rng.uniform(-0.6, 0.6))
    xy = local[:, :2] @ rot.T
    cx = rng.uniform(0.28, 0.72) * w
    cy = rng.uniform(0.38, 0.72) * h
    height = rng.uniform(260.0, 420.0)

    # camera-space: pixel-projected table depth at the hand centre anchors z
    zc = table_z[int(cy), int(cx)]
    # hand-local mm -> camera mm (the scene is ~2.6 m away; RealSense scale
    # is 0.1 mm units, consistent with the table function above: it is in
    # DEPTH UNITS, so convert hand mm -> units by x8 like the table slope)
    X = (cx - intrin.ppx) * zc / intrin.fx + xy[:, 0] * 8.0 / 8.0
    Y = (cy - intrin.ppy) * zc / intrin.fy + xy[:, 1] * 8.0 / 8.0
    Z = zc - height - local[:, 2]

    # to the splat renderer's structured-cloud format
    pts4 = np.zeros((local.shape[0], 4), np.float32)
    pts4[:, 0] = X * intrin.fx / intrin.fx
    pts4[:, 1] = Y
    pts4[:, 2] = Z
    pts4[:, 3] = 1.0
    side = int(np.ceil(np.sqrt(pts4.shape[0])))
    pad = side * side - pts4.shape[0]
    pts_img = np.pad(pts4, ((0, pad), (0, 0))).reshape(side, side, 4)
    cols_img = np.pad(cols, ((0, pad), (0, 0))).reshape(side, side, 3)

    d_hand, c_hand = splat_points(
        jnp.asarray(pts_img), jnp.asarray(cols_img),
        jnp.asarray([intrin.ppx, intrin.ppy], np.float32),
        jnp.float32(intrin.fx),
    )
    d_hand, c_hand = fill_holes(d_hand, c_hand)
    d_hand, c_hand = fill_holes(d_hand, c_hand)
    d_hand = np.asarray(d_hand)[:h, :w]
    c_hand = np.asarray(c_hand)[:h, :w]

    depth = table_z.astype(np.uint16)
    color = np.zeros((h, w, 3), np.uint8)
    on = (d_hand > 0) & (d_hand < depth)
    depth[on] = d_hand[on]
    color[on] = c_hand[on]
    return depth, color


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    import jax
    import jax.numpy as jnp

    from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
    enable_compilation_cache()

    from beats3d_tpu.data import DatasetConfig
    from beats3d_tpu.data.blocks import CompressedDataset
    from beats3d_tpu.data.dataset import ArrayDataset
    from beats3d_tpu.data.datagen import DatagenConfig, LiveDataConvert
    from beats3d_tpu.models import LayeredDecisionForest
    from beats3d_tpu.train import train_forest

    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n_test = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_total = n_train + n_test

    intrin = CameraIntrinsics.d415()
    os.makedirs(OUT, exist_ok=True)

    # ---- 1. datagen: articulated hands, train/test from DISJOINT rng ----
    t0 = time.time()
    if os.path.exists(DS):
        shutil.rmtree(DS)
    cfg = DatagenConfig(
        num_colors=6, color_em_tries=6, color_em_iterations=24,
        plane_candidates=8192, plane_z_threshold=40.0,
        scale_variance=0.04, gaussian_noise=1.5,
        max_images=n_total,
    )
    conv = LiveDataConvert(DS, intrin, cfg, rng=np.random.default_rng(3))
    rng_train = np.random.default_rng(1001)
    rng_test = np.random.default_rng(9901)  # unseen poses: disjoint stream
    for t in range(n_total):
        rng = rng_train if t < n_train else rng_test
        depth, color = scene_v2(intrin, rng)
        conv.process_frame(depth, color, depth_timestamp=t / 90.0,
                           color_timestamp=t / 90.0 + 0.002)
        if (t + 1) % 20 == 0:
            print(f"[datagen] {t + 1}/{n_total} frames "
                  f"({time.time() - t0:.0f}s)", flush=True)
    ds_cfg = conv.finish()
    print(f"[datagen] {ds_cfg['num_images']} full-res articulated frames in "
          f"{time.time() - t0:.1f}s", flush=True)

    train_data, test_data = DatasetConfig.multiple(DS, [
        (n_train, IMAGES_PER_BLOCK, "train"),
        (n_test, None, "test"),
    ])

    # streaming stores: zlib depth/labels; the trainer adds
    # CompressedBlocksDynamic node state internally (streaming=True)
    comp_train = CompressedDataset(train_data)
    comp_stats = {
        "depth_ratio": round(comp_train.depth.compression_ratio, 1),
        "labels_ratio": round(comp_train.labels.compression_ratio, 1),
        "depth_mb": round(comp_train.depth.compressed_bytes / 1e6, 1),
        "labels_mb": round(comp_train.labels.compressed_bytes / 1e6, 1),
        "raw_mb": round(
            (comp_train.depth.raw_bytes + comp_train.labels.raw_bytes) / 1e6,
            1),
    }
    print(f"[stream] dataset compression: {comp_stats}", flush=True)

    # ---- 2. coarse hand/background layer --------------------------------
    def to_coarse(d):
        depth = np.concatenate(
            [d.get_depth_block(i) for i in range(d.num_image_blocks)]
        )
        labels = np.concatenate(
            [d.get_labels_block(i) for i in range(d.num_image_blocks)]
        )
        return ArrayDataset(
            depth, (labels > 0).astype(np.uint16), 2,
            images_per_block=min(IMAGES_PER_BLOCK, depth.shape[0]),
        )

    t0 = time.time()
    coarse = train_forest(
        CompressedDataset(to_coarse(train_data)), to_coarse(test_data),
        num_random_features=PROPOSALS, proposals_per_block=PROPOSALS_BLOCK,
        images_per_block=IMAGES_PER_BLOCK, max_tree_depth=COARSE_DEPTH,
        trees_in_forest=TREES, trees_to_try=TREES,
        rng=np.random.default_rng(7), streaming=True,
    )
    t_coarse = time.time() - t0
    print(f"[coarse] D={COARSE_DEPTH} T={TREES} pct_match="
          f"{coarse.pct_match:.4f} in {t_coarse:.1f}s  rss={rss_gb():.2f}G",
          flush=True)

    # ---- 3. fine 6-class layer at flagship depth, streaming -------------
    t0 = time.time()
    fine = train_forest(
        comp_train, test_data,
        num_random_features=PROPOSALS, proposals_per_block=PROPOSALS_BLOCK,
        images_per_block=IMAGES_PER_BLOCK, max_tree_depth=FINE_DEPTH,
        trees_in_forest=TREES, trees_to_try=TREES,
        rng=np.random.default_rng(13), streaming=True,
    )
    t_fine = time.time() - t0
    print(f"[fine] D={FINE_DEPTH} T={TREES} pct_match={fine.pct_match:.4f} "
          f"in {t_fine:.1f}s  rss={rss_gb():.2f}G", flush=True)

    # ---- 4. assemble layered model (reference artifact format) ----------
    np.save(os.path.join(OUT, "m0.npy"), coarse.data)
    np.save(os.path.join(OUT, "m1.npy"), fine.data)
    layered_cfg = {
        "layers": [
            {"model": "m0.npy"},
            {"model": "m1.npy", "filter_model": 0, "filter_model_class": 1},
        ],
        "conditions": [[1, 1]] + [[0, i + 1] for i in range(6)],
        "label_colors": [
            [int(v) for v in ds_cfg["id_to_color"][str(i + 1)]]
            for i in range(6)
        ],
    }
    with open(os.path.join(OUT, "model_cfg.json"), "w") as f:
        json.dump(layered_cfg, f, indent=1)
    model = LayeredDecisionForest.load(
        os.path.join(OUT, "model_cfg.json"), labels_reduce=2
    )

    # ---- 5. held-out eval on unseen poses + goldens ----------------------
    from beats3d_tpu.models.layered import run_layered

    test_depth = test_data.get_depth_block(0)
    test_labels = test_data.get_labels_block(0)
    fs = tuple((l.filter_model, l.filter_model_class) for l in model.layers)

    lab_x = np.asarray(run_layered(
        jnp.asarray(test_depth), model.layer_tables(), model.conditions,
        filter_specs=fs, labels_reduce=1, scale_factor=jnp.float32(1.0),
        backend="xla",
    ))
    lab_p = np.asarray(run_layered(
        jnp.asarray(test_depth), model.layer_tables_pallas(),
        model.conditions, filter_specs=fs, labels_reduce=1,
        scale_factor=jnp.float32(1.0), backend="pallas",
        metas=model.layer_metas(),
        conditions_packed=model.conditions_packed(),
        num_cond=int(np.asarray(model.conditions_np).shape[0]),
    ))
    mism = int((lab_x != lab_p).sum())
    labeled = test_labels > 0
    acc = float((lab_p[labeled] == test_labels[labeled]).mean())
    print(f"[layered] pallas==xla mismatches: {mism}; held-out (unseen "
          f"poses) pct_match: {acc:.4f}", flush=True)

    np.savez_compressed(
        os.path.join(OUT, "golden_eval.npz"),
        depth=test_depth[:2], labels=lab_p[:2],
    )
    # compress m1 for the repo (bench.load_flagship expects m1.npy.gz)
    import gzip
    with open(os.path.join(OUT, "m1.npy"), "rb") as src, gzip.open(
            os.path.join(OUT, "m1.npy.gz"), "wb") as dst:
        shutil.copyfileobj(src, dst)
    os.remove(os.path.join(OUT, "m1.npy"))

    summary = {
        "dataset": {
            "images": int(ds_cfg["num_images"]),
            "resolution": [848, 480],
            "generator": "articulated 3-segment-finger hand, random pose "
                         "(scripts/flagship_v2.py), splat-rendered "
                         "(ops/render.py)",
            "held_out": "unseen poses (disjoint rng stream)",
        },
        "coarse": {"depth": COARSE_DEPTH, "trees": TREES,
                   "pct_match": round(coarse.pct_match, 4),
                   "train_seconds": round(t_coarse, 1)},
        "fine": {"depth": FINE_DEPTH, "trees": TREES,
                 "pct_match": round(fine.pct_match, 4),
                 "train_seconds": round(t_fine, 1)},
        "layered_pct_match_unseen": round(acc, 4),
        "pallas_xla_mismatches": mism,
        "streaming": dict(comp_stats, forced=True,
                          node_state="CompressedBlocksDynamic"),
        "max_rss_gb": round(rss_gb(), 2),
    }
    with open(os.path.join(OUT, "RESULTS.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
