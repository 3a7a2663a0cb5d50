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

OUT = os.environ.get("B3D_V2_OUT", "models/flagship")
DS = os.environ.get("B3D_V2_DS", "/tmp/flagship_v2_ds")
FINE_DEPTH = 16
COARSE_DEPTH = 8
TREES = 4
PROPOSALS = 128
PROPOSALS_BLOCK = 64
IMAGES_PER_BLOCK = 4

from beats3d_tpu.data.synth import (  # noqa: E402
    FINGER_COLORS, PALM_COLOR, articulated_scene)


def scene_v2(intrin, rng):
    """One full-res articulated-hand frame (training generator: single
    right hand, random pose) — see beats3d_tpu/data/synth.py.

    B3D_V2_DETAIL / B3D_V2_NOISE (floats) raise datagen realism one notch
    (VERDICT r3 #9): surface relief on the hand (knuckle ridges, palm
    creases) and D415-style sensor degradation (z^2 noise, disparity
    quantization, edge dropout, speckle) — see synth.apply_sensor_noise."""
    return articulated_scene(
        intrin, rng, two_hands=False,
        detail=float(os.environ.get("B3D_V2_DETAIL", "0")),
        noise_scale=float(os.environ.get("B3D_V2_NOISE", "0")),
        rigged=bool(int(os.environ.get("B3D_V2_RIGGED", "0"))),
    )


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
    reuse = os.environ.get("B3D_V2_REUSE") and os.path.exists(
        os.path.join(DS, "config.json"))
    if reuse:
        # deterministic rng streams: an existing dataset is identical to
        # what this run would regenerate — skip straight to training
        with open(os.path.join(DS, "config.json")) as f:
            ds_cfg = json.load(f)
        assert ds_cfg["num_images"] == n_total, "dataset size mismatch"
        print(f"[datagen] reusing {DS} ({n_total} frames)", flush=True)
    else:
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
        rng_test = np.random.default_rng(9901)  # unseen poses: disjoint rng
        for t in range(n_total):
            rng = rng_train if t < n_train else rng_test
            depth, color = scene_v2(intrin, rng)
            conv.process_frame(depth, color, depth_timestamp=t / 90.0,
                               color_timestamp=t / 90.0 + 0.002)
            if (t + 1) % 20 == 0:
                print(f"[datagen] {t + 1}/{n_total} frames "
                      f"({time.time() - t0:.0f}s)", flush=True)
        ds_cfg = conv.finish()
        print(f"[datagen] {ds_cfg['num_images']} full-res articulated "
              f"frames in {time.time() - t0:.1f}s", flush=True)

    # ordered split: datagen wrote the disjoint-rng-stream (unseen-pose)
    # frames LAST, so "test" is exactly that set — and the split is
    # reproducible across processes (truncate_fine.py refits against the
    # same 120 training images this run trained on)
    train_data, test_data = DatasetConfig.multiple(DS, [
        (n_train, IMAGES_PER_BLOCK, "train"),
        (n_test, None, "test"),
    ], ordered=True)

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

    # ---- 3. fine 6-class layer at flagship depth ------------------------
    # Host-side the dataset stays zlib-compressed (CompressedDataset);
    # device-side the fine layer runs RESIDENT (decompress-once per tree,
    # ~0.8 GB HBM) rather than shipping blocks per use: on this rig the
    # axon tunnel's client retains upload staging past both syncs and
    # explicit buffer deletes (measured +1.3 GB host RSS per level,
    # ~37 GB/tree -> host OOM; see trainer.py drain/delete mitigations and
    # the training-log rss lines).  True per-use streaming remains the
    # >HBM path on non-tunneled hosts (the coarse layer above trains with
    # it end-to-end) and is forced here with B3D_V2_STREAM_FINE=1.
    t0 = time.time()
    fine = train_forest(
        comp_train, test_data,
        num_random_features=PROPOSALS, proposals_per_block=PROPOSALS_BLOCK,
        images_per_block=IMAGES_PER_BLOCK, max_tree_depth=FINE_DEPTH,
        trees_in_forest=TREES, trees_to_try=TREES,
        rng=np.random.default_rng(13),
        streaming=bool(os.environ.get("B3D_V2_STREAM_FINE")),
        # resumable at tree granularity: this rig's axon RPCs can wedge
        # mid-level (zero IO, threads in futex wait); the watchdog
        # relaunch then resumes after the last completed candidate tree
        # with the rng stream intact (scripts/train_supervised.sh)
        checkpoint_dir=os.path.join(DS, "ckpt_fine"),
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
    # (chunked: one 16-image full-res XLA run at D=16 keeps per-level
    # gathers live -> ~50 G HBM; 2-image chunks bound the live set)
    from beats3d_tpu.models.layered import run_layered

    test_depth = test_data.get_depth_block(0)
    test_labels = test_data.get_labels_block(0)
    fs = tuple((l.filter_model, l.filter_model_class) for l in model.layers)

    def eval_chunked(backend):
        outs = []
        for lo in range(0, test_depth.shape[0], 2):
            d = jnp.asarray(test_depth[lo : lo + 2])
            if backend == "xla":
                o = run_layered(
                    d, model.layer_tables(), model.conditions,
                    filter_specs=fs, labels_reduce=1,
                    scale_factor=jnp.float32(1.0), backend="xla",
                )
            else:
                o = run_layered(
                    d, model.layer_tables_pallas(), model.conditions,
                    filter_specs=fs, labels_reduce=1,
                    scale_factor=jnp.float32(1.0), backend="pallas",
                    metas=model.layer_metas(),
                    conditions_packed=model.conditions_packed(),
                    num_cond=int(np.asarray(model.conditions_np).shape[0]),
                )
            outs.append(np.asarray(o))
        return np.concatenate(outs)

    lab_x = eval_chunked("xla")
    lab_p = eval_chunked("pallas")
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

    old_session = None
    try:
        with open(os.path.join(OUT, "RESULTS.json")) as f:
            old_session = json.load(f).get("bz3d_session")
    except Exception:
        pass

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
        "streaming": dict(
            comp_stats,
            coarse_layer="true per-use streaming (compressed blocks + "
                         "CompressedBlocksDynamic node state)",
            fine_layer=(
                "true per-use streaming (device-side RLE codec, "
                "B3D_V2_STREAM_FINE=1)"
                if os.environ.get("B3D_V2_STREAM_FINE")
                else "resident-from-compressed (axon client retains "
                     "upload staging ~1.3 GB/level; see ROADMAP)"
            ),
        ),
        "max_rss_gb": round(rss_gb(), 2),
    }
    if old_session:
        summary["bz3d_session_r2"] = old_session
    with open(os.path.join(OUT, "RESULTS.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
