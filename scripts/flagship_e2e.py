"""Flagship-scale end-to-end proof (VERDICT round-2 item 6).

datagen (full 848x480, color-EM labels, augmentation, smoothing)
  -> train layer-0 coarse hand/background forest (T=4, D=8)
  -> train layer-1 fine 6-class forest (T=4, D=16) with streaming blocks +
     Pallas feature bits
  -> assemble the reference-format layered model
  -> evaluate pct_match on held-out frames (XLA and compiled Pallas paths)
  -> run the BeatsApp live loop on a synthetic session with the model
  -> write the model + numbers + a golden label set to models/flagship/

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/flagship_e2e.py
"""

import json
import os
import shutil
import time

import numpy as np

OUT = "models/flagship"
DS = "/tmp/flagship_ds"
N_IMAGES = 24
N_TEST = 4
FINE_DEPTH = 16
COARSE_DEPTH = 8
TREES = 4
PROPOSALS = 128
PROPOSALS_BLOCK = 64


def scene(intrin, t, rng):
    """Synthetic 'skin-painted hand' at full res: palm + 5 fingers, each a
    distinct paint color, over a tilted table."""
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n = np.array([0.02, -0.04, 1.0])
    n /= np.linalg.norm(n)
    depth = (2600.0 - n[0] * (xx - intrin.ppx) * 8 - n[1] * (yy - intrin.ppy) * 8) / n[2]
    color = np.zeros((h, w, 3), np.uint8)

    cx = w * 0.5 + 60 * np.sin(0.3 * t)
    cy = h * 0.55 + 30 * np.cos(0.2 * t)
    palm_r = 95.0
    palm = (xx - cx) ** 2 + (yy - cy) ** 2 < palm_r ** 2
    depth[palm] -= 320.0
    color[palm] = (210, 160, 120)

    finger_colors = [
        (220, 40, 40), (40, 220, 40), (40, 40, 220),
        (220, 220, 40), (220, 40, 220),
    ]
    for k in range(5):
        ang = np.pi * (0.75 + 0.125 * k) + 0.1 * np.sin(0.4 * t + k)
        fx = cx + (palm_r + 55) * np.cos(ang)
        fy = cy - (palm_r + 55) * abs(np.sin(ang))
        tap = 0.5 + 0.5 * np.sin(0.5 * t + 1.3 * k)
        fr = 26.0 + 2 * k
        blob = (xx - fx) ** 2 + (yy - fy) ** 2 < fr ** 2
        depth[blob] -= 340.0 + 40.0 * tap + 15 * k
        color[blob] = finger_colors[k]
    return depth.astype(np.uint16), color


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

    rng = np.random.default_rng(42)
    intrin = CameraIntrinsics.d415()
    os.makedirs(OUT, exist_ok=True)

    # ---- 1. datagen ------------------------------------------------------
    t0 = time.time()
    if os.path.exists(DS):
        shutil.rmtree(DS)
    cfg = DatagenConfig(
        num_colors=6, color_em_tries=6, color_em_iterations=24,
        plane_candidates=8192, plane_z_threshold=40.0,
        scale_variance=0.04, gaussian_noise=1.5,
        max_images=N_IMAGES + N_TEST,
    )
    conv = LiveDataConvert(DS, intrin, cfg, rng=rng)
    for t in range(N_IMAGES + N_TEST):
        depth, color = scene(intrin, t, rng)
        conv.process_frame(depth, color, depth_timestamp=t / 90.0,
                           color_timestamp=t / 90.0 + 0.002)
    ds_cfg = conv.finish()
    print(f"[datagen] {ds_cfg['num_images']} full-res images in "
          f"{time.time()-t0:.1f}s")

    train_data, test_data = DatasetConfig.multiple(DS, [
        (N_IMAGES, 4, "train"),
        (N_TEST, None, "test"),
    ])

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
            images_per_block=min(4, depth.shape[0]),
        )

    t0 = time.time()
    coarse = train_forest(
        to_coarse(train_data), to_coarse(test_data),
        num_random_features=PROPOSALS, proposals_per_block=PROPOSALS_BLOCK,
        images_per_block=4, max_tree_depth=COARSE_DEPTH,
        trees_in_forest=TREES, trees_to_try=TREES,
        rng=np.random.default_rng(7), streaming=True,
    )
    print(f"[coarse] D={COARSE_DEPTH} T={TREES} pct_match="
          f"{coarse.pct_match:.4f} in {time.time()-t0:.1f}s")

    # ---- 3. fine 6-class layer at flagship depth ------------------------
    t0 = time.time()
    fine = train_forest(
        CompressedDataset(train_data), test_data,
        num_random_features=PROPOSALS, proposals_per_block=PROPOSALS_BLOCK,
        images_per_block=4, max_tree_depth=FINE_DEPTH,
        trees_in_forest=TREES, trees_to_try=TREES,
        rng=np.random.default_rng(13), streaming=True,
    )
    print(f"[fine] D={FINE_DEPTH} T={TREES} pct_match={fine.pct_match:.4f} "
          f"in {time.time()-t0:.1f}s")

    # ---- 4. assemble layered model (reference artifact format) ----------
    np.save(os.path.join(OUT, "m0.npy"), coarse.data)
    np.save(os.path.join(OUT, "m1.npy"), fine.data)
    layered_cfg = {
        "layers": [
            {"model": "m0.npy"},
            {"model": "m1.npy", "filter_model": 0, "filter_model_class": 1},
        ],
        # layer-0 label 1 (hand) -> jump to offset 1; fine labels 1..6 emit
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

    # ---- 5. layered eval parity + goldens --------------------------------
    from beats3d_tpu.models.layered import run_layered

    test_depth = test_data.get_depth_block(0)
    test_labels = test_data.get_labels_block(0)

    lab_x = np.asarray(run_layered(
        jnp.asarray(test_depth), model.layer_tables(), model.conditions,
        filter_specs=tuple((l.filter_model, l.filter_model_class)
                           for l in model.layers),
        labels_reduce=1, scale_factor=jnp.float32(1.0), backend="xla",
    ))
    lab_p = np.asarray(run_layered(
        jnp.asarray(test_depth), model.layer_tables_pallas(),
        model.conditions,
        filter_specs=tuple((l.filter_model, l.filter_model_class)
                           for l in model.layers),
        labels_reduce=1, scale_factor=jnp.float32(1.0), backend="pallas",
        metas=model.layer_metas(), conditions_packed=model.conditions_packed(),
        num_cond=int(np.asarray(model.conditions_np).shape[0]),
    ))
    mism = int((lab_x != lab_p).sum())
    labeled = test_labels > 0
    acc = float((lab_p[labeled] == test_labels[labeled]).mean())
    print(f"[layered] pallas==xla mismatches: {mism}; "
          f"layered pct_match on held-out: {acc:.4f}")

    np.savez_compressed(
        os.path.join(OUT, "golden_eval.npz"),
        depth=test_depth[:2], labels=lab_p[:2],
    )

    # ---- 6. run the instrument on a recorded-style session ---------------
    from beats3d_tpu.runtime.app import AppConfig, BeatsApp
    from beats3d_tpu.runtime.camera import Frame
    from beats3d_tpu.runtime.midi import Midi

    class Source:
        intrinsics = intrin

        def frames(self):
            t = 0
            while True:
                d, _ = scene(intrin, t, np.random.default_rng(0))
                yield Frame(depth=d, timestamp=t / 90.0)
                t += 1

        def stop(self):
            pass

    app_cfg = AppConfig(
        plane_num_iterations=8192, warmup_frames=2, min_velocity=2.0,
        default_fingertip_thresholds=(150.0,) * 5,
    )
    app = BeatsApp(model, Source(), midi=Midi(), cfg=app_cfg,
                   log=lambda *a: None)
    t0 = time.time()
    n = app.run(max_frames=120)
    dt = time.time() - t0
    events = app.midi.sink.note_events()
    ons = [e for e in events if e[1] == "on"]
    labels_out = app.last_out and np.asarray(app.last_out["labels"])
    hist = {int(k): int(v) for k, v in
            zip(*np.unique(labels_out, return_counts=True))}
    print(f"[bz3d] {n} frames in {dt:.1f}s ({n/dt:.1f} fps), "
          f"{len(ons)} note-ons, label histogram: {hist}")

    summary = {
        "dataset": {"images": int(ds_cfg["num_images"]),
                    "resolution": [848, 480]},
        "coarse": {"depth": COARSE_DEPTH, "trees": TREES,
                   "pct_match": round(coarse.pct_match, 4)},
        "fine": {"depth": FINE_DEPTH, "trees": TREES,
                 "pct_match": round(fine.pct_match, 4)},
        "layered_pct_match": round(acc, 4),
        "pallas_xla_mismatches": mism,
        "bz3d_session": {"frames": n, "fps": round(n / dt, 1),
                         "note_ons": len(ons)},
    }
    with open(os.path.join(OUT, "RESULTS.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
