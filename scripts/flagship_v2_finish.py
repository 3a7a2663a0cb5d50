"""Finish a flagship_v2 run whose step-5 evaluation crashed (the pre-fix
script evaluated all 16 full-res test images in one XLA call -> HBM OOM).

The forests + model_cfg.json were already written by step 4; this script
re-runs the CHUNKED held-out parity evaluation, writes goldens, gzips
m1.npy, and assembles RESULTS.json from the numbers parsed out of the
training log.

  python scripts/flagship_v2_finish.py /tmp/flagship_v2.log
"""

import gzip
import json
import os
import re
import resource
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "models/flagship"
DS = "/tmp/flagship_v2_ds"


def main():
    import jax.numpy as jnp

    from beats3d_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from beats3d_tpu.data import DatasetConfig
    from beats3d_tpu.models import LayeredDecisionForest
    from beats3d_tpu.models.layered import run_layered

    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_v2.log"
    log = open(log_path).read()

    m = re.search(r"\[coarse\] D=(\d+) T=(\d+) pct_match=([\d.]+) in "
                  r"([\d.]+)s", log)
    coarse = {"depth": int(m.group(1)), "trees": int(m.group(2)),
              "pct_match": float(m.group(3)),
              "train_seconds": float(m.group(4))}
    m = re.search(r"\[fine\] D=(\d+) T=(\d+) pct_match=([\d.]+) in "
                  r"([\d.]+)s", log)
    fine = {"depth": int(m.group(1)), "trees": int(m.group(2)),
            "pct_match": float(m.group(3)),
            "train_seconds": float(m.group(4))}
    m = re.search(r"\[stream\] dataset compression: (\{.*\})", log)
    comp_stats = json.loads(m.group(1).replace("'", '"'))

    with open(os.path.join(DS, "config.json")) as f:
        ds_cfg = json.load(f)
    n_test = 16
    n_train = ds_cfg["num_images"] - n_test
    _, test_data = DatasetConfig.multiple(DS, [
        (n_train, 4, "train"), (n_test, None, "test"),
    ])
    test_depth = test_data.get_depth_block(0)
    test_labels = test_data.get_labels_block(0)

    model = LayeredDecisionForest.load(
        os.path.join(OUT, "model_cfg.json"), labels_reduce=2
    )
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
            print(f"  [{backend}] {lo + 2}/{test_depth.shape[0]}",
                  flush=True)
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
    if os.path.exists(os.path.join(OUT, "m1.npy")):
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
                         "(beats3d_tpu/data/synth.py), splat-rendered "
                         "(ops/render.py)",
            "held_out": "16 unseen poses (disjoint rng stream)",
        },
        "coarse": coarse,
        "fine": fine,
        "layered_pct_match_unseen": round(acc, 4),
        "pallas_xla_mismatches": mism,
        "streaming": dict(comp_stats, forced=True,
                          node_state="CompressedBlocksDynamic"),
        "max_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    }
    if old_session:
        summary["bz3d_session_r2"] = old_session
    with open(os.path.join(OUT, "RESULTS.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
