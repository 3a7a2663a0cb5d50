"""Batched-throughput timing of the FULL pipeline on the TRAINED flagship
model (models/flagship) — the realistic operating point (coherent probes),
vs the adversarial random-offset synthetic model the bench also reports.
"""
import gzip
import os
import shutil
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.pipeline import FramePipeline
from scripts.flagship_e2e import OUT, scene

B = 16


def load_flagship(tmp="/tmp/flagship_model"):
    # B3D_FLAGSHIP_DIR: alternate model dir (e.g. the depth-truncated
    # variants scripts/truncate_fine.py writes) for fps A/Bs.
    src_dir = os.environ.get("B3D_FLAGSHIP_DIR", OUT)
    os.makedirs(tmp, exist_ok=True)
    for f in ("m0.npy", "model_cfg.json"):
        shutil.copy(os.path.join(src_dir, f), os.path.join(tmp, f))
    if os.path.exists(os.path.join(src_dir, "m1.npy")):
        shutil.copy(os.path.join(src_dir, "m1.npy"),
                    os.path.join(tmp, "m1.npy"))
    else:
        with gzip.open(os.path.join(src_dir, "m1.npy.gz"), "rb") as src, \
                open(os.path.join(tmp, "m1.npy"), "wb") as dst:
            shutil.copyfileobj(src, dst)
    return LayeredDecisionForest.load(
        os.path.join(tmp, "model_cfg.json"), labels_reduce=2)


def main():
    intrin = CameraIntrinsics.d415()
    model = load_flagship()
    pipe = FramePipeline(model, intrin)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.stack(
        [scene(intrin, t, rng)[0] for t in range(B)]))
    plane_mat = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
        np.float32))

    ob = pipe.batch(frames, plane_mat)
    np.asarray(ob["heights"])
    for iters in (10, 30):
        t0 = time.perf_counter()
        for _ in range(iters):
            ob = pipe.batch(frames, plane_mat)
        np.asarray(ob["heights"])
        dt = time.perf_counter() - t0
        print(f"iters={iters}: {dt / iters * 1e3:.2f} ms/batch, "
              f"{B * iters / dt:.1f} fps")


if __name__ == "__main__":
    main()
