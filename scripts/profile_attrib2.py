"""Neuter-flag attribution of the layered Pallas eval kernel on the BENCH
workload (32 crops of 256x384, synthetic T=4 D=8 two-layer model).

Each variant runs in a subprocess so B3D_EVAL_NEUTER (read at trace time)
takes effect; compile cache makes repeat runs cheap.
"""
import os
import subprocess
import sys

WORKER = r"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _synthetic_layered_model, _synthetic_frame
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _preproc_front, _crop_origins, _stencil_crops)
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.models.layered import run_layered

B = 16
intrin = CameraIntrinsics.d415()
model = _synthetic_layered_model("/tmp/graft_model")
pipe = FramePipeline(model, intrin)
cfg = pipe.cfg
h, w = intrin.height, intrin.width
frames = jnp.asarray(np.stack([np.asarray(_synthetic_frame(intrin))] * B))
# identical operating point to bench.py: entry() RANSAC-calibrates the plane
from __graft_entry__ import entry
_, (_, plane_mat) = entry()

def front(raw):
    depth1, grown, g_info, _ = _preproc_front(
        raw, plane_mat, pipe._pp, pipe._fx, pipe.gauss_kernel,
        pipe._zthr, pipe._gms, cfg)
    oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
    return _stencil_crops(depth1, grown, oys, oxs, cfg, h, w)

crops = jax.jit(lambda: jax.vmap(front)(frames))()
crops_flat = jax.device_put(np.asarray(crops.reshape(2 * B, cfg.crop_h, cfg.crop_w)))
sf = jnp.float32(w) / jnp.float32(cfg.train_dim_x)

@jax.jit
def ev():
    return run_layered(
        crops_flat, pipe._tables, model.conditions,
        filter_specs=pipe._filter_specs, labels_reduce=cfg.labels_reduce,
        scale_factor=sf, backend="pallas", metas=pipe._metas,
        conditions_packed=pipe._cond_packed, num_cond=pipe._num_cond)

o = ev(); np.asarray(o)
t0 = time.perf_counter()
for _ in range(30):
    o = ev()
np.asarray(o)
print(f"RESULT {(time.perf_counter() - t0) / 30 * 1e3:.2f}")
"""


def main():
    variants = sys.argv[1:] or ["", "img", "pdf", "lut0", "img,lut0,pdf"]
    for v in variants:
        env = dict(os.environ)
        env["B3D_EVAL_NEUTER"] = v
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        p = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=2400)
        res = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"neuter={v or '(none)':14s} -> {res[0][7:] if res else 'FAIL'} ms",
              flush=True)
        if not res:
            print(p.stdout[-2000:], p.stderr[-2000:])


if __name__ == "__main__":
    main()
