"""A/B env-knob sweep of the layered Pallas eval kernel on the FLAGSHIP
workload (32 crops, trained coarse D=8 + fine D=16 model).

Each variant runs in a subprocess so B3D_EVAL_* (read at trace time) takes
effect; the persistent compile cache makes repeat runs cheap.

Usage: python scripts/ab_flagship_knobs.py 'TILEK=2' 'TILEK=4 UNION=0' ...
(no args = a default sweep).  Keys are the B3D_EVAL_ suffixes.
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
from scripts.profile_flagship_batch import load_flagship, B
from bench import _scene_hands
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _preproc_front, _crop_origins, _stencil_crops)
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.models.layered import run_layered

intrin = CameraIntrinsics.d415()
model = load_flagship()
pipe = FramePipeline(model, intrin)
cfg = pipe.cfg
h, w = intrin.height, intrin.width
frames = jnp.asarray(np.stack([_scene_hands(intrin, t) for t in range(B)]))
from beats3d_tpu.ops import plane as plane_ops
from beats3d_tpu.ops import points as points_ops
pts = jax.jit(points_ops.deproject_points)(frames[0], pipe._pp, pipe._fx)
plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

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

o = ev(); ref = np.asarray(o)
t0 = time.perf_counter()
for _ in range(30):
    o = ev()
np.asarray(o)
print(f"RESULT {(time.perf_counter() - t0) / 30 * 1e3:.2f} sum={int(ref[ref != 65535].sum())}")
"""


def main():
    variants = sys.argv[1:] or [
        "", "TILEK=2", "TILEK=4", "TILEK=2 UNION=0",
    ]
    for v in variants:
        env = dict(os.environ)
        for kv in v.split():
            k, val = kv.split("=")
            env["B3D_EVAL_" + k] = val
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        p = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=2400)
        res = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{v or '(default)':24s} -> {res[0][7:] if res else 'FAIL'}",
              flush=True)
        if not res:
            print(p.stdout[-2000:], p.stderr[-2000:])


if __name__ == "__main__":
    main()
