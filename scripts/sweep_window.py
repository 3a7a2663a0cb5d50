"""A/B sweep of fast-path window geometry (B3D_EVAL_ROWS x B3D_EVAL_KC) on
the bench workload.  Each variant runs in a subprocess (env is read at trace
time); prints batched ms/batch per variant."""
import os
import subprocess
import sys

WORKER = r"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _synthetic_layered_model, _synthetic_frame, entry
from beats3d_tpu.runtime.pipeline import FramePipeline

B = 16
intrin = CameraIntrinsics.d415()
model = _synthetic_layered_model("/tmp/graft_model")
pipe = FramePipeline(model, intrin)
_, (_, plane_mat) = entry()
frames = jnp.asarray(np.stack([np.asarray(_synthetic_frame(intrin))] * B))
ob = pipe.batch(frames, plane_mat); np.asarray(ob["heights"])
best = 1e9
for _ in range(3):
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        ob = pipe.batch(frames, plane_mat)
    np.asarray(ob["heights"])
    best = min(best, (time.perf_counter() - t0) / n)
print(f"RESULT {best*1e3:.2f}")
"""


def main():
    variants = sys.argv[1:] or ["4,3", "2,3", "4,2", "2,2", "6,3", "3,3"]
    for v in variants:
        rows, kc = v.split(",")
        env = dict(os.environ)
        env["B3D_EVAL_ROWS"] = rows
        env["B3D_EVAL_KC"] = kc
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        p = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=2400)
        res = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"rows={rows} kc={kc} -> {res[0][7:] if res else 'FAIL'} ms/batch",
              flush=True)
        if not res:
            print(p.stdout[-1500:], p.stderr[-1500:])


if __name__ == "__main__":
    main()
