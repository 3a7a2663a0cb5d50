"""Does B=24/32 fit HBM now, and what's the sustained fps vs B=16?"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model, _synthetic_frame, entry
from beats3d_tpu.runtime.pipeline import FramePipeline


def main():
    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)
    _, (_, plane_mat) = entry()
    base = np.asarray(_synthetic_frame(intrin))

    for B in (16, 24, 32):
        frames = jnp.asarray(np.stack([base] * B))
        try:
            ob = pipe.batch(frames, plane_mat)
            np.asarray(ob["heights"])
        except Exception as e:
            print(f"B={B}: FAIL {type(e).__name__}: {str(e)[:200]}")
            continue
        for trial in range(2):
            n = 30
            t0 = time.perf_counter()
            for _ in range(n):
                ob = pipe.batch(frames, plane_mat)
            np.asarray(ob["heights"])
            dt = (time.perf_counter() - t0) / n
        print(f"B={B}: {dt*1e3:7.2f} ms/batch  {B/dt:8.1f} fps", flush=True)


if __name__ == "__main__":
    main()
