"""Quantify the per-dispatch host cost of the batched pipeline (the
~4.7 ms/batch device-idle gap the round-3 xplane trace exposed).

Times a chain of N dispatches with NO fetch (pure enqueue cost on this
1-core host + axon tunnel) and compares against the amortized
dispatch+execute period — separates host dispatch overhead from device
compute so the batch-size decision (B=16 vs 32) is data-driven.

Run warm (after bench.py):  python scripts/measure_dispatch.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
    enable_compilation_cache()
    from bench import _scene_hands, load_flagship
    from beats3d_tpu.ops import plane as plane_ops
    from beats3d_tpu.ops import points as points_ops
    from beats3d_tpu.runtime.pipeline import FramePipeline

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    intrin = CameraIntrinsics.d415()
    pipe = FramePipeline(load_flagship(), intrin)
    frames = jnp.asarray(
        np.stack([_scene_hands(intrin, t) for t in range(b)])
    )
    pts = jax.jit(points_ops.deproject_points)(frames[0], pipe._pp, pipe._fx)
    plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

    ob = pipe.batch(frames, plane_mat)
    np.asarray(ob["heights"])

    # amortized dispatch+execute (the bench methodology)
    t0 = time.perf_counter()
    for _ in range(12):
        ob = pipe.batch(frames, plane_mat)
    np.asarray(ob["heights"])
    period = (time.perf_counter() - t0) / 12

    # pure dispatch: enqueue 12 then measure the loop WITHOUT completion
    for _ in range(3):
        ob = pipe.batch(frames, plane_mat)  # keep queue warm
    t0 = time.perf_counter()
    outs = [pipe.batch(frames, plane_mat) for _ in range(12)]
    t_disp = (time.perf_counter() - t0) / 12
    np.asarray(outs[-1]["heights"])

    print(f"B={b}: period {period * 1e3:.2f} ms/batch "
          f"({b / period:.0f} fps), host dispatch {t_disp * 1e3:.2f} "
          f"ms/batch -> device-bound share "
          f"{100 * (1 - t_disp / period):.0f}%")


if __name__ == "__main__":
    main()
