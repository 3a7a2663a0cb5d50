"""Split the single-stream frame period into host-dispatch vs device time
(VERDICT r3 #3: >= 90 fps single stream).

Round 3 measured fps_single_stream=80.9 while the batched path amortized to
much less device time per frame — the gap is host-side per-call cost on this
1-core rig (pytree flattening of the ~200 table args + dispatch) plus the
single-frame program's own device time.  This probe measures, on the chip:

  1. dispatch-only rate: N async pipe() calls, no fetch until the end —
     period == max(host per-call cost, device time);
  2. device time per frame from an xplane trace of the same loop;
  3. host flatten/dispatch cost alone via jax.profiler host wall minus 2;
  4. the same with donate/AOT-lowered call (jit(...).lower().compile()) to
     see whether bypassing retrace checks pays.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_single_stream.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
    enable_compilation_cache()
    from bench import _scene_hands, load_flagship
    from beats3d_tpu.ops import plane as plane_ops
    from beats3d_tpu.ops import points as points_ops
    from beats3d_tpu.runtime.pipeline import FramePipeline
    from beats3d_tpu.utils.devtime import measure_device_ms

    intrin = CameraIntrinsics.d415()
    pipe = FramePipeline(load_flagship(), intrin)
    depth = jnp.asarray(_scene_hands(intrin, 0))
    pts = jax.jit(points_ops.deproject_points)(depth, pipe._pp, pipe._fx)
    plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

    out = pipe(depth, plane_mat)
    np.asarray(out["heights"])  # compile + settle

    # 1. dispatch-chain rate
    iters = 60
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(depth, plane_mat)
    np.asarray(out["heights"])
    period = (time.perf_counter() - t0) / iters
    print(f"single-stream period {period * 1e3:.2f} ms "
          f"({1 / period:.1f} fps)")

    # 2. enqueue-only cost: time the python call WITHOUT waiting at all,
    # over a short burst the device can absorb into its queue
    t0 = time.perf_counter()
    outs = [pipe(depth, plane_mat) for _ in range(8)]
    enq = (time.perf_counter() - t0) / 8
    np.asarray(outs[-1]["heights"])
    print(f"enqueue-only: {enq * 1e3:.2f} ms/call (host-side python + "
          "dispatch, device still draining)")

    # 3. device time per frame (xplane)
    dev = measure_device_ms(
        lambda: pipe(depth, plane_mat), 12,
        sync=lambda o: np.asarray(o["heights"]),
    )
    if dev:
        print(f"device: {dev['device_ms']:.3f} ms/frame; wall "
              f"{dev['wall_ms']:.2f} ms; stages "
              f"{ {k: round(v, 2) for k, v in sorted(dev['stages'].items(), key=lambda x: -x[1])[:5]} }")


if __name__ == "__main__":
    main()
