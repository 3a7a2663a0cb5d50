"""Local-TPU profile lane (ROADMAP backlog): capture a jax.profiler trace of
the flagship batched pipeline so DEVICE time can be read separately from the
axon-tunnel round trip that inflates every host-side timer on this rig.

Writes a perfetto/tensorboard trace under /tmp/b3d_trace and prints the
host-side per-batch time for cross-checking.  Uses FramePipeline.batch
directly (the inner jitted program), so a warm persistent cache is hit and
no new program is compiled.

Usage: python scripts/profile_device.py [B] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from bench import _scene_hands, load_flagship  # noqa: E402
from beats3d_tpu.ops import plane as plane_ops  # noqa: E402
from beats3d_tpu.ops import points as points_ops  # noqa: E402
from beats3d_tpu.runtime.pipeline import FramePipeline  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    intrin = CameraIntrinsics.d415()
    pipe = FramePipeline(load_flagship(), intrin)
    frames = jnp.asarray(np.stack([_scene_hands(intrin, t) for t in range(B)]))

    # RANSAC-calibrate the tilted table plane exactly like bench.py main():
    # with an identity plane the band mask would classify the whole scene as
    # off-plane and the captured trace would not cross-check against bench.
    pts = jax.jit(points_ops.deproject_points)(frames[0], pipe._pp, pipe._fx)
    plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

    ob = pipe.batch(frames, plane_mat)  # warm-up / compile
    np.asarray(ob["heights"])

    with jax.profiler.trace("/tmp/b3d_trace"):
        t0 = time.perf_counter()
        for _ in range(iters):
            ob = pipe.batch(frames, plane_mat)
        np.asarray(ob["heights"])
        dt = (time.perf_counter() - t0) / iters
    print(f"host-side: {dt * 1e3:.2f} ms/batch  {B / dt:.1f} fps  "
          f"(amortized over async dispatches, bench.py methodology; "
          f"trace in /tmp/b3d_trace)")


if __name__ == "__main__":
    main()
