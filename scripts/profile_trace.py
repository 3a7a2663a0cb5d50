#!/usr/bin/env python3
"""Device-side profile lane: capture a jax.profiler trace of the bench
workload so device time is separated from axon-tunnel time (ROADMAP:
"profile_* scripts measure through the tunnel; a local-TPU profile lane
would separate device time from tunnel time").

Usage:
    python scripts/profile_trace.py [--logdir /tmp/beats3d_trace] [--iters 20]

Then: tensorboard --logdir <logdir>  (or inspect the .pb/.json.gz trace with
the XLA tools).  Works on CPU too (JAX_PLATFORMS=cpu) for smoke-testing the
lane itself; the interesting numbers come from a real chip.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/beats3d_trace")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry, _synthetic_frame, _synthetic_layered_model
    from beats3d_tpu.runtime.pipeline import FramePipeline
    from beats3d_tpu.utils import CameraIntrinsics

    fn, (depth, plane_mat) = entry()
    np.asarray(fn(depth, plane_mat)["heights"])  # compile outside the trace

    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)
    frames = jnp.asarray(
        np.stack([np.asarray(_synthetic_frame(intrin))] * args.batch))
    np.asarray(pipe.batch(frames, plane_mat)["heights"])  # compile

    print(f"tracing {args.iters} single + {args.iters} batched steps "
          f"-> {args.logdir}", flush=True)
    with jax.profiler.trace(args.logdir):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(depth, plane_mat)
        np.asarray(out["heights"])
        t1 = time.perf_counter()
        for _ in range(args.iters):
            ob = pipe.batch(frames, plane_mat)
        np.asarray(ob["heights"])
        t2 = time.perf_counter()

    print(f"single: {1e3 * (t1 - t0) / args.iters:.2f} ms/frame, "
          f"batched: {1e3 * (t2 - t1) / (args.iters * args.batch):.2f} ms/frame")
    print(f"trace written under {args.logdir}")


if __name__ == "__main__":
    main()
