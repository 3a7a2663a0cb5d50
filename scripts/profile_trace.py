"""Device-time profiling lane (VERDICT r2 #3): per-op DEVICE milliseconds for
the flagship batched pipeline, free of the ~25 ms axon-tunnel RTT that
pollutes every host-side timer on this rig.

Matches the reference's per-kernel timing discipline (sync+record pairs,
/root/reference/src/3d_bz.py:391-392, src/engine/profile_timer.py) the
TPU-native way: capture a jax.profiler trace, then read the TPU device
plane's XLA-op events straight out of the .xplane.pb protobuf.

Usage:
  python scripts/profile_trace.py capture [B] [iters]   # needs the chip
  python scripts/profile_trace.py report [logdir]       # CPU only
  python scripts/profile_trace.py both [B] [iters]      # capture + report

``report`` prints a per-op table (total device ms, share, count) grouped into
pipeline stages by op-name pattern, plus the per-batch device total — the
number the <2 ms p50 target is evidenced with.
"""
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGDIR = "/tmp/b3d_trace"

# Stage attribution: first matching pattern wins (op names come from jax
# jaxpr eqn names propagated into XLA metadata).
STAGES = (
    ("eval_kernel", r"forest_eval|layered|pallas_call|tree_|custom-call"),
    ("preproc", r"plane_band|gauss|preproc|deproject|shrink"),
    ("components", r"components|label_comp|hand_group|while"),
    ("crop_scatter", r"crop|scatter|stencil|dynamic_update|dynamic-update"),
    ("meanshift", r"mean_shift|meanshift"),
    ("reduce_misc", r"reduce|convert|select|broadcast|iota|compare"),
    ("fusion_other", r"fusion"),
    ("copy_transfer", r"copy|transpose|bitcast"),
)


def capture(b=16, iters=12):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
    enable_compilation_cache()
    from bench import _scene_hands, load_flagship
    from beats3d_tpu.ops import plane as plane_ops
    from beats3d_tpu.ops import points as points_ops
    from beats3d_tpu.runtime.pipeline import FramePipeline

    intrin = CameraIntrinsics.d415()
    pipe = FramePipeline(load_flagship(), intrin)
    frames = jnp.asarray(
        np.stack([_scene_hands(intrin, t) for t in range(b)])
    )
    # RANSAC plane exactly like bench.py main() — identity would classify the
    # whole scene off-plane and profile a different workload.
    pts = jax.jit(points_ops.deproject_points)(frames[0], pipe._pp, pipe._fx)
    plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

    ob = pipe.batch(frames, plane_mat)
    import numpy as _np
    _np.asarray(ob["heights"])  # compile + settle

    with jax.profiler.trace(LOGDIR):
        t0 = time.perf_counter()
        for _ in range(iters):
            ob = pipe.batch(frames, plane_mat)
        _np.asarray(ob["heights"])
        dt = (time.perf_counter() - t0) / iters
    print(f"host-side: {dt * 1e3:.2f} ms/batch  {b / dt:.1f} fps "
          f"(amortized over async dispatches)")
    return iters


def report(logdir=LOGDIR, iters=None):
    from beats3d_tpu.utils.devtime import parse_trace

    union_ms, per_op, stages = parse_trace(logdir)
    total = sum(v[0] for v in per_op.values())

    print(f"\n== device time: busy {union_ms:.2f} ms, leaf-op sum "
          f"{total:.2f} ms over trace ==")
    if iters:
        print(f"   per-batch: busy {union_ms / iters:.3f} ms, "
              f"leaf sum {total / iters:.3f} ms")
    print("\n-- by stage (leaves only) --")
    for sname, (ms, cnt) in sorted(stages.items(), key=lambda x: -x[1][0]):
        print(f"  {sname:<14} {ms:9.2f} ms  {100 * ms / total:5.1f}%  "
              f"({cnt} events)")
    print("\n-- top 25 leaf ops --")
    top = sorted(per_op.items(), key=lambda x: -x[1][0])[:25]
    for name, (ms, cnt) in top:
        per = f" {ms / iters:7.3f} ms/it" if iters else ""
        print(f"  {ms:9.2f} ms {100 * ms / total:5.1f}%  x{cnt:<6}{per} "
              f"{name[:84]}")
    return {"busy_ms": union_ms, "leaf_total_ms": total,
            "per_batch_busy_ms": (union_ms / iters) if iters else None}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    if mode == "capture":
        capture(b, iters)
    elif mode == "report":
        report(sys.argv[2] if len(sys.argv) > 2 else LOGDIR, iters=None)
    else:
        n = capture(b, iters)
        report(iters=n)


if __name__ == "__main__":
    main()
