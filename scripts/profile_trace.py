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
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print(f"no .xplane.pb under {logdir}", file=sys.stderr)
        sys.exit(1)
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    dev_planes = [
        p for p in xspace.planes
        if ("TPU" in p.name or "/device" in p.name.lower())
        and "host" not in p.name.lower()
    ]
    if not dev_planes:
        print("planes found:", [p.name for p in xspace.planes])
        print("NO DEVICE PLANE — runtime may not export device traces",
              file=sys.stderr)
        sys.exit(2)

    # Collect raw intervals per device line; XLA emits NESTED events
    # (conditional/while wrappers cover the ops inside them), so attribution
    # must only count LEAVES, and "device busy" is the interval union.
    per_op = {}
    union_ms = 0.0
    for plane in dev_planes:
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "framework" in lname or "module" in lname:
                continue
            evs = []
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                evs.append(
                    (ev.offset_ps, ev.offset_ps + ev.duration_ps, md.name)
                )
            if not evs:
                continue
            evs.sort()
            # leaf = no other event starts inside me (events are properly
            # nested on a device line)
            for i, (st, en, name) in enumerate(evs):
                is_leaf = True
                if i + 1 < len(evs):
                    nst = evs[i + 1][0]
                    if nst < en:
                        is_leaf = False
                if is_leaf:
                    agg = per_op.setdefault(name, [0.0, 0])
                    agg[0] += (en - st) / 1e9
                    agg[1] += 1
            # busy union
            cur_s, cur_e = evs[0][0], evs[0][1]
            for st, en, _ in evs[1:]:
                if st > cur_e:
                    union_ms += (cur_e - cur_s) / 1e9
                    cur_s, cur_e = st, en
                else:
                    cur_e = max(cur_e, en)
            union_ms += (cur_e - cur_s) / 1e9

    total = sum(v[0] for v in per_op.values())
    stages = {}
    for name, (ms, cnt) in per_op.items():
        for sname, pat in STAGES:
            if re.search(pat, name.split(" = ")[0] + " " +
                         name.split(" = ")[-1][:40], re.I):
                break
        else:
            sname = "other"
        s = stages.setdefault(sname, [0.0, 0])
        s[0] += ms
        s[1] += cnt

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
