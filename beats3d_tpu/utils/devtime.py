"""Device-time measurement from jax.profiler xplane traces.

The axon tunnel puts ~25-40 ms of RTT in front of every host-side timer on
this rig, so latency targets (p50 frame -> fingertip) are evidenced with
DEVICE time read from the TPU plane of a .xplane.pb — the TPU-native
equivalent of the reference's CUDA event timers
(/root/reference/src/engine/profile_timer.py, 3d_bz.py:391-392).

Shared by scripts/profile_trace.py (full per-op tables) and bench.py
(per-stage device ms + utilization fields in the round record).
"""
import glob
import os
import re
import sys

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


def parse_trace(logdir):
    """Parse the newest .xplane.pb under ``logdir``.

    Returns (busy_ms, per_op, stages): busy_ms is the interval-union device
    busy time over the whole trace; per_op maps op name -> [ms, count]
    (leaf events only — XLA nests while/cond wrappers over their bodies);
    stages aggregates per_op through STAGES."""
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
    )
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    dev_planes = [
        p for p in xspace.planes
        if ("TPU" in p.name or "/device" in p.name.lower())
        and "host" not in p.name.lower()
    ]
    if not dev_planes:
        raise RuntimeError(
            "no device plane in trace; planes: "
            + str([p.name for p in xspace.planes])
        )

    per_op = {}
    busy_ms = 0.0
    for plane in dev_planes:
        # the TPU plane exports parallel views of the SAME execution
        # ('XLA Modules' wraps 'XLA Ops'; 'Async XLA Ops' shadows async
        # slices of it): summing their unions double-counts.  Use the
        # 'XLA Ops' line alone when present; busy time is the MAX union
        # across lines, not the sum.
        lines = [
            l for l in plane.lines
            if not any(k in l.name.lower()
                       for k in ("step", "framework", "module"))
        ]
        ops_only = [l for l in lines if l.name.lower() == "xla ops"]
        if ops_only:
            lines = ops_only
        plane_busy = 0.0
        for line in lines:
            evs = []
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                evs.append(
                    (ev.offset_ps, ev.offset_ps + ev.duration_ps, md.name)
                )
            if not evs:
                continue
            evs.sort()
            for i, (st, en, name) in enumerate(evs):
                is_leaf = not (i + 1 < len(evs) and evs[i + 1][0] < en)
                if is_leaf:
                    agg = per_op.setdefault(name, [0.0, 0])
                    agg[0] += (en - st) / 1e9
                    agg[1] += 1
            line_busy = 0.0
            cur_s, cur_e = evs[0][0], evs[0][1]
            for st, en, _ in evs[1:]:
                if st > cur_e:
                    line_busy += (cur_e - cur_s) / 1e9
                    cur_s, cur_e = st, en
                else:
                    cur_e = max(cur_e, en)
            line_busy += (cur_e - cur_s) / 1e9
            plane_busy = max(plane_busy, line_busy)
        busy_ms += plane_busy

    stages = {}
    for name, (ms, cnt) in per_op.items():
        for sname, pat in STAGES:
            if re.search(
                pat,
                name.split(" = ")[0] + " " + name.split(" = ")[-1][:40],
                re.I,
            ):
                break
        else:
            sname = "other"
        s = stages.setdefault(sname, [0.0, 0])
        s[0] += ms
        s[1] += cnt
    return busy_ms, per_op, stages


def measure_device_ms(fn, iters, logdir="/tmp/b3d_devtime", sync=None):
    """Trace ``iters`` calls of ``fn`` and return per-iteration device
    metrics: {"device_ms": busy/iters, "stages": {name: ms/iter},
    "wall_ms": host wall per iter}.  Returns None when the runtime exports
    no device plane (CPU) or the profiler/proto stack is unavailable."""
    import shutil
    import time

    import jax

    shutil.rmtree(logdir, ignore_errors=True)
    try:
        with jax.profiler.trace(logdir):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn()
            if sync is not None:
                sync(out)
            wall = (time.perf_counter() - t0) / iters
        busy_ms, _, stages = parse_trace(logdir)
    except Exception as e:  # profiling is best-effort in the bench record
        print(f"devtime: {e!r}", file=sys.stderr)
        return None
    return {
        "device_ms": busy_ms / iters,
        "wall_ms": wall * 1e3,
        "stages": {k: v[0] / iters for k, v in stages.items()},
    }
