#!/usr/bin/env python3
"""Benchmark the flagship layered frame pipeline on one chip.

Prints ONE JSON line:
  {"metric": "frames_per_second", "value": N, "unit": "848x480 frames/s/chip",
   "vs_baseline": N / 2000, ...extras}

value = sustained batched throughput (the offline/eval operating point, the
BASELINE.json "frames/s/chip" axis).  Extras report the live instrument's
numbers: single-stream fps, amortized per-frame latency, sync p50 (one
dispatch -> one batched fetch — over the axon tunnel this is dominated by a
~25-40 ms host<->device round trip that does not exist on local hardware),
and pipelined p50 (the BeatsApp double-buffered loop's inter-frame period).

--check: on-chip parity lane — asserts the compiled Pallas kernel's labels
against the XLA evaluator on the bench scene (the on-TPU test the CPU suite
can't run); exits nonzero on mismatch.
"""

import json
import sys
import time

import numpy as np


def _scene(intrin):
    h, w = intrin.height, intrin.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n = np.array([0.03, -0.05, 1.0])
    n /= np.linalg.norm(n)
    depth = (2600.0 - n[0] * (xx - intrin.ppx) * 8 - n[1] * (yy - intrin.ppy) * 8) / n[2]
    for cx in (int(0.3 * w), int(0.7 * w)):
        blob = (xx - cx) ** 2 + (yy - h / 2) ** 2 < 130 ** 2
        depth[blob] -= 300.0
    return depth.astype(np.uint16)


def main():
    import jax
    import jax.numpy as jnp

    try:
        from beats3d_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass

    from __graft_entry__ import entry, _synthetic_layered_model
    from beats3d_tpu.utils import CameraIntrinsics

    check = "--check" in sys.argv

    fn, (depth, plane_mat) = entry()

    # warm-up / compile
    out = fn(depth, plane_mat)
    np.asarray(out["heights"])

    if check:
        from beats3d_tpu.models import layered as layered_mod
        from beats3d_tpu.runtime.pipeline import FramePipeline

        intrin = CameraIntrinsics.d415()
        model = _synthetic_layered_model("/tmp/graft_model")
        scene = jnp.asarray(_scene(intrin))
        pipe_p = FramePipeline(model, intrin, backend="pallas")
        pipe_x = FramePipeline(model, intrin, backend="xla")
        op = pipe_p(scene, plane_mat)
        lp = np.asarray(op["labels"])
        lx = np.asarray(pipe_x(scene, plane_mat)["labels"])
        mism = int((lp != lx).sum())
        # Both blobs must come out as separate hand groups: catches on-chip
        # numeric corruption (e.g. the MXU's default bf16 input rounding
        # merging components) that backend-vs-backend parity cannot see
        # because both backends share the front.
        g = np.asarray(op["g_info"])
        groups_ok = bool(g[0, 0] > 0 and g[1, 0] > 0)
        ok = mism == 0 and groups_ok
        print(json.dumps({
            "metric": "pallas_xla_label_parity",
            "value": 1.0 if ok else 0.0,
            "unit": "bool",
            "mismatched_pixels": mism,
            "both_hands_found": groups_ok,
            "platform": jax.devices()[0].platform,
        }))
        sys.exit(0 if ok else 1)

    # --- single-stream: dispatch chain, one completion fetch ---
    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(depth, plane_mat)
    np.asarray(out["heights"])
    dt_single = (time.perf_counter() - t0) / iters
    fps_single = 1.0 / dt_single

    # --- sync p50: dispatch -> one batched fetch, per frame ---
    lats = []
    for _ in range(12):
        t0 = time.perf_counter()
        out = fn(depth, plane_mat)
        jax.device_get((out["heights"], out["tip_valid"]))
        lats.append(time.perf_counter() - t0)
    p50_sync = sorted(lats)[len(lats) // 2] * 1e3

    # --- pipelined p50: the BeatsApp double-buffered loop ---
    pending = fn(depth, plane_mat)
    periods = []
    for _ in range(16):
        t0 = time.perf_counter()
        nxt = fn(depth, plane_mat)
        jax.device_get((pending["heights"], pending["tip_valid"]))
        pending = nxt
        periods.append(time.perf_counter() - t0)
    p50_pipe = sorted(periods)[len(periods) // 2] * 1e3

    # --- batched throughput (shared plane, recorded-session semantics) ---
    from beats3d_tpu.runtime.pipeline import FramePipeline
    from __graft_entry__ import _synthetic_frame

    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)
    B = 16
    frames = jnp.asarray(
        np.stack([np.asarray(_synthetic_frame(intrin))] * B)
    )
    ob = pipe.batch(frames, plane_mat)
    np.asarray(ob["heights"])
    bi = 10
    t0 = time.perf_counter()
    for _ in range(bi):
        ob = pipe.batch(frames, plane_mat)
    np.asarray(ob["heights"])
    fps_batched = B * bi / (time.perf_counter() - t0)

    result = {
        "metric": "frames_per_second",
        "value": round(fps_batched, 2),
        "unit": "848x480 frames/s/chip",
        "vs_baseline": round(fps_batched / 2000.0, 4),
        "fps_single_stream": round(fps_single, 2),
        "latency_ms_amortized": round(dt_single * 1e3, 2),
        "p50_latency_ms": round(p50_pipe, 2),
        "p50_sync_ms": round(p50_sync, 2),
        "batch": B,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
