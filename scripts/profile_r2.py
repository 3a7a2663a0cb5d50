"""Round-2 performance decomposition on the real chip.

Measures, with the loop-then-one-fetch pattern (tunnel D2H is ~40-60 ms):
  1. bare D2H fetch latency (tunnel round trip)
  2. fused layered eval: empty input vs hand-like input vs dense input
  3. full frame pipeline amortized
  4. pieces: preprocess only, components only, meanshift only
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import entry, _synthetic_layered_model, _synthetic_frame
from beats3d_tpu.runtime.pipeline import FramePipeline
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import forest_eval_pallas as fep


def timeit(f, iters=30, warmup=2):
    for _ in range(warmup):
        out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform)

    # --- 1. bare fetch latency ---
    x = jnp.zeros((8,), jnp.float32) + 1
    np.asarray(x)
    lats = []
    y = x
    for _ in range(10):
        t0 = time.perf_counter()
        y = y + 1
        np.asarray(y)
        lats.append((time.perf_counter() - t0) * 1e3)
    print(f"tiny add+fetch p50: {sorted(lats)[5]:.2f} ms  (pure tunnel D2H+dispatch)")

    # bigger fetch
    big = jnp.zeros((480, 848), jnp.uint16)
    np.asarray(big)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(big)
    print(f"407KB fetch: {(time.perf_counter()-t0)/5*1e3:.2f} ms")

    # --- 2. eval kernel in isolation ---
    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)

    h, w = 480, 848
    rng = np.random.default_rng(0)

    empty = np.full((2, h, w), 65535, np.uint16)

    # hand-like: one blob per image ~15% of pixels
    hand = np.full((2, h, w), 65535, np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 240) ** 2 / 2 + (xx - 300) ** 2 / 4) < 150**2
    hand[0][blob] = 2000 + (yy[blob] % 50).astype(np.uint16)
    blob2 = ((yy - 240) ** 2 / 2 + (xx - 550) ** 2 / 4) < 150**2
    hand[1][blob2] = 2100 + (xx[blob2] % 50).astype(np.uint16)

    dense = rng.integers(1800, 2200, (2, h, w)).astype(np.uint16)

    def ev(d):
        d = jnp.asarray(d)
        return lambda: fep.evaluate_layered_pallas(
            d, pipe._tables, pipe._metas, pipe._cond_packed, pipe._num_cond,
            filter_specs=pipe._filter_specs, labels_reduce=2,
            scale_factor=jnp.float32(1.0),
        )

    print(f"layered eval EMPTY : {timeit(ev(empty)):.2f} ms")
    print(f"layered eval HAND  : {timeit(ev(hand)):.2f} ms")
    print(f"layered eval DENSE : {timeit(ev(dense)):.2f} ms")

    # --- 3. full pipeline ---
    fn, (depth, plane_mat) = entry()
    print(f"full pipeline      : {timeit(lambda: fn(depth, plane_mat)):.2f} ms")

    # --- 4. pieces ---
    from beats3d_tpu.ops import components, meanshift, points

    gk = pipe.gauss_kernel

    @jax.jit
    def preprocess(raw, pm):
        pts = points.deproject_points(raw, jnp.asarray(intrin.pp), jnp.float32(intrin.fx))
        q = points.transform_points(pts, pm)
        qf = points.filter_points_by_plane(q, jnp.float32(40.0))
        d1 = points.remove_missing_3d_points_from_depth_image(qf, raw)
        d1 = points.gaussian_depth_filter(d1, gk)
        return points.shrink_image(d1, 3), d1

    @jax.jit
    def comp(small):
        return components.make_hand_groups(small, jnp.float32(0.06))

    small, d1 = preprocess(depth, plane_mat)
    print(f"preprocess         : {timeit(lambda: preprocess(depth, plane_mat)):.2f} ms")
    print(f"components         : {timeit(lambda: comp(small)):.2f} ms")

    labels = jnp.asarray(
        np.where(hand[0] == 65535, 65535, rng.integers(1, 8, (h, w))).astype(np.uint16)
    )[::2, ::2]

    @jax.jit
    def ms(l):
        return meanshift.mean_shift(l, pipe.variances, num_classes=model.num_layered_classes, num_rounds=6)

    print(f"mean shift (1 hand): {timeit(lambda: ms(labels)):.2f} ms")


if __name__ == "__main__":
    main()
