"""Upside check: per-frame cost of the eval kernel + preprocess at batch
sizes 1..16 (hand-pairs, so B frames = 2B crop images)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model
from beats3d_tpu.runtime.pipeline import FramePipeline
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import forest_eval_pallas as fep
from beats3d_tpu.ops import points, meanshift


def timeit(f, iters=30):
    o = f(); np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)

    h, w = 256, 384
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 128) ** 2 + (xx - 192) ** 2 / 2) < 100 ** 2
    one = np.full((h, w), 65535, np.uint16)
    one[blob] = 2300 + (yy[blob] % 40).astype(np.uint16)

    for b in (2, 4, 8, 16, 32):
        d = jnp.asarray(np.stack([one] * b))
        fn = lambda: fep.evaluate_layered_pallas(
            d, pipe._tables, pipe._metas, pipe._cond_packed, pipe._num_cond,
            filter_specs=pipe._filter_specs, labels_reduce=2,
            scale_factor=jnp.float32(1.0))
        t = timeit(fn)
        print(f"eval crops B={b:2d}: {t:7.2f} ms total, {t/(b/2):6.2f} ms/frame")

    # preprocess batched (elementwise chain at full res)
    gk = pipe.gauss_kernel
    pp, fx = jnp.asarray(intrin.pp), jnp.float32(intrin.fx)
    raw = np.full((480, 848), 2600, np.uint16)
    pm = jnp.asarray(np.diag(np.array([1, 1, 1, 1], np.float32)))

    @jax.jit
    def pre1(rawb, pm):
        def f(rw):
            pts = points.deproject_points(rw, pp, fx)
            q = points.transform_points(pts, pm)
            qf = points.filter_points_by_plane(q, jnp.float32(40.0))
            d1 = points.remove_missing_3d_points_from_depth_image(qf, rw)
            d1 = points.gaussian_depth_filter(d1, gk)
            return points.shrink_image(d1, 3)
        return jax.vmap(f)(rawb)

    for b in (1, 4, 8, 16):
        rb = jnp.asarray(np.stack([raw] * b))
        t = timeit(lambda: pre1(rb, pm))
        print(f"preproc B={b:2d}: {t:7.2f} ms total, {t/b:6.2f} ms/frame")

    # mean shift on crop labels, batched
    lab = np.where(one == 65535, 65535, (yy % 7 + 1)).astype(np.uint16)[::2, ::2]
    for b in (2, 8, 16):
        lb = jnp.asarray(np.stack([lab] * b))
        f = jax.jit(lambda l: jax.vmap(lambda li: meanshift.mean_shift(
            li, pipe.variances, num_classes=model.num_layered_classes,
            num_rounds=6))(l))
        t = timeit(lambda: f(lb))
        print(f"meanshift crop B={b:2d}: {t:7.2f} ms total, {t/(b/2):6.2f} ms/frame")


if __name__ == "__main__":
    main()
