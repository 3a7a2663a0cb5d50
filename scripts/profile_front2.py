"""Delta attribution of the FUSED batched front: re-time the whole fused
front with individual pieces neutered (XLA fuses aggressively, so standalone
sub-stage timings are misleading — only whole-graph deltas are trustworthy).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model, _synthetic_frame
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _preproc_front, _crop_origins, _stencil_crops,
)
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import components, points

B = 16


def timeit(f, iters=60, reps=3):
    o = f()
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f()
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)
    cfg = pipe.cfg
    h, w = intrin.height, intrin.width
    frames = jnp.asarray(np.stack([np.asarray(_synthetic_frame(intrin))] * B))
    plane_mat = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
        np.float32))
    pp, fx = pipe._pp, pipe._fx
    gk = pipe.gauss_kernel

    def front(raw, *, gauss=True, band=True, crop=True, comp=True):
        if band:
            d1 = points.plane_band_depth(raw, plane_mat, pp, fx, pipe._zthr)
        else:
            d1 = raw
        if gauss:
            d1 = points.gaussian_depth_filter(d1, gk)
        small = points.shrink_image(d1, cfg.depth_mm_level)
        if comp:
            g, g_info = components.make_hand_groups(small, pipe._gms)
        else:
            g = (small > 0).astype(jnp.uint16)
            g_info = jnp.zeros((2, 3), jnp.float32)
        grown = points.grow_groups(g)
        oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
        if crop:
            crops = _stencil_crops(d1, grown, oys, oxs, cfg, h, w)
        else:
            crops = jnp.zeros((2, cfg.crop_h, cfg.crop_w), jnp.uint16)
        return crops, oys, oxs, g_info

    def front_barrier(raw):
        d1 = points.plane_band_depth(raw, plane_mat, pp, fx, pipe._zthr)
        d1 = jax.lax.optimization_barrier(d1)
        d1 = points.gaussian_depth_filter(d1, gk)
        small = points.shrink_image(d1, cfg.depth_mm_level)
        g, g_info = components.make_hand_groups(small, pipe._gms)
        grown = points.grow_groups(g)
        oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
        crops = _stencil_crops(d1, grown, oys, oxs, cfg, h, w)
        return crops, oys, oxs, g_info

    for name, kw in [
        ("full", {}),
        ("barrier", None),
        ("-gauss", dict(gauss=False)),
        ("-band", dict(band=False)),
        ("-crop", dict(crop=False)),
        ("-comp", dict(comp=False)),
        ("-gauss-band", dict(gauss=False, band=False)),
    ]:
        if kw is None:
            fn = jax.jit(lambda: jax.vmap(front_barrier)(frames))
        else:
            fn = jax.jit(lambda kw=kw: jax.vmap(
                lambda r: front(r, **kw))(frames))
        print(f"front {name:12s}: {timeit(fn):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
