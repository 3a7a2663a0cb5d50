"""Attribution inside the BATCHED front path (preproc/components/crop)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model, _synthetic_frame
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _crop_origins, _stencil_crops,
)
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import components, points

B = 16


def timeit(f, iters=30):
    o = f()
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


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

    def preproc(raw):
        d1 = points.plane_band_depth(raw, plane_mat, pp, fx, pipe._zthr)
        return points.gaussian_depth_filter(d1, gk)

    s_pre = jax.jit(lambda: jax.vmap(preproc)(frames))
    d1 = s_pre()

    def shrink(d):
        return points.shrink_image(d, cfg.depth_mm_level)

    s_shr = jax.jit(lambda: jax.vmap(shrink)(d1))
    small = s_shr()

    def comp(s):
        return components.make_hand_groups(s, pipe._gms)

    s_cmp = jax.jit(lambda: jax.vmap(comp)(small))
    g, gi = s_cmp()

    s_grow = jax.jit(lambda: jax.vmap(points.grow_groups)(g))
    grown = s_grow()

    def origins(gr):
        return _crop_origins(gr, cfg, h, w)

    s_org = jax.jit(lambda: jax.vmap(origins)(grown))
    oys, oxs, _ = s_org()

    def crops_only(d, gr, oy, ox):
        return _stencil_crops(d, gr, oy, ox, cfg, h, w)

    s_crp = jax.jit(lambda: jax.vmap(crops_only)(d1, grown, oys, oxs))
    s_crp_scan = jax.jit(lambda: jax.lax.map(
        lambda a: crops_only(*a), (d1, grown, oys, oxs)))

    print(f"preproc x{B}   : {timeit(s_pre):7.2f} ms")
    print(f"shrink        : {timeit(s_shr):7.2f} ms")
    print(f"components    : {timeit(s_cmp):7.2f} ms")
    print(f"grow          : {timeit(s_grow):7.2f} ms")
    print(f"origins       : {timeit(s_org):7.2f} ms")
    print(f"crops (vmap)  : {timeit(s_crp):7.2f} ms")
    print(f"crops (scan)  : {timeit(s_crp_scan):7.2f} ms")


if __name__ == "__main__":
    main()
