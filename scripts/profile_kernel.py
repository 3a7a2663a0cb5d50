"""Attribute fused-eval time: image-gather sweep vs table lookups vs rest.

Monkeypatches _tile_context to neuter one primitive at a time. Results are
WRONG numerically — timing only.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model, _synthetic_frame
from beats3d_tpu.runtime.pipeline import FramePipeline
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import forest_eval_pallas as fep


def timeit(f, iters=40):
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

    # crop-sized input resembling the real pipeline's crops
    h, w = 256, 384
    rng = np.random.default_rng(0)
    d = np.full((2, h, w), 65535, np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 128) ** 2 + (xx - 192) ** 2 / 2) < 100**2
    for i in range(2):
        d[i][blob] = 2300 + (yy[blob] % 40).astype(np.uint16)
    d = jnp.asarray(d)

    def ev():
        return fep.evaluate_layered_pallas(
            d, pipe._tables, pipe._metas, pipe._cond_packed, pipe._num_cond,
            filter_specs=pipe._filter_specs, labels_reduce=2,
            scale_factor=jnp.float32(1.0))

    orig_ctx = fep._tile_context
    print(f"baseline        : {timeit(ev):.2f} ms")

    def ctx_no_gather(even_ref, odd_ref, r, h, w, ty, tx):
        y_px, x_px, gip, cl = orig_ctx(even_ref, odd_ref, r, h, w, ty, tx)
        def gip2(yyu, xxu, yyv, xxv, active):
            z = jnp.zeros((fep.SUB, fep.LANE), jnp.int32)
            return (z + yyu + xxu) & 0xffff, (z + yyv + xxv) & 0xffff
        return y_px, x_px, gip2, cl

    fep._tile_context = ctx_no_gather
    print(f"no image gather : {timeit(ev):.2f} ms")

    def ctx_no_lookup(even_ref, odd_ref, r, h, w, ty, tx):
        y_px, x_px, gip, cl = orig_ctx(even_ref, odd_ref, r, h, w, ty, tx)
        def cl2(load_superchunk, g, active, dtype, num_nodes):
            row = load_superchunk(0)[0:1]
            op = jnp.broadcast_to(row, (fep.SUB, fep.LANE))
            return jnp.take_along_axis(op, jnp.clip(g, 0, 127), axis=1)
        return y_px, x_px, gip, cl2

    fep._tile_context = ctx_no_lookup
    print(f"cheap tbl lookup: {timeit(ev):.2f} ms")

    def ctx_neither(even_ref, odd_ref, r, h, w, ty, tx):
        y_px, x_px, gip, cl = ctx_no_gather(even_ref, odd_ref, r, h, w, ty, tx)
        _, _, _, cl2 = ctx_no_lookup(even_ref, odd_ref, r, h, w, ty, tx)
        return y_px, x_px, gip, cl2

    fep._tile_context = ctx_neither
    print(f"neither         : {timeit(ev):.2f} ms")
    fep._tile_context = orig_ctx


if __name__ == "__main__":
    main()
