"""Stage split of the BENCH workload (synthetic adversarial model, B=16):
front (preproc+components+crops) vs fused layered eval vs the rest.
One fetch per timing loop; dispatch-chained to amortize the tunnel.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model, _synthetic_frame
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _band_gauss, _front_rest, _crop_origins, _stencil_crops,
)
from beats3d_tpu.ops import forest_eval_pallas as fep
from beats3d_tpu.models import layered as layered_mod

B = 16


def timeit(fn, *args, iters=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)
    cfg = pipe.cfg
    frames = jnp.asarray(np.stack([np.asarray(_synthetic_frame(intrin))] * B))
    # Calibrate like entry() does — the flat plane forces full-frame eval.
    from beats3d_tpu.ops import plane as plane_ops
    from beats3d_tpu.ops import points as points_ops
    pts = jax.jit(points_ops.deproject_points)(
        frames[0], pipe._pp, pipe._fx)
    plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

    print("full batch:", timeit(pipe.batch, frames, plane_mat), "ms")

    h, w = intrin.height, intrin.width

    @jax.jit
    def front(raw):
        d1_all = _band_gauss(raw, plane_mat, pipe._pp, pipe._fx,
                             pipe.gauss_kernel, pipe._zthr, cfg)

        def one(d1):
            grown, g_info, _ = _front_rest(d1, pipe._gms, cfg)
            oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
            crops = _stencil_crops(d1, grown, oys, oxs, cfg, h, w)
            return crops, g_info, oys, oxs, too_big

        return jax.vmap(one)(d1_all)

    crops, g_info, oys, oxs, too_big = front(frames)
    print("front (preproc+components+crops):", timeit(front, frames), "ms")

    @jax.jit
    def band_only(raw):
        return _band_gauss(raw, plane_mat, pipe._pp, pipe._fx,
                           pipe.gauss_kernel, pipe._zthr, cfg)

    print("  band+gauss only:", timeit(band_only, frames), "ms")

    d1_all = band_only(frames)

    @jax.jit
    def rest_only(d1_all):
        def one(d1):
            grown, g_info, _ = _front_rest(d1, pipe._gms, cfg)
            oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
            crops = _stencil_crops(d1, grown, oys, oxs, cfg, h, w)
            return crops, g_info
        return jax.vmap(one)(d1_all)

    print("  components+crops only:", timeit(rest_only, d1_all), "ms")

    ch, cw = cfg.crop_h, cfg.crop_w
    flat_crops = jnp.reshape(crops, (2 * B, ch, cw))
    scale = jnp.float32(w) / jnp.float32(cfg.train_dim_x)

    @jax.jit
    def eval_only(fc):
        return fep.evaluate_layered_pallas(
            fc, pipe._tables, pipe._metas, pipe._cond_packed, pipe._num_cond,
            filter_specs=pipe._filter_specs, labels_reduce=cfg.labels_reduce,
            scale_factor=scale,
        )

    print("fused layered eval (32 crops):", timeit(eval_only, flat_crops),
          "ms")

    # eval without the incoherence guard branch etc — direct kernel
    lab = eval_only(flat_crops)
    n_occ = int(np.asarray(
        ((flat_crops[:, ::2, ::2] != 0) & (flat_crops[:, ::2, ::2] != 65535))
        .reshape(2 * B, 160 // 8, 8, -1, 128).any(axis=(2, 4)).sum()))
    print("occupied tiles:", n_occ, "of", 2 * B * 20 *
          ((cw // 2 + 127) // 128))

    # mean shift on crops
    from beats3d_tpu.ops import meanshift

    @jax.jit
    def ms_only(lc):
        def one(li):
            return meanshift.mean_shift(
                li, pipe.variances, num_classes=model.num_layered_classes,
                num_rounds=cfg.mean_shift_rounds)
        return jax.vmap(one)(lc)

    lc = lab.reshape(B, 2, 160, cw // 2)
    print("mean shift (B x 2 crops):",
          timeit(ms_only, lab.reshape(2 * B, 160, cw // 2)), "ms")


if __name__ == "__main__":
    main()
