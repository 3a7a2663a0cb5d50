"""Stage-by-stage timing of the BATCHED pipeline (the bench throughput path).

Each stage is jitted standalone (prefix re-run included), so read the DELTA
column; per-call dispatch floor (~1 ms over the axon tunnel) rides on every
row equally.
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
from beats3d_tpu.ops import meanshift
from beats3d_tpu.models.layered import run_layered

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
    pp = pipe._pp
    fx, fy = pipe._fx, pipe._fy
    gk = pipe.gauss_kernel

    def front(raw):
        depth1, grown, g_info, _ = _preproc_front(
            raw, plane_mat, pp, fx, gk, pipe._zthr, pipe._gms, cfg)
        oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
        crops = _stencil_crops(depth1, grown, oys, oxs, cfg, h, w)
        return crops, oys, oxs

    s_front = jax.jit(lambda: jax.vmap(front)(frames))

    ch, cw = cfg.crop_h, cfg.crop_w
    r = cfg.labels_reduce
    sf = jnp.float32(w) / jnp.float32(cfg.train_dim_x)

    crops, oys, oxs = s_front()
    crops_flat = crops.reshape(2 * B, ch, cw)
    crops_flat = jax.device_put(np.asarray(crops_flat))

    def s_eval():
        return run_layered(
            crops_flat, pipe._tables, model.conditions,
            filter_specs=pipe._filter_specs, labels_reduce=r,
            scale_factor=sf, backend=pipe.backend, metas=pipe._metas,
            conditions_packed=pipe._cond_packed, num_cond=pipe._num_cond)

    s_eval_j = jax.jit(s_eval)
    lc = s_eval_j()

    def run_ms(li):
        return meanshift.mean_shift(
            li, pipe.variances, num_classes=model.num_layered_classes,
            num_rounds=cfg.mean_shift_rounds)

    s_ms = jax.jit(lambda: jax.vmap(run_ms)(lc))

    def s_full():
        return pipe.batch(frames, plane_mat)

    t_fr = timeit(s_front)
    t_ev = timeit(s_eval_j)
    t_ms = timeit(s_ms)
    t_all = timeit(s_full, iters=10)

    print(f"front (preproc+comp+crop) x{B}: {t_fr:7.2f} ms  ({t_fr/B:5.2f}/frame)")
    print(f"eval 2B={2*B} crops          : {t_ev:7.2f} ms  ({t_ev/B:5.2f}/frame)")
    print(f"meanshift 2B crops         : {t_ms:7.2f} ms  ({t_ms/B:5.2f}/frame)")
    print(f"FULL batch                 : {t_all:7.2f} ms  ({t_all/B:5.2f}/frame, {B*1e3/t_all:.0f} fps)")


if __name__ == "__main__":
    main()
