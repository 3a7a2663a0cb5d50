"""Workload-scaling decomposition of the flagship eval plateau: coarse-only
vs full model, and crop-count scaling (per-tile work vs per-call floor).

Runs in ONE process (env knobs fixed), several compiled variants.
"""
import os
import time

import numpy as np

os.environ.setdefault("B3D_EVAL_ROWS", "8")
os.environ.setdefault("B3D_EVAL_KC", "3")
os.environ.setdefault("B3D_EVAL_STATCHUNKS", "3")
os.environ.setdefault("B3D_EVAL_BASE1", "1")

import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from scripts.profile_flagship_batch import load_flagship, B
from scripts.flagship_e2e import scene
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _preproc_front, _crop_origins, _stencil_crops)
from beats3d_tpu.models.layered import run_layered
from beats3d_tpu.ops import forest_eval_pallas as fep


def timeit(fn, n=30):
    o = fn(); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn()
    np.asarray(o)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    intrin = CameraIntrinsics.d415()
    model = load_flagship()
    pipe = FramePipeline(model, intrin)
    cfg = pipe.cfg
    h, w = intrin.height, intrin.width
    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.stack(
        [scene(intrin, t, rng)[0] for t in range(B)]))
    plane_mat = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
        np.float32))

    def front(raw):
        depth1, grown, g_info, _ = _preproc_front(
            raw, plane_mat, pipe._pp, pipe._fx, pipe.gauss_kernel,
            pipe._zthr, pipe._gms, cfg)
        oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
        return _stencil_crops(depth1, grown, oys, oxs, cfg, h, w)

    crops = jax.jit(lambda: jax.vmap(front)(frames))()
    crops_flat = jax.device_put(
        np.asarray(crops.reshape(2 * B, cfg.crop_h, cfg.crop_w)))
    sf = jnp.float32(w) / jnp.float32(cfg.train_dim_x)

    def ev(d, tables, metas, fspecs):
        return run_layered(
            d, tables, model.conditions,
            filter_specs=fspecs, labels_reduce=cfg.labels_reduce,
            scale_factor=sf, backend="pallas", metas=metas,
            conditions_packed=pipe._cond_packed, num_cond=pipe._num_cond)

    # full model, crop-count scaling
    for n in (8, 16, 32):
        d = crops_flat[:n]
        f = jax.jit(lambda d=d: ev(
            d, pipe._tables, pipe._metas, pipe._filter_specs))
        print(f"full model, {n:2d} crops: {timeit(f):7.2f} ms", flush=True)

    # coarse layer only
    t0_ = (pipe._tables[0],)
    m0 = (pipe._metas[0],)
    f = jax.jit(lambda: ev(crops_flat, t0_, m0, ((None, None),)))
    print(f"coarse only, 32 crops: {timeit(f):7.2f} ms", flush=True)

    # fine layer only, UNFILTERED (every eligible pixel walks D=16)
    t1_ = (pipe._tables[1],)
    m1 = (pipe._metas[1],)
    f = jax.jit(lambda: ev(crops_flat, t1_, m1, ((None, None),)))
    print(f"fine only (unfiltered), 32 crops: {timeit(f):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
