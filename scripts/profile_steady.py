"""Steady-state stage costs via LONG dispatch chains.

Over the axon tunnel each dispatch/fetch carries host overhead that dwarfs
small stages; chaining N dispatches and fetching once, then comparing N and
2N, isolates the true marginal device cost per iteration:
    per_iter = (t(2N) - t(N)) / N
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model, _synthetic_frame, entry
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _band_gauss, _front_rest, _crop_origins, _stencil_crops,
)
from beats3d_tpu.models.layered import run_layered
from beats3d_tpu.ops import meanshift

B = 16
N = 50


def marginal(fn, *args, n=N):
    """Marginal per-iteration cost from chain-length extrapolation."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)

    def chain(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        return time.perf_counter() - t0

    chain(3)
    t1 = min(chain(n), chain(n))
    t2 = min(chain(2 * n), chain(2 * n))
    return (t2 - t1) / n * 1e3


def main():
    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)
    cfg = pipe.cfg
    h, w = intrin.height, intrin.width
    frames = jnp.asarray(np.stack([np.asarray(_synthetic_frame(intrin))] * B))
    # identical plane to bench.py: entry() calibrates it
    _, (_, plane_mat) = entry()

    noop = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8, 128), jnp.float32)
    print(f"dispatch overhead (noop): {marginal(noop, x0, n=200):8.3f} ms")

    print(f"full batch (B={B}):       {marginal(pipe.batch, frames, plane_mat):8.3f} ms")

    @jax.jit
    def band_only(raw):
        return _band_gauss(raw, plane_mat, pipe._pp, pipe._fx,
                           pipe.gauss_kernel, pipe._zthr, cfg)

    print(f"  band+gauss:             {marginal(band_only, frames):8.3f} ms")

    d1_all = band_only(frames)

    @jax.jit
    def comps_only(d1_all):
        return jax.vmap(lambda d1: _front_rest(d1, pipe._gms, cfg))(d1_all)

    print(f"  shrink+components+grow: {marginal(comps_only, d1_all):8.3f} ms")

    grown_all, g_info, _ = comps_only(d1_all)

    @jax.jit
    def crops_only(d1_all, grown_all):
        def one(d1, grown):
            oys, oxs, too_big = _crop_origins(grown, cfg, h, w)
            return _stencil_crops(d1, grown, oys, oxs, cfg, h, w)
        return jax.vmap(one)(d1_all, grown_all)

    print(f"  origins+stencilcrops:   {marginal(crops_only, d1_all, grown_all):8.3f} ms")

    crops = crops_only(d1_all, grown_all)
    ch, cw = cfg.crop_h, cfg.crop_w
    flat_crops = jax.device_put(np.asarray(crops.reshape(2 * B, ch, cw)))
    sf = jnp.float32(w) / jnp.float32(cfg.train_dim_x)

    @jax.jit
    def eval_only(fc):
        return run_layered(
            fc, pipe._tables, model.conditions,
            filter_specs=pipe._filter_specs, labels_reduce=cfg.labels_reduce,
            scale_factor=sf, backend="pallas", metas=pipe._metas,
            conditions_packed=pipe._cond_packed, num_cond=pipe._num_cond)

    print(f"  fused eval (32 crops):  {marginal(eval_only, flat_crops):8.3f} ms")

    lab = eval_only(flat_crops)

    @jax.jit
    def ms_only(lc):
        def one(li):
            return meanshift.mean_shift(
                li, pipe.variances, num_classes=model.num_layered_classes,
                num_rounds=cfg.mean_shift_rounds)
        return jax.vmap(one)(lc)

    print(f"  mean shift (32 crops):  {marginal(ms_only, lab):8.3f} ms")


if __name__ == "__main__":
    main()
