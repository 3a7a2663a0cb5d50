"""Stage split of the NEW bench headline (trained flagship model, two-hand
scene, B=16): front vs fused layered eval (per layer) vs mean shift/rest.
Chain-extrapolated marginal costs (see profile_steady.py) to strip tunnel
overhead.  Run on the chip from the repo root."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from bench import _scene_hands, load_flagship
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, _band_gauss, _front_rest, _crop_origins, _stencil_crops,
)
from beats3d_tpu.models.layered import run_layered
from beats3d_tpu.ops import forest_eval_pallas as fep
from beats3d_tpu.ops import meanshift

B = 16
N = 30


def marginal(fn, *args, n=N):
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
    model = load_flagship()
    pipe = FramePipeline(model, intrin)
    cfg = pipe.cfg
    h, w = intrin.height, intrin.width
    frames = jnp.asarray(np.stack([_scene_hands(intrin, t) for t in range(B)]))

    from beats3d_tpu.ops import plane as plane_ops
    from beats3d_tpu.ops import points as points_ops
    pts = jax.jit(points_ops.deproject_points)(frames[0], pipe._pp, pipe._fx)
    plane_mat = plane_ops.CalibratedPlane(25000, 40.0).make(pts)

    print(f"full batch (B={B}):  {marginal(pipe.batch, frames, plane_mat):8.3f} ms",
          flush=True)

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
    print(f"front (preproc+components+crops): {marginal(front, frames):8.3f} ms",
          flush=True)
    print("too_big any:", bool(np.asarray(too_big).any()),
          "g_info[0]:", np.asarray(g_info)[0], flush=True)

    ch, cw = cfg.crop_h, cfg.crop_w
    flat_crops = crops.reshape(2 * B, ch, cw)
    sf = jnp.float32(w / cfg.train_dim_x)

    @jax.jit
    def eval_both(fc):
        return run_layered(
            fc, pipe._tables, model.conditions,
            filter_specs=pipe._filter_specs, labels_reduce=cfg.labels_reduce,
            scale_factor=sf, backend=pipe.backend, metas=pipe._metas,
            conditions_packed=pipe._cond_packed, num_cond=pipe._num_cond,
        )

    lab = eval_both(flat_crops)
    print(f"layered eval (2B={2*B} crops {ch}x{cw}): "
          f"{marginal(eval_both, flat_crops):8.3f} ms", flush=True)

    # layer 0 (coarse D=8) alone on the same crops
    t0_tables = (pipe._tables[0],)
    m0 = (pipe._metas[0],) if pipe._metas else None

    @jax.jit
    def eval_l0(fc):
        return run_layered(
            fc, t0_tables, model.conditions, filter_specs=((None, None),),
            labels_reduce=cfg.labels_reduce, scale_factor=sf,
            backend=pipe.backend, metas=m0,
            conditions_packed=None, num_cond=None,
        )

    try:
        eval_l0(flat_crops)
        print(f"  layer0 (coarse D=8) alone: {marginal(eval_l0, flat_crops):8.3f} ms",
              flush=True)
    except Exception as e:
        print("  layer0 alone failed:", repr(e), flush=True)

    # mean shift on the labels
    hl, wl = ch // cfg.labels_reduce, cw // cfg.labels_reduce
    lab2 = lab.reshape(B, 2, hl, wl)

    @jax.jit
    def ms(lab2):
        def run1(l):
            return meanshift.mean_shift(
                l, pipe.variances, num_classes=model.num_layered_classes,
                num_rounds=cfg.mean_shift_rounds)
        return jax.vmap(jax.vmap(run1))(lab2)

    ms(lab2)
    print(f"mean shift (2B crops): {marginal(ms, lab2):8.3f} ms", flush=True)

    occ = np.asarray(lab) != 65535
    print("label occupancy per crop:", occ.reshape(2 * B, -1).mean(1)[:4])


if __name__ == "__main__":
    main()
