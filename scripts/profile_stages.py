"""Stage-by-stage in-context timing of the frame pipeline on TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import entry, _synthetic_layered_model, _synthetic_frame
from beats3d_tpu.runtime.pipeline import FramePipeline, PipelineConfig, frame_step
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import components, meanshift, points
from beats3d_tpu.models.layered import run_layered


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
    cfg = pipe.cfg
    depth = jnp.asarray(_synthetic_frame(intrin))
    plane_mat = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
        np.float32))
    pp = jnp.asarray(intrin.pp)
    fx, fy = jnp.float32(intrin.fx), jnp.float32(intrin.fy)
    gk = pipe.gauss_kernel

    @jax.jit
    def s_preproc(raw, pm):
        pts = points.deproject_points(raw, pp, fx)
        q = points.transform_points(pts, pm)
        qf = points.filter_points_by_plane(q, jnp.float32(40.0))
        d1 = points.remove_missing_3d_points_from_depth_image(qf, raw)
        d1 = points.gaussian_depth_filter(d1, gk)
        return d1

    @jax.jit
    def s_comp(raw, pm):
        d1 = s_preproc(raw, pm)
        small = points.shrink_image(d1, cfg.depth_mm_level)
        g, gi = components.make_hand_groups(small, jnp.float32(0.06))
        return g, gi, d1

    @jax.jit
    def s_stencil(raw, pm):
        g, gi, d1 = s_comp(raw, pm)
        grown = points.grow_groups(g)
        d_r = points.stencil_depth_image_by_group(grown, d1, cfg.depth_mm_level, 1)
        d_l = points.flip_x(points.stencil_depth_image_by_group(grown, d1, cfg.depth_mm_level, 2))
        hd = points.convert_0s_to_maxuint(jnp.stack([d_r, d_l]))
        return hd, grown, gi

    @jax.jit
    def s_crop(raw, pm):
        hd, grown, gi = s_stencil(raw, pm)
        # replicate crop origins
        f = 1 << cfg.depth_mm_level
        h, w = raw.shape
        outs = []
        for gid, mir in ((1, False), (2, True)):
            m = grown == gid
            rows = jnp.any(m, axis=1); cols = jnp.any(m, axis=0)
            hs, ws = m.shape
            ylo = jnp.argmax(rows).astype(jnp.int32) * f
            yhi = (hs - jnp.argmax(rows[::-1]).astype(jnp.int32)) * f
            xlo = jnp.argmax(cols).astype(jnp.int32) * f
            xhi = (ws - jnp.argmax(cols[::-1]).astype(jnp.int32)) * f
            if mir:
                xlo, xhi = w - xhi, w - xlo
            oy = jnp.clip((ylo + yhi - cfg.crop_h) // 2, 0, h - cfg.crop_h) // 2 * 2
            ox = jnp.clip((xlo + xhi - cfg.crop_w) // 2, 0, w - cfg.crop_w) // 2 * 2
            outs.append((oy, ox))
        crops = jnp.stack([
            jax.lax.dynamic_slice(hd[i], (outs[i][0], outs[i][1]), (cfg.crop_h, cfg.crop_w))
            for i in range(2)])
        return crops, outs

    @jax.jit
    def s_eval(raw, pm):
        crops, _ = s_crop(raw, pm)
        lc = run_layered(
            crops, pipe._tables, model.conditions,
            filter_specs=pipe._filter_specs, labels_reduce=2,
            scale_factor=jnp.float32(1.0), backend=pipe.backend,
            metas=pipe._metas, conditions_packed=pipe._cond_packed,
            num_cond=pipe._num_cond)
        return lc

    @jax.jit
    def s_ms(lc):
        return jax.vmap(lambda li: meanshift.mean_shift(
            li, pipe.variances, num_classes=model.num_layered_classes,
            num_rounds=6))(lc)

    fn, _ = entry()

    t_pre = timeit(lambda: s_preproc(depth, plane_mat))
    t_cmp = timeit(lambda: s_comp(depth, plane_mat))
    t_stn = timeit(lambda: s_stencil(depth, plane_mat))
    t_crp = timeit(lambda: s_crop(depth, plane_mat))
    t_evl = timeit(lambda: s_eval(depth, plane_mat))
    lc = s_eval(depth, plane_mat)
    t_ms = timeit(lambda: s_ms(lc))
    t_all = timeit(lambda: fn(depth, plane_mat))

    print(f"preproc              : {t_pre:6.2f} ms")
    print(f"+components          : {t_cmp:6.2f} ms (delta {t_cmp-t_pre:5.2f})")
    print(f"+stencil             : {t_stn:6.2f} ms (delta {t_stn-t_cmp:5.2f})")
    print(f"+crop                : {t_crp:6.2f} ms (delta {t_crp-t_stn:5.2f})")
    print(f"+eval(crop)          : {t_evl:6.2f} ms (delta {t_evl-t_crp:5.2f})")
    print(f"meanshift (full 2x)  : {t_ms:6.2f} ms")
    print(f"FULL pipeline        : {t_all:6.2f} ms")
    # crop label tile occupancy
    lcn = np.asarray(lc)
    print("crop labels shape", lcn.shape, "nonbg px:", (lcn != 65535).sum())


if __name__ == "__main__":
    main()
