"""The fused per-frame inference pipeline — the flagship TPU program.

One depth frame in, fingertip heights out, as a SINGLE jitted XLA program:

    raw uint16 depth (H, W)
      -> deproject to camera-space points           (ops.points)
      -> transform into calibrated plane space      (ops.points)
      -> plane-band filter + missing-pixel cleanup  (ops.points / ops.plane)
      -> missing-aware gaussian smoothing           (ops.points)
      -> mipmap shrink -> connected components +
         left/right hand selection (ON DEVICE)      (ops.components)
      -> grow + per-hand stencil (+ mirror for the left hand, which is
         evaluated through the right-hand model)    (ops.points)
      -> layered decision-forest labeling, both hands BATCHED (N=2)
      -> per-class mean-shift fingertip modes       (ops.meanshift)
      -> fingertip height above plane from the RAW depth image

The reference runs this as ~25 individual CUDA kernel launches with a mid-frame
CPU round trip for connected components and 6 device->host syncs per hand for
mean shift (3d_bz.py:133-522).  Here the host sees exactly one dispatch and one
result fetch per frame; everything else is fused by XLA.  The tap-detection
state machine (HandState) and MIDI emission stay host-side, as in the
reference.

Reference call stack being reproduced: SURVEY.md §3.1.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec

from ..models.layered import LayeredDecisionForest, run_layered
from ..ops import components, meanshift, points, preproc_pallas


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static (compile-time) pipeline parameters.  Defaults mirror the
    reference app's tunables (3d_bz.py:49-65)."""

    height: int = 480
    width: int = 848
    labels_reduce: int = 2          # 3d_bz.py:49
    gauss_sigma: float = 2.0        # 3d_bz.py:56
    gauss_kernel_size: int = 5      # 3d_bz.py:211
    depth_mm_level: int = 3         # 3d_bz.py:87
    mean_shift_rounds: int = 6      # 3d_bz.py:65
    train_dim_x: int = 848          # 3d_bz.py:74
    fingertip_label_ids: Tuple[int, ...] = (2, 3, 4, 5, 6)  # 3d_bz.py:113
    # Per-hand crop window (full-res pixels) for forest eval.  The group
    # stencil zeroes everything outside the hand, so evaluating a crop that
    # contains the whole (grown) group is EXACT — and much less data touches
    # the eval kernel + its padding preamble (kernel cost itself scales with
    # occupied tiles, not canvas).  Falls back to the full frame when a
    # hand's bbox exceeds the window.  Must be multiples of 16; crop is
    # disabled when >= the frame dims (e.g. tiny test frames).  Sized for
    # the articulated hand + forearm geometry (data/synth.py, bbox up to
    # ~440 px tall).
    crop_h: int = 448
    crop_w: int = 512
    # Worst-case guard: the Pallas eval kernel adapts its probe sweeps to
    # each tile's live depth range, so coherent frames are fast but an
    # adversarial incoherent frame (random depth everywhere) can cost ~100x.
    # When more than guard_tile_frac of the occupied label tiles have an
    # in-tile depth spread above guard_spread (0.1 mm units), that input is
    # guarded.  guard_spread <= 0 disables the guard.  guard_mode picks the
    # response:
    #   "skip" (default): PER-IMAGE — incoherent hand images are zeroed
    #     before the Pallas eval (tile compaction then skips them, ~0 cost),
    #     so their labels come back 65535/means NaN/tips invalid while every
    #     coherent image in the batch keeps full speed.  The right behavior
    #     for a live instrument: a noise frame mutes for one frame instead
    #     of stalling the stream ~100 ms.
    #   "xla": batch-level lax.cond fallback to the (spread-insensitive,
    #     exact) XLA evaluator for the WHOLE batch — the round-2 behavior,
    #     kept for exactness-first offline use.
    guard_spread: int = 1500
    guard_tile_frac: float = 0.25
    guard_mode: str = "skip"
    # Per-frame crop->full fallback budget (batched path): up to
    # fallback_budget frames whose hand exceeds the crop window are
    # re-evaluated full-frame in a second guarded dispatch while the rest of
    # the batch stays on the fast crop path; only when MORE frames overflow
    # does the whole batch fall back (round-2 behavior).  0 disables the
    # subset rescue.
    fallback_budget: int = 2
    # Fuse plane-band + gaussian into one Pallas pass (ops.preproc_pallas).
    # Default on when running on TPU (set by FramePipeline); the XLA chain
    # is kept for CPU/tests.  Both eval backends share whichever preproc is
    # selected, so Pallas-vs-XLA eval parity checks see identical inputs.
    preproc_pallas: bool = False


def _fingertip_heights(
    raw_depth, means, plane_mat, pp, focal_x, focal_y, cfg: PipelineConfig,
    fingertip_ids,
):
    """Sample each fingertip's height above the plane from the RAW depth image
    (3d_bz.py:503-522): mode pixel * labels_reduce -> raw depth -> deproject ->
    plane space -> height = -z.  Out-of-image or NaN modes are invalid."""
    h, w = raw_depth.shape
    sel = jnp.asarray(fingertip_ids, jnp.int32) - 1  # mean-shift row per tip
    # A tip id beyond the model's class count (model/config mismatch) must
    # come out invalid, not clamp to the last class's mode (caught by the
    # checkify sanitizer lane, tests/test_checkify.py).
    in_range = sel < means.shape[0]
    m = means[jnp.clip(sel, 0, means.shape[0] - 1)]  # (F, 2) float32 (x, y)
    nanmask = jnp.any(jnp.isnan(m), axis=-1)
    m_safe = jnp.where(jnp.isnan(m), -1.0, m)
    px = m_safe[:, 0].astype(jnp.int32) * cfg.labels_reduce
    py = m_safe[:, 1].astype(jnp.int32) * cfg.labels_reduce
    valid = in_range & (~nanmask) & (px >= 0) & (py >= 0) & (px < w) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    z = raw_depth[pyc, pxc].astype(jnp.float32)
    X = z * (pxc.astype(jnp.float32) - pp[0]) / focal_x
    Y = z * (pyc.astype(jnp.float32) - pp[1]) / focal_y
    pt = jnp.stack([X, Y, z, jnp.ones_like(z)], axis=-1)  # (F, 4)
    # HIGHEST: fingertip coords reach 65535 — default MXU precision would
    # round them to bf16 and corrupt heights by up to +-128 (0.1 mm units).
    ptp = jax.lax.dot(
        pt, plane_mat.T, precision=jax.lax.Precision.HIGHEST
    )
    heights = -ptp[:, 2]
    return heights, valid, jnp.stack([px, py], axis=-1)


def _band_gauss(raw_depth, plane_mat, pp, focal_x, gauss_kernel,
                plane_z_threshold, cfg: PipelineConfig):
    """Plane-band filter + missing-aware gaussian smoothing.  One fused
    Pallas pass on TPU (cfg.preproc_pallas); the XLA chain elsewhere.
    Accepts (H, W) or, on the Pallas path, (B, H, W)."""
    if cfg.preproc_pallas:
        return preproc_pallas.plane_band_gauss(
            raw_depth, plane_mat, pp, focal_x, plane_z_threshold,
            ksize=cfg.gauss_kernel_size, sigma=cfg.gauss_sigma,
        )
    depth1 = points.plane_band_depth(
        raw_depth, plane_mat, pp, focal_x, plane_z_threshold
    )
    return points.gaussian_depth_filter(depth1, gauss_kernel)


def _front_rest(depth1, group_min_size, cfg: PipelineConfig):
    """The grouping half of the front: shrink -> components -> grow."""
    small = points.shrink_image(depth1, cfg.depth_mm_level)
    groups_small, g_info = components.make_hand_groups(small, group_min_size)
    grown = points.grow_groups(groups_small)
    return grown, g_info, groups_small


def _preproc_front(raw_depth, plane_mat, pp, focal_x, gauss_kernel,
                   plane_z_threshold, group_min_size, cfg: PipelineConfig):
    """Preprocess one frame up to grouping: filtered+smoothed depth, grown
    group image, group info."""
    depth1 = _band_gauss(
        raw_depth, plane_mat, pp, focal_x, gauss_kernel,
        plane_z_threshold, cfg,
    )
    grown, g_info, groups_small = _front_rest(depth1, group_min_size, cfg)
    return depth1, grown, g_info, groups_small


def _full_stencils(depth1, grown, cfg: PipelineConfig):
    """Full-resolution per-hand depth stack (right, mirrored-left) — the
    fallback path when a hand exceeds the crop window."""
    d_right = points.stencil_depth_image_by_group(
        grown, depth1, cfg.depth_mm_level, 1
    )
    d_left = points.flip_x(
        points.stencil_depth_image_by_group(grown, depth1, cfg.depth_mm_level, 2)
    )
    return points.convert_0s_to_maxuint(jnp.stack([d_right, d_left]))


def _stencil_crops(depth1, grown, oys, oxs, cfg: PipelineConfig, h, w):
    """Per-hand stenciled crops cut straight from depth1/grown — the full-res
    stencil never materializes (~5x less stencil/convert work than
    _full_stencils).  Crop origins are multiples of the mipmap factor so the
    grown-group slice is exact; the left hand's (mirrored-space) origin maps
    to an unmirrored slice that is flipped after stenciling.  Output is
    bit-identical to cropping _full_stencils at the same origins."""
    f = 1 << cfg.depth_mm_level
    ch, cw = cfg.crop_h, cfg.crop_w
    d_r = points.crop_mm(depth1, oys[0], oxs[0], ch, cw)
    g_r = points.crop_mm(grown, oys[0] // f, oxs[0] // f, ch // f, cw // f)
    s_r = points.stencil_depth_image_by_group(g_r, d_r, cfg.depth_mm_level, 1)
    x0u = w - cw - oxs[1]
    d_l = points.crop_mm(depth1, oys[1], x0u, ch, cw)
    g_l = points.crop_mm(grown, oys[1] // f, x0u // f, ch // f, cw // f)
    s_l = points.flip_x(
        points.stencil_depth_image_by_group(g_l, d_l, cfg.depth_mm_level, 2)
    )
    return points.convert_0s_to_maxuint(jnp.stack([s_r, s_l]))


def _spread_tiles(depth_imgs, r, cfg: PipelineConfig):
    """Per-(image, tile) (occupied, over-spread) masks for the worst-case
    guard (see PipelineConfig.guard_spread): a tile is over-spread when its
    valid-depth range exceeds ``cfg.guard_spread`` — the condition that blows
    up the Pallas kernel's dynamic probe sweeps."""
    n = depth_imgs.shape[0]
    c = depth_imgs[:, ::r, ::r].astype(jnp.int32)
    hl, wl = c.shape[1], c.shape[2]
    hp = ((hl + 7) // 8) * 8
    wp = ((wl + 127) // 128) * 128
    cpad = jnp.pad(c, ((0, 0), (0, hp - hl), (0, wp - wl)))
    t = cpad.reshape(n, hp // 8, 8, wp // 128, 128)
    valid = (t > 0) & (t < 65535)
    tmin = jnp.min(jnp.where(valid, t, jnp.int32(1 << 20)), axis=(2, 4))
    tmax = jnp.max(jnp.where(valid, t, -1), axis=(2, 4))
    occupied = tmax >= 0
    spread = occupied & ((tmax - tmin) > cfg.guard_spread)
    return occupied, spread


def _incoherent(depth_imgs, r, cfg: PipelineConfig):
    """Batch-level guard predicate (guard_mode="xla"): True when the
    over-spread fraction of occupied tiles ACROSS THE WHOLE STACK exceeds
    ``cfg.guard_tile_frac``."""
    occupied, spread = _spread_tiles(depth_imgs, r, cfg)
    n_occ = jnp.maximum(occupied.sum(), 1).astype(jnp.float32)
    return spread.sum().astype(jnp.float32) / n_occ > cfg.guard_tile_frac


def _incoherent_images(depth_imgs, r, cfg: PipelineConfig):
    """PER-IMAGE guard flags (guard_mode="skip"): (N,) bool, True for images
    whose own over-spread tile fraction exceeds ``cfg.guard_tile_frac`` —
    each hand image is judged alone, so one adversarial frame cannot
    de-optimize its batchmates."""
    occupied, spread = _spread_tiles(depth_imgs, r, cfg)
    n_occ = jnp.maximum(occupied.sum(axis=(1, 2)), 1).astype(jnp.float32)
    frac = spread.sum(axis=(1, 2)).astype(jnp.float32) / n_occ
    return frac > cfg.guard_tile_frac


def _crop_origins(grown, cfg: PipelineConfig, h, w):
    """Per-hand crop origins around the grown group bbox (the left hand's
    stencil image was mirrored, so its bbox is mirrored too) and the
    exceeds-crop flag.  Origins are multiples of both the mipmap factor and
    labels_reduce so the grown-group slice and the label grid stay
    aligned."""
    ch, cw = cfg.crop_h, cfg.crop_w
    f = 1 << cfg.depth_mm_level
    if f % cfg.labels_reduce != 0:
        f *= cfg.labels_reduce

    def bbox_fullres(gid, mirrored):
        m = grown == gid
        rows = jnp.any(m, axis=1)
        cols = jnp.any(m, axis=0)
        hs, ws = m.shape
        ylo = jnp.argmax(rows).astype(jnp.int32) * f
        yhi = (hs - jnp.argmax(rows[::-1]).astype(jnp.int32)) * f
        xlo = jnp.argmax(cols).astype(jnp.int32) * f
        xhi = (ws - jnp.argmax(cols[::-1]).astype(jnp.int32)) * f
        yhi = jnp.minimum(yhi, h)
        xhi = jnp.minimum(xhi, w)
        if mirrored:
            xlo, xhi = w - xhi, w - xlo
        present = jnp.any(rows)
        return ylo, yhi, xlo, xhi, present

    def origin(lo, hi, crop, dim):
        c = (lo + hi - crop) // 2
        c = jnp.clip(c, 0, dim - crop)
        # snap to the mipmap factor so the grown-group slice in
        # _stencil_crops is exact (f is a multiple of labels_reduce)
        return (c // f) * f

    oys, oxs, too_big = [], [], jnp.bool_(False)
    for gid, mirrored in ((1, False), (2, True)):
        ylo, yhi, xlo, xhi, present = bbox_fullres(gid, mirrored)
        oys.append(origin(ylo, yhi, ch, h))
        oxs.append(origin(xlo, xhi, cw, w))
        # f-1 slack: origin snapping can shift the window up to f-1 px left
        too_big |= present & (
            (yhi - ylo > ch - f + 1) | (xhi - xlo > cw - f + 1)
        )
    return jnp.stack(oys), jnp.stack(oxs), too_big


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "filter_specs", "num_layered_classes", "backend", "metas",
        "num_cond",
    ),
)
def frame_step(
    raw_depth: jnp.ndarray,
    plane_mat: jnp.ndarray,
    pp: jnp.ndarray,
    focal_x,
    focal_y,
    layer_tables: Tuple,
    conditions: jnp.ndarray,
    variances: jnp.ndarray,
    gauss_kernel: jnp.ndarray,
    plane_z_threshold,
    group_min_size,
    layer_tables_xla: Tuple = None,
    *,
    cfg: PipelineConfig,
    filter_specs: Tuple,
    num_layered_classes: int,
    backend: str = "xla",
    metas: Tuple = None,
    conditions_packed=None,
    num_cond: int = None,
):
    """One full frame -> fingertips, as a single XLA program.

    Returns a dict of device arrays:
      labels (2, H//r, W//r) u16  — per-hand composite labels, right-hand frame
      means (2, C, 2) f32         — per-hand per-class mean-shift modes
      heights (2, F) f32          — fingertip heights above plane
      tip_valid (2, F) bool       — in-image & class-present mask
      tip_px (2, F, 2) i32        — fingertip pixel coords (full res)
      g_info (2, 3) f32           — (size, cx, cy) per hand group
      groups_small (Hs, Ws) u16   — the mipmap-level group stencil
    """
    cfgv = cfg
    h, w = raw_depth.shape

    # Preprocess to the grown group image; the per-hand stencils (the left
    # hand mirrored so the right-hand model applies, 3d_bz.py:406-414) are
    # built inside the crop/full branches so the crop path never touches the
    # full frame.
    depth1, grown, g_info, groups_small = _preproc_front(
        raw_depth, plane_mat, pp, focal_x, gauss_kernel,
        plane_z_threshold, group_min_size, cfgv,
    )

    scale_factor = jnp.float32(w) / jnp.float32(cfgv.train_dim_x)
    r = cfgv.labels_reduce
    hl, wl = h // r, w // r

    def eval_layers_fast(depth_imgs):
        return run_layered(
            depth_imgs,
            layer_tables,
            conditions,
            filter_specs=filter_specs,
            labels_reduce=cfgv.labels_reduce,
            scale_factor=scale_factor,
            backend=backend,
            metas=metas,
            conditions_packed=conditions_packed,
            num_cond=num_cond,
        )

    def eval_layers(depth_imgs):
        # Worst-case guard (PipelineConfig.guard_spread/guard_mode):
        # incoherent images either get zeroed out per image ("skip") or the
        # whole stack falls back to the spread-insensitive XLA path ("xla").
        # Returns (labels, guard_flags): flags mark images the "skip" guard
        # MUTED (labels 65535/means NaN by zeroing) so callers can tell a
        # muted frame from one with no hand.
        noflags = jnp.zeros((depth_imgs.shape[0],), jnp.bool_)
        if backend != "pallas" or cfg.guard_spread <= 0:
            return eval_layers_fast(depth_imgs), noflags
        if cfgv.guard_mode == "skip":
            flags = _incoherent_images(depth_imgs, r, cfgv)
            safe = jnp.where(
                flags[:, None, None], jnp.zeros_like(depth_imgs), depth_imgs
            )
            return eval_layers_fast(safe), flags
        if layer_tables_xla is None:
            return eval_layers_fast(depth_imgs), noflags

        def eval_layers_xla(d):
            return run_layered(
                d, layer_tables_xla, conditions, filter_specs=filter_specs,
                labels_reduce=cfgv.labels_reduce, scale_factor=scale_factor,
                backend="xla",
            )

        return jax.lax.cond(
            _incoherent(depth_imgs, r, cfgv),
            eval_layers_xla, eval_layers_fast, depth_imgs,
        ), noflags

    def run_ms(li):
        return meanshift.mean_shift(
            li,
            variances,
            num_classes=num_layered_classes,
            num_rounds=cfgv.mean_shift_rounds,
        )

    ch, cw = cfgv.crop_h, cfgv.crop_w
    use_crop = ch < h and cw < w and ch % 16 == 0 and cw % 16 == 0
    if use_crop:
        oys, oxs, too_big = _crop_origins(grown, cfgv, h, w)

        def eval_full(_):
            lab, gf = eval_layers(_full_stencils(depth1, grown, cfgv))
            # Un-mirror the left hand's labels (3d_bz.py:439-446).
            labels_screen = jnp.stack([lab[0], points.flip_x(lab[1])])
            return labels_screen, jax.vmap(run_ms)(labels_screen), gf

        def eval_cropped(_):
            crops = _stencil_crops(depth1, grown, oys, oxs, cfgv, h, w)
            lc, gf = eval_layers(crops)  # (2, ch//r, cw//r)
            canvas = jnp.full((hl, wl), 65535, lc.dtype)
            scat = [
                jax.lax.dynamic_update_slice(
                    canvas, lc[i], (oys[i] // r, oxs[i] // r)
                )
                for i in range(2)
            ]
            labels_screen = jnp.stack([scat[0], points.flip_x(scat[1])])
            # Mean shift on the crops (~4x less data); shift modes back to
            # screen coordinates.  A mirrored image yields the exactly
            # mirrored mode, so the left hand maps through x -> wl-1-x.
            m = jax.vmap(run_ms)(lc)  # (2, C, 2) crop coords
            ox_l = (oxs[:, None] // r).astype(jnp.float32)
            oy_l = (oys[:, None] // r).astype(jnp.float32)
            sx = ox_l + m[..., 0]
            sy = oy_l + m[..., 1]
            sx = sx.at[1].set((wl - 1) - sx[1])
            return labels_screen, jnp.stack([sx, sy], axis=-1), gf

        labels, ms, gmut = jax.lax.cond(
            too_big, eval_full, eval_cropped, None
        )
    else:
        lab, gmut = eval_layers(_full_stencils(depth1, grown, cfgv))
        labels = jnp.stack([lab[0], points.flip_x(lab[1])])
        ms = jax.vmap(run_ms)(labels)

    tips = [
        _fingertip_heights(
            raw_depth, ms[i], plane_mat, pp, focal_x, focal_y, cfgv,
            cfgv.fingertip_label_ids,
        )
        for i in range(2)
    ]
    heights = jnp.stack([t[0] for t in tips])
    tip_valid = jnp.stack([t[1] for t in tips])
    tip_px = jnp.stack([t[2] for t in tips])

    return {
        "labels": labels,
        "means": ms,
        "heights": heights,
        "tip_valid": tip_valid,
        "tip_px": tip_px,
        "g_info": g_info,
        "groups_small": groups_small,
        # per-hand guard verdicts: True = the incoherence guard muted this
        # hand image (labels 65535 / means NaN by construction), letting
        # consumers tell a guard-muted frame from one with no hand
        "guard_muted": gmut,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "filter_specs", "num_layered_classes", "backend", "metas",
        "num_cond",
    ),
)
def frame_step_batched(
    raw_depth: jnp.ndarray,   # (B, H, W) uint16
    plane_mat: jnp.ndarray,   # (4, 4) shared calibration (recorded session)
    pp: jnp.ndarray,
    focal_x,
    focal_y,
    layer_tables: Tuple,
    conditions: jnp.ndarray,
    variances: jnp.ndarray,
    gauss_kernel: jnp.ndarray,
    plane_z_threshold,
    group_min_size,
    layer_tables_xla: Tuple = None,
    *,
    cfg: PipelineConfig,
    filter_specs: Tuple,
    num_layered_classes: int,
    backend: str = "xla",
    metas: Tuple = None,
    conditions_packed=None,
    num_cond: int = None,
):
    """Many frames -> fingertips in ONE program — the offline/throughput path.

    All 2B hand crops run through a single fused eval dispatch and mean shift
    runs on the crops (means are exactly mirrored/offset back to screen
    coordinates; only reduction order differs from the single-frame path).
    The crop->full fallback is batch-level: if any frame's hand exceeds the
    crop window, the whole batch evaluates full-frame.

    Returns the same dict as :func:`frame_step` with a leading batch axis
    (minus groups_small).
    """
    cfgv = cfg
    b, h, w = raw_depth.shape
    r = cfgv.labels_reduce
    hl, wl = h // r, w // r
    ch, cw = cfgv.crop_h, cfgv.crop_w
    use_crop = ch < h and cw < w and ch % 16 == 0 and cw % 16 == 0

    def front(raw, d1):
        if d1 is None:
            depth1 = _band_gauss(
                raw, plane_mat, pp, focal_x, gauss_kernel,
                plane_z_threshold, cfgv,
            )
        else:
            depth1 = d1
        grown, g_info, _ = _front_rest(depth1, group_min_size, cfgv)
        if use_crop:
            oys, oxs, too_big = _crop_origins(grown, cfgv, h, w)
            crops = _stencil_crops(depth1, grown, oys, oxs, cfgv, h, w)
        else:
            oys = oxs = jnp.zeros((2,), jnp.int32)
            too_big = jnp.bool_(True)
            crops = jnp.zeros((2, 1, 1), jnp.uint16)  # unused
        return depth1, grown, crops, g_info, oys, oxs, too_big

    if cfgv.preproc_pallas:
        # One Pallas dispatch over the whole batch (grid over frames)
        # instead of a vmapped per-frame call.
        d1_all = _band_gauss(
            raw_depth, plane_mat, pp, focal_x, gauss_kernel,
            plane_z_threshold, cfgv,
        )
        depth1, grown, crops, g_info, oys, oxs, too_big = jax.vmap(
            lambda r, d: front(r, d)
        )(raw_depth, d1_all)
    else:
        depth1, grown, crops, g_info, oys, oxs, too_big = jax.vmap(
            lambda r: front(r, None)
        )(raw_depth)

    scale_factor = jnp.float32(w) / jnp.float32(cfgv.train_dim_x)

    def eval_layers_fast(depth_imgs):
        return run_layered(
            depth_imgs, layer_tables, conditions,
            filter_specs=filter_specs, labels_reduce=cfgv.labels_reduce,
            scale_factor=scale_factor, backend=backend, metas=metas,
            conditions_packed=conditions_packed, num_cond=num_cond,
        )

    def eval_layers(depth_imgs):
        # Worst-case guard (PipelineConfig.guard_spread/guard_mode).  In
        # "skip" mode the guard is PER-IMAGE: incoherent hand images are
        # zeroed (the compacted tile grid then skips them at ~0 cost, labels
        # come back 65535/tips invalid) while coherent batchmates keep full
        # speed — one adversarial frame no longer de-optimizes the batch.
        # Returns (labels, guard_flags); see the single-frame eval_layers.
        noflags = jnp.zeros((depth_imgs.shape[0],), jnp.bool_)
        if backend != "pallas" or cfgv.guard_spread <= 0:
            return eval_layers_fast(depth_imgs), noflags
        if cfgv.guard_mode == "skip":
            flags = _incoherent_images(depth_imgs, r, cfgv)
            safe = jnp.where(
                flags[:, None, None], jnp.zeros_like(depth_imgs), depth_imgs
            )
            return eval_layers_fast(safe), flags
        if layer_tables_xla is None:
            return eval_layers_fast(depth_imgs), noflags

        def eval_layers_xla(d):
            # lax.map in sub-batches: the XLA path's per-level gathers are
            # live all at once, so one 2B-image call at flagship depth
            # exceeds HBM (measured 25 G at B=16, D=16); mapping bounds the
            # live set to one sub-batch while tracing the evaluator once.
            nb = d.shape[0]
            grp = 4
            run1 = lambda x: run_layered(
                x, layer_tables_xla, conditions, filter_specs=filter_specs,
                labels_reduce=cfgv.labels_reduce, scale_factor=scale_factor,
                backend="xla",
            )
            if nb % grp:
                return run1(d)
            out = jax.lax.map(
                run1, d.reshape((nb // grp, grp) + d.shape[1:])
            )
            return out.reshape((nb,) + out.shape[2:])

        return jax.lax.cond(
            _incoherent(depth_imgs, r, cfgv),
            eval_layers_xla, eval_layers_fast, depth_imgs,
        ), noflags

    def run_ms(labels_2d):
        return meanshift.mean_shift(
            labels_2d, variances, num_classes=num_layered_classes,
            num_rounds=cfgv.mean_shift_rounds,
        )

    def full_path(_):
        hand_depth = jax.vmap(
            lambda d1, gr: _full_stencils(d1, gr, cfgv)
        )(depth1, grown)
        lab, gf = eval_layers(hand_depth.reshape(2 * b, h, w))
        lab = lab.reshape(b, 2, hl, wl)
        labels_screen = jnp.stack(
            [lab[:, 0], points.flip_x(lab[:, 1])], axis=1
        )
        means = jax.vmap(jax.vmap(run_ms))(labels_screen)
        return labels_screen, means, gf.reshape(b, 2)

    def crop_path(_):
        # Oversized-hand frames (rescued in a second dispatch below) get
        # their crops ZEROED: tile compaction then skips them, so they cost
        # ~nothing here and their garbage crops never reach the kernel.
        crops_eff = jnp.where(
            too_big[:, None, None, None], jnp.zeros_like(crops), crops
        )
        lc, gf = eval_layers(crops_eff.reshape(2 * b, ch, cw))
        lc = lc.reshape(b, 2, ch // r, cw // r)

        def scatter(lci, oy, ox, mirrored):
            out = points.scatter_mm(
                jnp.asarray(65535, lci.dtype), lci, oy // r, ox // r, hl, wl
            )
            return points.flip_x(out) if mirrored else out

        labels_screen = jnp.stack([
            jax.vmap(scatter, in_axes=(0, 0, 0, None))(
                lc[:, 0], oys[:, 0], oxs[:, 0], False
            ),
            jax.vmap(scatter, in_axes=(0, 0, 0, None))(
                lc[:, 1], oys[:, 1], oxs[:, 1], True
            ),
        ], axis=1)

        # Mean shift on the crops; shift back to screen coords.  A mirrored
        # image yields the exactly mirrored mode (the gaussian weights are
        # even in dx), so the left hand's mode maps through x -> wl-1-x.
        m = jax.vmap(jax.vmap(run_ms))(lc)  # (B, 2, C, 2) crop coords
        mx, my = m[..., 0], m[..., 1]
        ox_l = (oxs[..., None] // r).astype(jnp.float32)
        oy_l = (oys[..., None] // r).astype(jnp.float32)
        sx = ox_l + mx
        sy = oy_l + my
        sx = sx.at[:, 1].set((wl - 1) - sx[:, 1])
        means = jnp.stack([sx, sy], axis=-1)
        return labels_screen, means, gf.reshape(b, 2)

    if use_crop:
        fb = min(cfgv.fallback_budget, b)
        nbad = jnp.sum(too_big.astype(jnp.int32))

        def crop_then_rescue(_):
            """Crop path for the whole batch + a budgeted full-frame rescue
            dispatch for the (<= fb) frames whose hand exceeds the crop
            window — per-frame fallback granularity: a batch with one
            oversized hand keeps crop-path speed for the other frames
            instead of sending all of them down the full-res path."""
            ops = crop_path(None)

            def rescue(ops):
                labels_c, ms_c, gf_c = ops
                ar = jnp.arange(b, dtype=jnp.int32)
                idx = jnp.argsort(jnp.where(too_big, ar, b + ar))[:fb]
                upd = too_big[idx]  # padding rows (clean frames) are no-ops
                hand_depth = jax.vmap(
                    lambda d1, gr: _full_stencils(d1, gr, cfgv)
                )(depth1[idx], grown[idx])
                lab, gf_r = eval_layers(hand_depth.reshape(2 * fb, h, w))
                lab = lab.reshape(fb, 2, hl, wl)
                labs = jnp.stack(
                    [lab[:, 0], points.flip_x(lab[:, 1])], axis=1
                )
                means_s = jax.vmap(jax.vmap(run_ms))(labs)
                labels_out = labels_c.at[idx].set(
                    jnp.where(upd[:, None, None, None], labs, labels_c[idx])
                )
                ms_out = ms_c.at[idx].set(
                    jnp.where(upd[:, None, None, None], means_s, ms_c[idx])
                )
                gf_out = gf_c.at[idx].set(
                    jnp.where(upd[:, None], gf_r.reshape(fb, 2), gf_c[idx])
                )
                return labels_out, ms_out, gf_out

            return jax.lax.cond(nbad == 0, lambda o: o, rescue, ops)

        if fb > 0:
            labels, ms, gmut = jax.lax.cond(
                nbad <= fb, crop_then_rescue, full_path, None
            )
        else:
            labels, ms, gmut = jax.lax.cond(
                jnp.any(too_big), full_path, crop_path, None
            )
    else:
        labels, ms, gmut = full_path(None)

    def tips_one(raw, means_hand):
        return _fingertip_heights(
            raw, means_hand, plane_mat, pp, focal_x, focal_y, cfgv,
            cfgv.fingertip_label_ids,
        )

    tips = jax.vmap(
        lambda raw, m2: tuple(
            jnp.stack(z) for z in zip(*[tips_one(raw, m2[i]) for i in range(2)])
        )
    )(raw_depth, ms)

    return {
        "labels": labels,
        "means": ms,
        "heights": tips[0],
        "tip_valid": tips[1],
        "tip_px": tips[2],
        "g_info": g_info,
        # (B, 2) per-hand guard verdicts (see frame_step's guard_muted)
        "guard_muted": gmut,
    }


class FramePipeline:
    """Host-side wrapper binding a layered model + intrinsics + tunables to the
    jitted ``frame_step``.  Owns no mutable device state; every call is pure."""

    def __init__(
        self,
        model: LayeredDecisionForest,
        intrinsics,
        cfg: Optional[PipelineConfig] = None,
        mean_shift_variances: Optional[np.ndarray] = None,
        plane_z_threshold: float = 40.0,   # 3d_bz.py:54
        group_min_size: float = 0.06,      # 3d_bz.py:63
        backend: str = "auto",             # "pallas" on TPU, "xla" elsewhere
    ):
        self.model = model
        self.intrin = intrinsics
        on_tpu = jax.devices()[0].platform == "tpu"
        self.cfg = cfg or PipelineConfig(
            height=intrinsics.height, width=intrinsics.width,
            preproc_pallas=on_tpu,
        )
        if mean_shift_variances is None:
            # 3d_bz.py:108-110 — class 1 (hand) wide, fingertips tight.
            mean_shift_variances = np.array(
                [50.0] + [8.0] * (model.num_layered_classes - 1), np.float32
            )
        self.variances = jnp.asarray(mean_shift_variances)
        self.gauss_kernel = jnp.asarray(
            points.gaussian_kernel(self.cfg.gauss_kernel_size, self.cfg.gauss_sigma)
        )
        self.plane_z_threshold = plane_z_threshold
        self.group_min_size = group_min_size
        if backend == "auto":
            backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        if backend == "pallas" and not model.pallas_supported():
            backend = "xla"  # >128-row conditions: use the XLA composite
        self.backend = backend
        if backend == "pallas":
            self._tables = model.layer_tables_pallas()
            self._metas = model.layer_metas()
            self._cond_packed = model.conditions_packed()
            self._num_cond = int(np.asarray(model.conditions_np).shape[0])
            # XLA tables ride along only for the "xla" guard mode's in-jit
            # fallback; "skip" mode needs none (it zeroes guarded images
            # instead), which also removes the XLA evaluator branch from the
            # compiled program — less HBM and compile time.
            self._tables_xla = (
                model.layer_tables()
                if self.cfg.guard_spread > 0 and self.cfg.guard_mode == "xla"
                else None
            )
        else:
            self._tables = model.layer_tables()
            self._metas = None
            self._cond_packed = None
            self._num_cond = None
            self._tables_xla = None
        self._filter_specs = tuple(
            (l.filter_model, l.filter_model_class) for l in model.layers
        )
        # Per-call device constants, uploaded once (each jnp.asarray in the
        # call path costs a host->device transfer per frame otherwise).
        self._pp = jnp.asarray(self.intrin.pp)
        self._fx = jnp.float32(self.intrin.fx)
        self._fy = jnp.float32(self.intrin.fy)
        self._zthr = jnp.float32(self.plane_z_threshold)
        self._gms = jnp.float32(self.group_min_size)

    def __call__(self, raw_depth, plane_mat):
        return frame_step(
            raw_depth,
            plane_mat,
            self._pp,
            self._fx,
            self._fy,
            self._tables,
            self.model.conditions,
            self.variances,
            self.gauss_kernel,
            self._zthr,
            self._gms,
            self._tables_xla,
            cfg=self.cfg,
            filter_specs=self._filter_specs,
            num_layered_classes=self.model.num_layered_classes,
            backend=self.backend,
            metas=self._metas,
            conditions_packed=self._cond_packed,
            num_cond=self._num_cond,
        )

    def batch_sharded(self, raw_depths, plane_mat, mesh, axis: str = "data"):
        """Multi-chip throughput path: frames sharded over ``mesh[axis]``.

        Per-frame inference is embarrassingly data-parallel (the reference is
        single-GPU by construction, SURVEY.md §2.6/§5.8): each chip runs the
        full fused pipeline — preproc, grouping, crop, layered forest eval,
        mean shift, fingertip heights — on its frame slice with the model
        tables replicated, and no collectives are needed.  ``raw_depths``
        (B, H, W) with B divisible by the axis size; returns the same dict as
        :func:`frame_step_batched`, outputs sharded over the batch axis.
        """
        from jax import shard_map

        def local(d, m):
            return self.batch(d, m)

        out_shapes = jax.eval_shape(local, raw_depths, plane_mat)
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(PartitionSpec(axis), PartitionSpec()),
            out_specs=jax.tree.map(
                lambda _: PartitionSpec(axis), out_shapes
            ),
            check_vma=False,
        )
        return fn(raw_depths, plane_mat)

    def batch(self, raw_depths, plane_mat):
        """Throughput path: (B, H, W) frames with one shared plane
        calibration -> batched outputs (see :func:`frame_step_batched`)."""
        return frame_step_batched(
            raw_depths,
            plane_mat,
            self._pp,
            self._fx,
            self._fy,
            self._tables,
            self.model.conditions,
            self.variances,
            self.gauss_kernel,
            self._zthr,
            self._gms,
            self._tables_xla,
            cfg=self.cfg,
            filter_specs=self._filter_specs,
            num_layered_classes=self.model.num_layered_classes,
            backend=self.backend,
            metas=self._metas,
            conditions_packed=self._cond_packed,
            num_cond=self._num_cond,
        )
