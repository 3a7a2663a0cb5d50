"""Dataset generation: recorded (depth + color) sessions -> labeled training
data (reference src/live_data_convert.py:40-488).

Per frame: deproject -> RANSAC plane (recomputed every 20 frames) -> plane-band
filter -> random in-plane augmentation (scale/skew/rotate/translate about the
cloud's plane-space centroid) -> re-render depth+color (point-splat z-buffer +
hole fill instead of the reference's GL triangle pass; ops/render.py) ->
optional mask-forest background rejection -> color-EM palette fit (first
frame) -> nearest-palette label ids -> PNGs + config.json in the reference
dataset format.

All per-frame compute is one jit; only PNG encoding is host work.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forest import DecisionForest
from ..ops import colors as colors_ops
from ..ops import forest_eval, plane as plane_ops, points, render

MAX_UINT16 = 65535


@dataclasses.dataclass
class DatagenConfig:
    num_colors: int = 4
    color_em_tries: int = 8          # live_data_convert.py:73
    color_em_iterations: int = 32    # :74
    plane_candidates: int = 25000    # :76
    plane_z_threshold: float = 40.0
    frames_per_recompute_plane: int = 20  # :85
    scale_variance: float = 0.1      # :64
    scale_skew_variance: float = 0.0
    rotate_variance: float = 0.0
    translate_variance: float = 0.0
    # Pre-rerender depth smoothing sigma (>0.1 enables; k_size=15), applied to
    # the plane-filtered depth image and re-deprojected before augmentation
    # (live_data_convert.py:381-391; NOTE the reference computes this filter
    # but lets the re-render overwrite it — here the smoothed surface actually
    # feeds the re-render, which is the evident intent of the flag).
    gaussian_noise: float = 0.0
    # Reject depth/color pairs whose capture timestamps diverge by more than
    # this many MILLISECONDS (live_data_convert.py:306-317).
    frames_timestamp_max_diff: float = 6.0
    max_images: Optional[int] = None
    mask_label: Optional[int] = None


def _aug_transform(plane_mat, center, scale, skew, rotate, translate):
    """The reference's augmentation matrix (live_data_convert.py:267-274):
    rotate about camera z, go to plane space, recenter, scale/skew/translate,
    restore, back to camera space."""
    def T(v):
        m = np.eye(4, dtype=np.float64)
        m[:3, 3] = v
        return m

    def S(v):
        return np.diag(list(v) + [1.0])

    c, s = np.cos(rotate), np.sin(rotate)
    R = np.eye(4)
    R[0, 0], R[0, 1], R[1, 0], R[1, 1] = c, -s, s, c

    pm = np.asarray(plane_mat, np.float64)
    m = (
        np.linalg.inv(pm)
        @ T(center[:3])
        @ T(translate)
        @ S(scale + skew)
        @ T(-center[:3])
        @ pm
        @ R
    )
    return m.astype(np.float32)


@jax.jit
def _prep_frame(depth, plane_mat, pp, focal, threshold):
    """Deproject, plane-filter, and return (pts, plane-space centroid)."""
    pts = points.deproject_points(depth, pp, focal)
    q = points.transform_points(pts, plane_mat)
    qf = points.filter_points_by_plane(q, threshold)
    total = jnp.sum(qf.reshape(-1, 4), axis=0)
    center = total / jnp.where(total[3] == 0, 1.0, total[3])
    return qf, center


@jax.jit
def _rerender(pts_plane, colors, inv_plane, aug, pp, focal):
    """Back to camera space, augment, splat, hole-fill."""
    cam = points.transform_points(pts_plane, inv_plane)
    cam = points.transform_points(cam, aug)
    d, c = render.splat_points(cam, colors, pp, focal)
    return render.fill_holes(d, c)


@jax.jit
def _rerender_smoothed(pts_plane, colors, inv_plane, aug, kernel, pp, focal):
    """Like :func:`_rerender`, but the camera-space cloud is re-sampled
    through a gaussian-smoothed depth image first (depths_from_points ->
    gaussian_depth_filter -> deproject; live_data_convert.py:374-391)."""
    cam = points.transform_points(pts_plane, inv_plane)
    d = points.depths_from_points(cam)
    d = points.gaussian_depth_filter(d, kernel)
    cam = points.deproject_points(d, pp, focal)
    cam = points.transform_points(cam, aug)
    d, c = render.splat_points(cam, colors, pp, focal)
    return render.fill_holes(d, c)


@functools.partial(jax.jit, static_argnames=("num_colors",))
def _label_frame(color, palette, *, num_colors):
    """Snap colors to the palette and emit label ids 1..num_colors
    (live_data_convert.py:434-447)."""
    snapped = colors_ops.apply_point_mapping(color, palette)
    l = colors_ops._nearest_color_idx(snapped, palette) + 1
    is_black = jnp.sum(snapped.astype(jnp.int32), axis=-1) == 0
    return jnp.where(is_black, 0, l).astype(jnp.uint16), snapped


def make_color_mapping(color_image, cfg: DatagenConfig, rng):
    """EM palette fit: N random restarts of k-means, keep the lowest-cost
    palette (live_data_convert.py:156-204)."""
    best_cost, best = np.inf, None
    img = jnp.asarray(color_image)
    for _ in range(cfg.color_em_tries):
        init = rng.uniform(0, 255, (cfg.num_colors, 3)).astype(np.float32)
        pal, cost = colors_ops.kmeans_palette_step(
            img, jnp.asarray(init), num_iters=cfg.color_em_iterations
        )
        cost = float(cost)
        if cost < best_cost:
            best_cost, best = cost, np.asarray(pal)
    return np.clip(best, 0, 255).astype(np.uint8)


class LiveDataConvert:
    """Streaming converter; feed (depth, color) frames, writes the dataset."""

    def __init__(self, out_path: str, intrinsics, cfg: DatagenConfig,
                 mask_model: Optional[DecisionForest] = None,
                 rng: Optional[np.random.Generator] = None, log=print):
        self.out = out_path
        os.makedirs(out_path, exist_ok=True)
        self.intrin = intrinsics
        self.cfg = cfg
        self.rng = rng or np.random.default_rng()
        self.log = log
        self.mask_tables = mask_model.pack().tables() if mask_model else None
        self.plane = plane_ops.CalibratedPlane(
            cfg.plane_candidates, cfg.plane_z_threshold
        )
        self.palette = None
        self.frame_count = 0
        self.frames_skipped = 0
        self._pp = jnp.asarray(intrinsics.pp)
        self._f = jnp.float32(intrinsics.fx)
        self._gauss = (
            jnp.asarray(points.gaussian_kernel(15, cfg.gaussian_noise))
            if cfg.gaussian_noise > 0.1   # live_data_convert.py:382
            else None
        )

    def process_frame(self, depth: np.ndarray, color: np.ndarray,
                      depth_timestamp: Optional[float] = None,
                      color_timestamp: Optional[float] = None):
        cfg = self.cfg
        if cfg.max_images and self.frame_count >= cfg.max_images:
            return False
        # only process pairs whose timestamps overlap reasonably well
        # (live_data_convert.py:306-317; timestamps in seconds, gate in ms)
        if depth_timestamp is not None and color_timestamp is not None:
            if (
                abs(depth_timestamp - color_timestamp) * 1e3
                > cfg.frames_timestamp_max_diff
            ):
                self.frames_skipped += 1
                return True
        depth_j = jnp.asarray(depth)

        if (
            not self.plane.is_set()
            or (self.frame_count + 1) % cfg.frames_per_recompute_plane == 0
        ):
            pts = points.deproject_points(depth_j, self._pp, self._f)
            self.plane.make(pts)

        mat = self.plane.get_mat()
        qf, center = _prep_frame(
            depth_j, mat, self._pp, self._f, jnp.float32(cfg.plane_z_threshold)
        )

        # no augmentation on the first frames (live_data_convert.py:252-261)
        if self.frame_count > 2:
            scale = self.rng.normal(1.0, cfg.scale_variance)
            skew = self.rng.normal(0.0, cfg.scale_skew_variance, 3)
            rot = self.rng.normal(0.0, cfg.rotate_variance)
            trans = self.rng.normal(0.0, cfg.translate_variance, 3)
        else:
            scale, skew, rot, trans = 1.0, np.zeros(3), 0.0, np.zeros(3)
        aug = _aug_transform(
            np.asarray(mat), np.asarray(center), scale, skew, rot, trans
        )
        inv_plane = np.linalg.inv(np.asarray(mat, np.float64)).astype(np.float32)

        if self._gauss is not None:
            d_new, c_new = _rerender_smoothed(
                qf, jnp.asarray(color), jnp.asarray(inv_plane),
                jnp.asarray(aug), self._gauss, self._pp, self._f,
            )
        else:
            d_new, c_new = _rerender(
                qf, jnp.asarray(color), jnp.asarray(inv_plane),
                jnp.asarray(aug), self._pp, self._f,
            )

        if self.mask_tables is not None:
            d_forest = points.convert_0s_to_maxuint(d_new)
            mask = forest_eval.evaluate_forest(d_forest[None], self.mask_tables)[0]
            keep = mask == cfg.mask_label
            c_new = jnp.where(keep[..., None], c_new, jnp.uint8(0))

        if self.palette is None:
            self.log("making color mapping...")
            self.palette = make_color_mapping(np.asarray(c_new), cfg, self.rng)
            self.log(f"palette:\n{self.palette}")

        labels, snapped = _label_frame(
            c_new, jnp.asarray(self.palette), num_colors=cfg.num_colors
        )

        self._save(np.asarray(d_new), np.asarray(labels), np.asarray(snapped))
        self.frame_count += 1
        return True

    def _save(self, depth, labels, snapped):
        from PIL import Image

        i = self.frame_count
        depth_out = depth.copy()
        depth_out[depth_out == 0] = MAX_UINT16
        Image.fromarray(depth_out).save(
            os.path.join(self.out, f"{i:08d}_depth.png")
        )
        Image.fromarray(labels).save(
            os.path.join(self.out, f"{i:08d}_labels.png")
        )
        rgba = np.zeros(labels.shape + (4,), np.uint8)
        rgba[..., 0:3] = snapped
        rgba[np.any(snapped > 0, axis=2), 3] = 255
        Image.fromarray(rgba).save(
            os.path.join(self.out, f"{i:08d}_labels_rgba.png")
        )
        # depth debug render
        drgba = np.zeros(labels.shape + (4,), np.uint8)
        drgba[depth_out == MAX_UINT16] = (167, 195, 162, 255)
        act = depth_out < MAX_UINT16
        if act.any():
            dmin, dmax = depth_out[act].min(), depth_out[act].max()
            norm = (255.0 * (1.0 - (depth_out[act] - float(dmin)) /
                             max(1.0, float(dmax - dmin)))).astype(np.uint8)
            drgba[act, 0] = norm
            drgba[act, 1] = norm
            drgba[act, 2] = norm
            drgba[act, 3] = 255
        Image.fromarray(drgba).save(
            os.path.join(self.out, f"{i:08d}_depth_rgba.png")
        )

    def finish(self):
        """Write config.json (live_data_convert.py:284-298)."""
        cfg = {
            "img_dims": [self.intrin.width, self.intrin.height],
            "num_images": self.frame_count,
            "id_to_color": {
                str(c + 1): [int(x) for x in self.palette[c]] + [255]
                for c in range(self.cfg.num_colors)
            },
        }
        with open(os.path.join(self.out, "config.json"), "w") as f:
            json.dump(cfg, f)
        return cfg
