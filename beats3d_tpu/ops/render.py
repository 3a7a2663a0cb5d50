"""Depth/color re-rendering and render-and-compare cost, TPU-native.

The reference re-renders augmented training frames by triangulating the point
cloud and rasterizing through an OpenGL FBO with a uint16 depth attachment
(src/live_data_convert.py:207-282, engine/framebuffer.py, points_ops.cu
``make_triangles``).  There is no GL on a TPU host, and rasterization is a
poor fit for XLA — instead we splat each source point into its projected
pixel with a deterministic z-buffer built from scatter-min, then close the
small holes that triangle interpolation would have covered with a
neighbor-min morphological fill.  For the ~1-pixel-per-point clouds and
modest augmentation scales this pipeline produces (scale sigma 0.1,
live_data_convert.py:64), the result is an equivalent training-data surface.

Also here: ``calc_image_cost`` — the reference's render-and-compare pose cost
(src/cuda/fit_mesh.cu:4-55) with its atomicAdd reduction replaced by a masked
sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_UINT16 = 65535


def project_points(pts: jnp.ndarray, pp, focal):
    """Camera-space float4 points -> integer pixel coords + validity.

    Inverse of deproject: u = f*x/z + ppx, v = f*y/z + ppy (points with w != 1
    or z <= 0 are invalid).  Matches the reference's rs-style projection
    (util.py:12-19) at the pixel-center convention of deproject_points.
    """
    x, y, z, w = pts[..., 0], pts[..., 1], pts[..., 2], pts[..., 3]
    valid = (w == 1.0) & (z > 0.0)
    zs = jnp.where(z <= 0, 1.0, z)
    u = jnp.round(focal * x / zs + pp[0]).astype(jnp.int32)
    v = jnp.round(focal * y / zs + pp[1]).astype(jnp.int32)
    return u, v, valid


@jax.jit
def splat_points(pts: jnp.ndarray, colors: jnp.ndarray, pp, focal):
    """Render (depth uint16, color uint8) images from a structured point cloud.

    pts: (H, W, 4) float32 camera-space points (w==1 valid); colors:
    (H, W, 3) uint8 per-point colors.  Output images have the same (H, W).
    Z-test: nearest z wins; exact z ties resolve to the lowest source pixel
    index (deterministic, unlike GL submission order).
    """
    h, w = pts.shape[:2]
    n = h * w
    u, v, valid = project_points(pts.reshape(-1, 4), pp, focal)
    inb = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    tgt = jnp.where(inb, v * w + u, n)  # slot n = dump for invalid

    z = pts.reshape(-1, 4)[:, 2]
    zi = jnp.clip(z, 0, MAX_UINT16 - 1).astype(jnp.int32)

    big = jnp.int32(MAX_UINT16)
    zbuf = jnp.full((n + 1,), big, jnp.int32)
    zbuf = zbuf.at[tgt].min(jnp.where(inb, zi, big))

    # winner per target: among sources matching the z-buffer, lowest index
    src_idx = jnp.arange(n, dtype=jnp.int32)
    won_z = inb & (zi == zbuf[tgt])
    winner = jnp.full((n + 1,), n, jnp.int32)
    winner = winner.at[tgt].min(jnp.where(won_z, src_idx, n))

    has = (zbuf[:n] != big)
    depth = jnp.where(has, zbuf[:n], 0).astype(jnp.uint16).reshape(h, w)
    colors_flat = jnp.concatenate(
        [colors.reshape(-1, 3), jnp.zeros((1, 3), colors.dtype)]
    )
    color = jnp.where(
        has[:, None], colors_flat[winner[:n]], jnp.uint8(0)
    ).reshape(h, w, 3)
    return depth, color


@jax.jit
def fill_holes(depth: jnp.ndarray, color: jnp.ndarray):
    """Close 1-pixel rendering holes: a zero-depth pixel with >= 3 of its 4
    neighbors populated takes the neighbor min depth (and that neighbor's
    color).  Stands in for the triangle interpolation of the GL path."""
    h, w = depth.shape
    d = depth.astype(jnp.int32)
    big = jnp.int32(MAX_UINT16)
    dn = jnp.where(d == 0, big, d)
    pad = jnp.pad(dn, 1, constant_values=big)
    shifts = [pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:]]
    cpad = jnp.pad(color, ((1, 1), (1, 1), (0, 0)))
    cshifts = [cpad[:-2, 1:-1], cpad[2:, 1:-1], cpad[1:-1, :-2], cpad[1:-1, 2:]]

    present = sum((s != big).astype(jnp.int32) for s in shifts)
    nmin = shifts[0]
    cmin = cshifts[0]
    for s, cs in zip(shifts[1:], cshifts[1:]):
        take = s < nmin
        cmin = jnp.where(take[..., None], cs, cmin)
        nmin = jnp.where(take, s, nmin)

    fill = (d == 0) & (present >= 3)
    out_d = jnp.where(fill, nmin, d).astype(jnp.uint16)
    out_d = jnp.where(out_d == big, 0, out_d)
    out_c = jnp.where(fill[..., None], cmin, color)
    return out_d, out_c


@jax.jit
def calc_image_cost(d0, d1, labels, target_label):
    """Render-and-compare cost (reference src/cuda/fit_mesh.cu:4-55).

    d0: observed depth (uint16, 0 = missing); d1: rendered depth; labels:
    labels of d0.  Boundary mismatches cost 100; matching-label pixels cost
    0.01 * (depth difference)^2.  Pixels missing in d0 are free.
    """
    d0f = d0.astype(jnp.float32)
    d1f = d1.astype(jnp.float32)
    observed = d0 != 0
    is_target = labels == target_label

    boundary = (
        (is_target & (d1 == 0)) | (~is_target & (d1 != 0))
    ) & observed
    overlap = is_target & (d1 != 0) & observed

    diff = jnp.abs(d0f - d1f)
    cost = (
        jnp.sum(jnp.where(boundary, 100.0, 0.0))
        + jnp.sum(jnp.where(overlap & ~boundary, 0.01 * diff * diff, 0.0))
    )
    return cost
