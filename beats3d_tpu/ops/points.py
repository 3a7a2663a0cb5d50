"""Per-frame point/image ops — vectorized XLA replacements for the reference's
17 ``points_ops`` CUDA kernels (src/cuda/points_ops.cu).  Each function documents
which kernel it reproduces.  All are pure jnp and fuse into the surrounding jit;
most of the reference's kernel-per-step structure collapses into a handful of
elementwise expressions that XLA fuses into neighboring ops for free.

Conventions: depth images are (H, W) or (N, H, W) uint16 with 0 = missing and
65535 = "missing for the forest"; point clouds are (..., 4) float32 with w==1
marking a valid point (w==0 invalid), matching the reference layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_UINT16 = 65535


def deproject_points(depth: jnp.ndarray, pp, focal) -> jnp.ndarray:
    """Depth image -> camera-space float4 point cloud via pinhole intrinsics.

    Reference kernel ``deproject_points`` (points_ops.cu:4-36): for d > 0,
    p = (d*(x-ppx)/f, d*(y-ppy)/f, d, 1); else all-zero.
    depth: (..., H, W) uint16. pp: (2,) principal point. focal: scalar.
    Returns (..., H, W, 4) float32.
    """
    h, w = depth.shape[-2:]
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    d = depth.astype(jnp.float32)
    f = jnp.float32(focal)
    px = d * (x - pp[0]) / f
    py = d * (y - pp[1]) / f
    valid = d > 0
    pts = jnp.stack([px, py, d, jnp.ones_like(d)], axis=-1)
    return jnp.where(valid[..., None], pts, 0.0)


def depths_from_points(pts: jnp.ndarray) -> jnp.ndarray:
    """Point cloud -> uint16 depth image (z where w > 0 else 0).

    Reference kernel ``depths_from_points`` (points_ops.cu:39-63). Note the
    reference writes into an existing image only where w > 0; callers there
    always start from a zeroed buffer, which is the semantic implemented here.
    """
    z = pts[..., 2].astype(jnp.uint16)
    return jnp.where(pts[..., 3] > 0.0, z, jnp.uint16(0))


def transform_points(pts: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to all points with w == 1 (others pass through).

    Reference kernel ``transform_points`` (points_ops.cu:65-75); the matrix is
    applied in standard numpy row-vector-on-the-right convention
    (new_p = M @ p), which is what the reference's glm transpose dance
    amounts to for the numpy matrices the host passes in.
    """
    # HIGHEST: point coordinates reach 65535; the MXU's default bf16 input
    # rounding would move them by up to +-128.
    new = jnp.einsum(
        "ij,...j->...i", mat.astype(jnp.float32), pts,
        precision=jax.lax.Precision.HIGHEST,
    )
    keep = pts[..., 3:4] == 1.0
    return jnp.where(keep, new, pts)


def convert_0s_to_maxuint(depth: jnp.ndarray) -> jnp.ndarray:
    """0 -> 65535 sentinel (reference points_ops.cu:117-127)."""
    return jnp.where(depth == 0, jnp.uint16(MAX_UINT16), depth)


def remove_missing_3d_points_from_depth_image(pts, depth):
    """Zero depth where the point was filtered away (w == 0)
    (reference points_ops.cu:130-146)."""
    return jnp.where(pts[..., 3] == 0.0, jnp.uint16(0), depth)


def setup_depth_image_for_forest(pts, depth):
    """Combined: depth 0 or filtered point -> 65535
    (reference points_ops.cu:149-165)."""
    missing = (depth == 0) | (pts[..., 3] == 0.0)
    return jnp.where(missing, jnp.uint16(MAX_UINT16), depth)


def plane_band_depth(depth: jnp.ndarray, mat: jnp.ndarray, pp, focal,
                     threshold) -> jnp.ndarray:
    """Fused deproject -> plane transform -> band filter -> back to depth.

    Bit-equivalent to the chain deproject_points -> transform_points ->
    filter_points_by_plane -> remove_missing_3d_points_from_depth_image
    (reference pipeline 3d_bz.py:133-210) for the DEPTH image it produces:
    only the plane-space z is ever consulted, so the float4 clouds (4x
    full-frame f32 arrays) never materialize.  z is computed with the same
    products and additions, in the same order, as the einsum in
    transform_points.

    depth: (..., H, W) uint16 -> (..., H, W) uint16 (0 where missing or
    at/below the plane band).
    """
    h, w = depth.shape[-2:]
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    d = depth.astype(jnp.float32)
    f = jnp.float32(focal)
    px = d * (x - pp[0]) / f
    py = d * (y - pp[1]) / f
    m = mat.astype(jnp.float32)
    z = ((m[2, 0] * px + m[2, 1] * py) + m[2, 2] * d) + m[2, 3]
    keep = (depth > 0) & ~(z > -jnp.float32(threshold))
    return jnp.where(keep, depth, jnp.uint16(0))


def gaussian_kernel(k_size: int, sigma: float) -> np.ndarray:
    """Host-side 2D gaussian weights, normalized to sum 1 (reference
    points_ops.py:8-13; the normal-pdf prefactor cancels in normalization)."""
    assert k_size % 2 == 1, "kernel must be odd"
    l = k_size // 2
    xs = np.linspace(-l, l, k_size)
    k1 = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    k2 = np.outer(k1, k1)
    return (k2 / k2.sum()).astype(np.float32)


def gaussian_depth_filter(depth: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Missing-aware gaussian smoothing (reference points_ops.cu:326-373).

    Weights of in-bounds zero-depth pixels accumulate into w_0, others into
    w_non0 with a weighted sum; output is 0 if w_0 > w_non0 (majority missing)
    else floor(weighted mean).  Out-of-bounds taps are skipped entirely.

    depth: (H, W) uint16; kernel: (k, k) float32 (static shape).
    """
    h, w = depth.shape
    k = kernel.shape[0]
    half = k // 2
    d = depth.astype(jnp.float32)

    # Three maps, one grouped XLA convolution on the MXU (the k*k tap loop
    # cost ~1 ms/frame in vector selects): sn = conv(d masked to nonzero),
    # wn = conv(nonzero indicator), w0 = conv(in-bounds zero indicator).
    # Zero padding realizes the reference's skip-OOB-taps rule — an OOB tap
    # contributes 0 to every map (points_ops.cu:326-373).
    nz = d > 0
    stackin = jnp.stack(
        [jnp.where(nz, d, 0.0), nz.astype(jnp.float32),
         (~nz).astype(jnp.float32)]
    )[None]  # (1, 3, H, W)
    rhs = jnp.broadcast_to(kernel, (3, 1, k, k))
    out = jax.lax.conv_general_dilated(
        stackin, rhs, (1, 1), [(half, half), (half, half)],
        feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # HIGHEST: depth payloads reach 65535; default TPU conv precision
        # rounds inputs to bf16 (up to +-128 depth error).
        precision=jax.lax.Precision.HIGHEST,
    )[0]
    sn, wn, w0 = out[0], out[1], out[2]

    safe_wn = jnp.where(wn == 0, 1.0, wn)
    mean = jnp.floor(sn / safe_wn)
    out = jnp.where(w0 > wn, 0.0, mean)
    return out.astype(jnp.uint16)


def shrink_image(depth: jnp.ndarray, mipmap_level: int) -> jnp.ndarray:
    """Decimate by 2**level with point sampling (reference points_ops.cu:375-403)."""
    f = 1 << mipmap_level
    return depth[..., ::f, ::f]


def grow_groups(g: jnp.ndarray) -> jnp.ndarray:
    """1-pixel 4-neighbor dilation of a group-stencil image, neighbor priority
    left, right, up, down (reference points_ops.cu:406-437)."""
    h, w = g.shape[-2:]
    zero = jnp.uint16(0)

    def shift(img, oy, ox):
        out = jnp.roll(img, shift=(-oy, -ox), axis=(-2, -1))
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + oy
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + ox
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return jnp.where(inb, out, zero)

    # DIRS order {(-1,0),(1,0),(0,-1),(0,1)} applied as (y+dir.y, x+dir.x):
    # left, right, up, down (points_ops.cu:416,427-434). First non-zero of
    # [self, left, right, up, down] wins.
    candidates = [shift(g, 0, -1), shift(g, 0, 1), shift(g, -1, 0), shift(g, 1, 0)]
    out = g
    filled = g != 0
    for c in candidates:
        take = (~filled) & (c != 0)
        out = jnp.where(take, c, out)
        filled = filled | take
    return out


def stencil_depth_image_by_group(groups_small, depth, mipmap_level: int, group):
    """Copy full-res depth only where the low-res group image == group id;
    elsewhere 0 (reference points_ops.cu:440-465 with a zero-filled dest)."""
    f = 1 << mipmap_level
    g_full = jnp.repeat(jnp.repeat(groups_small, f, axis=-2), f, axis=-1)
    g_full = g_full[..., : depth.shape[-2], : depth.shape[-1]]
    return jnp.where(g_full == group, depth, jnp.uint16(0))


def _select_mm(img: jnp.ndarray, rows: jnp.ndarray,
               cols: jnp.ndarray) -> jnp.ndarray:
    """``rows @ img @ cols`` for 0/1 selection matrices, EXACT for u16/i32
    payloads on the TPU MXU.

    The MXU's default precision rounds f32 inputs to bf16, so integer
    payloads > 256 (depth values, label sentinels) would be corrupted by up
    to +-128.  Splitting into hi/lo bytes keeps every matmul input < 256
    (bf16-exact) at full default-precision MXU speed; each output element is
    one selected input element, so the f32 recombination is exact.
    Payloads wider than 16 bits fall back to a HIGHEST-precision chain."""
    if (not jnp.issubdtype(img.dtype, jnp.integer)
            or img.dtype.itemsize > 2):
        return jax.lax.dot(
            jax.lax.dot(rows, img.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST),
            cols, precision=jax.lax.Precision.HIGHEST,
        )
    v = img.astype(jnp.int32)
    hi = (v >> 8).astype(jnp.float32)
    lo = (v & 0xFF).astype(jnp.float32)
    out_hi = rows @ hi @ cols
    out_lo = rows @ lo @ cols
    return out_hi * 256.0 + out_lo


def crop_mm(img: jnp.ndarray, oy, ox, ch: int, cw: int) -> jnp.ndarray:
    """Dynamic (ch, cw) crop at (oy, ox) via one-hot MXU matmuls.

    Under vmap, ``lax.dynamic_slice`` with per-element starts lowers to an
    XLA gather (~30 ns/element on TPU — 12.8 ms for 32 half-frame crops);
    two 0/1 selection matmuls do the same copy on the MXU for ~free.
    Exact for uint16 payloads (f32 holds integers < 2^24).  Starts must be
    in-range (callers clip).
    """
    h, w = img.shape[-2:]
    rows = (
        (oy + jnp.arange(ch, dtype=jnp.int32))[:, None]
        == jnp.arange(h, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    cols = (
        jnp.arange(w, dtype=jnp.int32)[:, None]
        == (ox + jnp.arange(cw, dtype=jnp.int32))[None, :]
    ).astype(jnp.float32)
    out = _select_mm(img, rows, cols)
    return out.astype(img.dtype)


def scatter_mm(canvas_fill, img: jnp.ndarray, oy, ox, hh: int,
               ww: int) -> jnp.ndarray:
    """Place (ch, cw) ``img`` into an (hh, ww) canvas of ``canvas_fill`` at
    dynamic (oy, ox) — the inverse of :func:`crop_mm`, replacing batched
    ``dynamic_update_slice`` (which lowers to scatter under vmap)."""
    ch, cw = img.shape[-2:]
    rows = (
        jnp.arange(hh, dtype=jnp.int32)[:, None]
        == (oy + jnp.arange(ch, dtype=jnp.int32))[None, :]
    )
    cols = (
        (ox + jnp.arange(cw, dtype=jnp.int32))[:, None]
        == jnp.arange(ww, dtype=jnp.int32)[None, :]
    )
    out = _select_mm(img, rows.astype(jnp.float32), cols.astype(jnp.float32))
    inside = (
        jnp.any(rows, axis=1)[:, None] & jnp.any(cols, axis=0)[None, :]
    )
    return jnp.where(inside, out.astype(img.dtype), canvas_fill)


def flip_x(img: jnp.ndarray) -> jnp.ndarray:
    """Mirror horizontally (reference points_ops.cu:468-483)."""
    return img[..., ::-1]


def write_pixel_groups_to_stencil_image(coords, num_coords, shape):
    """Scatter an (M, 3) list of (y, x, gid) rows into a zeroed stencil image
    (reference points_ops.cu:486-504). Provided for parity with the coord-list
    path; the on-device pipeline produces the stencil directly."""
    out = jnp.zeros(shape, dtype=jnp.uint16)
    m = coords.shape[0]
    idx = jnp.arange(m)
    valid = idx < num_coords
    yy = jnp.where(valid, coords[:, 0], 0)
    xx = jnp.where(valid, coords[:, 1], 0)
    gid = jnp.where(valid, coords[:, 2], 0).astype(jnp.uint16)
    return out.at[yy, xx].max(gid)


def make_rgba_from_labels(labels, colors):
    """Label id -> RGBA via color LUT; 0/65535 stay transparent black
    (reference points_ops.cu:258-281 with a zero-filled dest).

    labels: (..., H, W) uint16; colors: (num_classes, 4) uint8.
    """
    l = labels.astype(jnp.int32)
    valid = (l != 0) & (l != MAX_UINT16)
    idx = jnp.clip(l - 1, 0, colors.shape[0] - 1)
    rgba = jnp.take(colors, idx, axis=0)
    return jnp.where(valid[..., None], rgba, jnp.uint8(0))


def make_depth_rgba(depth, d_min, d_max):
    """Depth -> grayscale debug viz with sentinel colors
    (reference points_ops.cu:283-323)."""
    d = depth.astype(jnp.float32)
    n_f = (d - d_min) * 255.0 / jnp.float32(d_max - d_min)
    gray = jnp.floor(256.0 - n_f).astype(jnp.uint8)
    h, w = depth.shape[-2:]
    out = jnp.stack([gray, gray, gray, jnp.full_like(gray, 255)], axis=-1)
    c_missing = jnp.array([195, 157, 152, 255], jnp.uint8)
    c_far = jnp.array([157, 195, 152, 255], jnp.uint8)
    c_range = jnp.array([157, 152, 195, 255], jnp.uint8)
    out = jnp.where((depth == 0)[..., None], c_missing, out)
    out = jnp.where((depth == MAX_UINT16)[..., None], c_far, out)
    in_mid = (depth != 0) & (depth != MAX_UINT16) & ((depth < d_min) | (depth > d_max))
    out = jnp.where(in_mid[..., None], c_range, out)
    return out


def filter_points_by_plane(pts: jnp.ndarray, threshold) -> jnp.ndarray:
    """Zero out plane-space points with z > -threshold (i.e. at/below the table
    surface band); only points with w == 1 are filtered
    (reference calibrated_plane.cu:29-45)."""
    cut = (pts[..., 3] == 1.0) & (pts[..., 2] > -threshold)
    return jnp.where(cut[..., None], 0.0, pts)
