"""Homography estimation + perspective warp + projector-pattern assembly.

Capability equivalent of the reference's datagen/make_proj_image.py:1-59:
rectify a photographed projector tile to a square via a 4-point homography
(cv2.findHomography + warpPerspective there), apply the bottom-rows
brightness tweak, tile it, and contrast-normalize — without cv2: the
homography is a direct 8x8 DLT solve and the warp is an inverse-mapped
bilinear sample (vectorized, jit-friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def find_homography(pts_src: np.ndarray, pts_dst: np.ndarray) -> np.ndarray:
    """3x3 homography H with dst ~ H @ src from exactly 4 point pairs
    (the DLT system cv2.findHomography solves for the minimal case,
    make_proj_image.py:24)."""
    src = np.asarray(pts_src, np.float64)
    dst = np.asarray(pts_dst, np.float64)
    assert src.shape == (4, 2) and dst.shape == (4, 2)
    rows = []
    rhs = []
    for (x, y), (u, v) in zip(src, dst):
        rows.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        rhs.append(u)
        rows.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        rhs.append(v)
    h8 = np.linalg.solve(np.asarray(rows), np.asarray(rhs))
    return np.append(h8, 1.0).reshape(3, 3)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_perspective(
    img: jnp.ndarray, h_inv: jnp.ndarray, *, out_h: int, out_w: int
) -> jnp.ndarray:
    """Inverse-mapped bilinear warp: output pixel (u, v) samples the source
    at ``h_inv @ (u, v, 1)`` (cv2.warpPerspective semantics; ``h_inv`` is
    the INVERSE of the forward homography).  img is (H, W, C) float32;
    out-of-source samples are 0."""
    sh, sw = img.shape[0], img.shape[1]
    uu = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    ones = jnp.ones_like(uu)
    # HIGHEST: pixel coords reach 848 (> bf16's 256 exact-integer range).
    p = jax.lax.dot_general(
        jnp.stack([uu, vv, ones], axis=-1), h_inv.T,
        (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (out_h, out_w, 3)
    x = p[..., 0] / p[..., 2]
    y = p[..., 1] / p[..., 2]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        inb = (yi >= 0) & (yi < sh) & (xi >= 0) & (xi < sw)
        yc = jnp.clip(yi, 0, sh - 1)
        xc = jnp.clip(xi, 0, sw - 1)
        v = img[yc, xc]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    w00 = ((1 - fy) * (1 - fx))[..., None]
    w01 = ((1 - fy) * fx)[..., None]
    w10 = (fy * (1 - fx))[..., None]
    w11 = (fy * fx)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def make_projector_pattern(
    img: np.ndarray,
    pts_src: np.ndarray,
    *,
    tile_size: int = 100,
    num_tiles: int = 20,
    brighten_from_frac: float = 0.8,
    brighten: float = 1.05,
) -> np.ndarray:
    """Photographed tile -> normalized (tile_size*num_tiles)^2 uint8 pattern,
    reproducing make_proj_image.py:7-53: rectify the quad ``pts_src`` to a
    square, brighten the bottom rows (the projector's vignette compensation,
    :30-31), tile, min-max normalize to 0..255."""
    s = tile_size
    pts_dst = np.array([[0, 0], [s, 0], [s, s], [0, s]], np.float64)
    hmat = find_homography(np.asarray(pts_src), pts_dst)
    h_inv = np.linalg.inv(hmat)
    tile = np.array(
        warp_perspective(
            jnp.asarray(np.asarray(img, np.float32)),
            jnp.asarray(h_inv.astype(np.float32)),
            out_h=s, out_w=s,
        )
    )
    tile[int(s * brighten_from_frac):, :] *= brighten
    tiled = np.tile(np.clip(tile, 0, 255).astype(np.uint8),
                    (num_tiles, num_tiles, 1))
    f = tiled.astype(np.float32)
    lo, hi = f.min(), f.max()
    if hi > lo:
        f = (f - lo) / (hi - lo) * 255.0
    return f.astype(np.uint8)
