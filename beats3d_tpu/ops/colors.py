"""Color palette ops for the datagen pipeline (EM-style palette fit + label
assignment).  Reference kernels: ``apply_point_mapping`` (points_ops.cu:167-205),
``split_pixels_by_nearest_color`` (points_ops.cu:207-255); EM driver
``make_color_mapping`` (live_data_convert.py:156-204).

The reference accumulates per-color stats with uint64/double atomics; here the
assignment is a (pixels x colors) argmin and the stats are deterministic
segment reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _nearest_color_idx(image: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel index of the nearest palette color (squared RGB distance,
    first-min tie break like the reference's strict < scan)."""
    img = image.astype(jnp.float32)  # (..., 3)
    pal = colors.astype(jnp.float32)  # (K, 3)
    d = jnp.sum((img[..., None, :] - pal) ** 2, axis=-1)  # (..., K)
    return jnp.argmin(d, axis=-1)


@jax.jit
def apply_point_mapping(image: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """Snap each non-black RGB pixel to its nearest palette color
    (reference points_ops.cu:167-205; black pixels pass through)."""
    idx = _nearest_color_idx(image, colors)
    snapped = jnp.take(colors, idx, axis=0)
    is_black = jnp.sum(image.astype(jnp.int32), axis=-1) == 0
    return jnp.where(is_black[..., None], image, snapped)


@jax.jit
def split_pixels_by_nearest_color(image: jnp.ndarray, colors: jnp.ndarray):
    """Per-color stats of the nearest-color assignment.

    Returns (counts (K,), rgb_sums (K, 3), cost (K,)) — the reference's
    ``pixel_counts_per_group`` table (points_ops.cu:222,244-249) split into
    typed arrays.  Black pixels are excluded.
    """
    k = colors.shape[0]
    img = image.reshape(-1, 3)
    idx = _nearest_color_idx(img, colors)
    valid = jnp.sum(img.astype(jnp.int32), axis=-1) != 0
    seg = jnp.where(valid, idx, k)  # park invalid pixels in segment k
    one = valid.astype(jnp.float32)
    counts = jax.ops.segment_sum(one, seg, num_segments=k + 1)[:k]
    rgb = jax.ops.segment_sum(
        img.astype(jnp.float32) * one[:, None], seg, num_segments=k + 1
    )[:k]
    d = jnp.sum((img.astype(jnp.float32)[:, None, :] - colors.astype(jnp.float32)) ** 2,
                axis=-1)
    best_d = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    cost = jax.ops.segment_sum(best_d * one, seg, num_segments=k + 1)[:k]
    return counts, rgb, cost


@functools.partial(jax.jit, static_argnames=("num_iters",))
def kmeans_palette_step(image: jnp.ndarray, colors: jnp.ndarray, num_iters: int = 32):
    """One EM restart: iterate assign + recenter ``num_iters`` times
    (reference live_data_convert.py:156-204 runs 8 restarts x 32 iters).

    Returns (colors (K, 3) float32, total_cost scalar).
    """
    img = image.reshape(-1, 3).astype(jnp.float32)
    valid = jnp.sum(img, axis=-1) != 0

    def body(_, pal):
        d = jnp.sum((img[:, None, :] - pal) ** 2, axis=-1)
        idx = jnp.argmin(d, axis=-1)
        k = pal.shape[0]
        seg = jnp.where(valid, idx, k)
        one = valid.astype(jnp.float32)
        counts = jax.ops.segment_sum(one, seg, num_segments=k + 1)[:k]
        sums = jax.ops.segment_sum(img * one[:, None], seg, num_segments=k + 1)[:k]
        new = sums / jnp.where(counts == 0, 1.0, counts)[:, None]
        new = jnp.where((counts > 0)[:, None], new, pal)
        # Dead-cluster repair (an improvement over the reference EM, which
        # lets empty clusters rot at their random init): reseed one dead
        # cluster per iteration at the worst-fit pixel's color.
        min_d = jnp.min(d, axis=-1)
        far_idx = jnp.argmax(jnp.where(valid, min_d, -1.0))
        dead = counts == 0
        first_dead = jnp.argmax(dead)
        reseed = jnp.any(dead)
        new = new.at[first_dead].set(
            jnp.where(reseed, img[far_idx], new[first_dead])
        )
        return new

    pal = jax.lax.fori_loop(0, num_iters, body, colors.astype(jnp.float32))
    d = jnp.sum((img[:, None, :] - pal) ** 2, axis=-1)
    best = jnp.min(d, axis=-1)
    cost = jnp.sum(jnp.where(valid, best, 0.0))
    return pal, cost
