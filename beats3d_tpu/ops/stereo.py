"""Block-matching stereo: grayscale pair -> disparity -> uint16 depth.

Capability equivalent of the reference's datagen stereo utility
(datagen/stereo_alg.py:18-33), which runs OpenCV StereoSGBM over a captured
projector-pattern pair and converts disparity to depth as
``depth = 100000 / disparity``.  There is no cv2 on a TPU host, and a global
SGBM optimizer is a poor fit for a vector machine — this is a vectorized
winner-take-all block matcher: the whole cost volume is computed as D
shifted absolute-difference planes box-filtered with a separable running
sum (pure VPU work, one jit), plus parabolic sub-pixel refinement, matching
SGBM's 1/16-pixel output granularity in spirit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_filter(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """(H, W) mean filter with a k x k window via two running sums (edges
    renormalized by the actual window size, like cv2.blur BORDER_REPLICATE
    on a constant border — adequate for cost aggregation)."""
    pad = k // 2

    def running(x, axis):
        c = jnp.cumsum(x, axis=axis)
        n = x.shape[axis]
        zeros_shape = list(x.shape)
        zeros_shape[axis] = 1
        c = jnp.concatenate([jnp.zeros(zeros_shape, x.dtype), c], axis=axis)
        hi = jnp.clip(jnp.arange(n) + pad + 1, 0, n)
        lo = jnp.clip(jnp.arange(n) - pad, 0, n)
        return (
            jnp.take(c, hi, axis=axis) - jnp.take(c, lo, axis=axis)
        )

    s = running(running(img, 0), 1)
    return s


@functools.partial(
    jax.jit, static_argnames=("min_disparity", "max_disparity", "block_size")
)
def block_match_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    min_disparity: int = 0,
    max_disparity: int = 32,
    block_size: int = 11,
) -> jnp.ndarray:
    """(H, W) float32 disparity of ``left`` vs ``right`` (right-shifted
    scene; disparity d means left[x] ~ right[x - d]).  Invalid (out-of-range
    or boundary) pixels get disparity 0, like the reference's
    ``disparity > 0`` gate (stereo_alg.py:32)."""
    L = left.astype(jnp.float32)
    R = right.astype(jnp.float32)
    h, w = L.shape
    ndisp = max_disparity - min_disparity

    def cost_for(d):
        # right image shifted right by d; the first d columns see no match
        Rs = jnp.roll(R, d, axis=1)
        sad = jnp.abs(L - Rs)
        sad = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < d, 1e9, sad
        )
        return _box_filter(sad, block_size)

    costs = jax.lax.map(
        lambda d: cost_for(min_disparity + d), jnp.arange(ndisp)
    )  # (D, H, W)

    best = jnp.argmin(costs, axis=0)  # (H, W)
    c_best = jnp.min(costs, axis=0)

    # parabolic sub-pixel refinement around the winner
    bm1 = jnp.clip(best - 1, 0, ndisp - 1)
    bp1 = jnp.clip(best + 1, 0, ndisp - 1)
    cm = jnp.take_along_axis(costs, bm1[None], axis=0)[0]
    cp = jnp.take_along_axis(costs, bp1[None], axis=0)[0]
    denom = cm + cp - 2.0 * c_best
    delta = jnp.where(
        denom > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)

    disp = best.astype(jnp.float32) + min_disparity + delta
    valid = (
        (best > 0) & (best < ndisp - 1) & (c_best < 1e8)
    )
    return jnp.where(valid, disp, 0.0)


@jax.jit
def depth_from_disparity(disp: jnp.ndarray, scale: float = 100000.0):
    """uint16 depth image via the reference's conversion
    ``depth = 100000 / disparity`` for disparity > 0, else 0
    (stereo_alg.py:31-33)."""
    d = jnp.where(disp > 0, scale / jnp.maximum(disp, 1e-6), 0.0)
    return jnp.clip(d, 0, 65535).astype(jnp.uint16)
