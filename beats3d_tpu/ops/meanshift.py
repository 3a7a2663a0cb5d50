"""Mean-shift mode finding over 2D pixel coordinates, per class label.

Reference: src/cuda/mean_shift.py:19-59 + src/cuda/mean_shift.cu:3-48.  The
reference launches one kernel per round (6 rounds x 2 hands per frame), with a
device->host sync after every round to compute the shift on the CPU, and uses
double-precision atomics to tame non-determinism.  Here all rounds for all
classes fuse into a single jit: per-class masked weighted reductions are
deterministic by construction, so float32 suffices, and there are zero host
round trips.

Semantics preserved: round 0 initializes each class mean to the centroid of its
pixels; later rounds shift by sum(p * diff) / sum(p) with
p = exp(-|diff|^2 / (2 * var^2)).  A class with no pixels yields NaN means
(0/0), exactly like the reference; callers treat NaN as "absent".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_UINT16 = 65535


@functools.partial(jax.jit, static_argnames=("num_classes", "num_rounds"))
def mean_shift(
    labels: jnp.ndarray,
    variances: jnp.ndarray,
    *,
    num_classes: int,
    num_rounds: int = 6,
) -> jnp.ndarray:
    """Per-class mean-shift modes of a label image.

    Args:
      labels: (H, W) uint16 label image; 0 and 65535 are background.
      variances: (num_classes,) float32 per-class kernel bandwidth.
      num_rounds: total rounds including the centroid init round
        (reference 3d_bz.py:65 uses 6).

    Returns (num_classes, 2) float32 (x, y) modes; NaN for absent classes.
    """
    h, w = labels.shape
    l = labels.astype(jnp.int32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    # (C, H, W) masks; C is small (7 for the hand model).
    class_ids = jnp.arange(1, num_classes + 1, dtype=jnp.int32)
    masks = (l[None, :, :] == class_ids[:, None, None]).astype(jnp.float32)

    counts = jnp.sum(masks, axis=(1, 2))
    sum_x = jnp.sum(masks * xs[None], axis=(1, 2))
    sum_y = jnp.sum(masks * ys[None], axis=(1, 2))
    # Absent classes get the NaN sentinel injected at the END (callers treat
    # NaN as "absent", matching the reference's 0/0).  The arithmetic itself
    # uses safe denominators so the checkify sanitizer lane (tests/
    # test_checkify.py) only trips on *accidental* division by zero.
    absent = counts == 0
    means = jnp.stack([sum_x, sum_y], axis=-1) / jnp.maximum(counts, 1.0)[:, None]

    var2 = (variances * variances).astype(jnp.float32)

    def round_fn(_, means):
        dx = xs[None] - means[:, 0, None, None]
        dy = ys[None] - means[:, 1, None, None]
        dist_sq = dx * dx + dy * dy
        p = jnp.exp(-dist_sq / (2.0 * var2[:, None, None])) * masks
        denom = jnp.sum(p, axis=(1, 2))
        # denom can underflow to 0 when the mean drifts far from every pixel
        # (or the class is absent): hold position instead of producing NaN.
        safe = jnp.where(denom == 0.0, 1.0, denom)
        shift_x = jnp.sum(p * dx, axis=(1, 2)) / safe
        shift_y = jnp.sum(p * dy, axis=(1, 2)) / safe
        return means + jnp.stack([shift_x, shift_y], axis=-1)

    if num_rounds > 1:
        means = jax.lax.fori_loop(0, num_rounds - 1, round_fn, means)
    return jnp.where(absent[:, None], jnp.float32(jnp.nan), means)
