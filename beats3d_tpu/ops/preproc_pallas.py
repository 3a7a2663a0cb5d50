"""Fused plane-band + missing-aware-gaussian preprocessing as one Pallas pass.

Semantically this is ``points.plane_band_depth`` followed by
``points.gaussian_depth_filter`` (reference chain 3d_bz.py:133-211:
deproject -> transform -> filter_points_by_plane ->
remove_missing_3d_points_from_depth_image -> gaussian_depth_filter,
points_ops.cu:326-373), but computed in a single VMEM-resident pass per
frame.  The XLA version of the same chain is at the mercy of fusion
heuristics: the conv either recomputes the deprojection math per tap or
spills three full-res f32 channel maps to HBM, and measured cost swings
2-3x run to run.  Here the data is touched exactly twice (read u16-as-f32,
write i32) and the separable 5-tap gaussian runs as lane/sublane rolls.

Numerical notes vs the XLA path (both are faithful to the reference's
float32 semantics; bit-level they may differ):
  * the 2D gaussian is applied separably (vertical then horizontal 1D
    passes).  The reference sums 25 taps in row-major order; summation
    order differences can move ``floor(sn/wn)`` by one depth unit when the
    weighted mean sits exactly on an integer (the unit tests allow this).
  * the missing-majority test ``w0 > wn`` is evaluated as
    ``(wtot - wn) > wn`` where ``wtot`` is the in-bounds kernel weight sum
    (a per-border-position constant): zero-depth in-bounds taps carry
    exactly the weight the reference would have put in ``w0``.

The pipeline uses this kernel for BOTH eval backends whenever it runs on
TPU, so Pallas-vs-XLA eval parity checks always see identical inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8


def _kernel_weights(ksize: int, sigma: float):
    """Normalized 1D gaussian taps + border partial sums, as python floats
    (static constants baked into the kernel).  Matches
    ``points.gaussian_kernel``: outer(k1, k1)/sum == outer(k1n, k1n) in
    exact arithmetic."""
    half = ksize // 2
    xs = np.linspace(-half, half, ksize)
    k1 = np.exp(-(xs ** 2) / (2.0 * sigma * sigma)).astype(np.float32)
    k1n = (k1 / k1.sum()).astype(np.float32)
    # border[j] = in-bounds weight sum when j taps are cut off one side
    border = [float(np.float32(k1n[j:].sum())) for j in range(half + 1)]
    return [float(v) for v in k1n], border


def _make_kernel(h, w, hp, wp, ksize, sigma):
    half = ksize // 2
    k1n, border = _kernel_weights(ksize, sigma)

    def kern(s_ref, d_ref, o_ref):
        d = d_ref[0]  # (hp, wp) f32, padded: `half` zeros top/left
        m20, m21, m22, m23 = s_ref[0], s_ref[1], s_ref[2], s_ref[3]
        pp0, pp1, foc, thr = s_ref[4], s_ref[5], s_ref[6], s_ref[7]

        # Mosaic only supports integer iota; convert then shift by the pad.
        x = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(
            jnp.float32) - float(half)
        y = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(
            jnp.float32) - float(half)

        # plane-band: z in plane space, same products/order as
        # points.plane_band_depth (itself matching transform_points' einsum)
        px = d * (x - pp0) / foc
        py = d * (y - pp1) / foc
        z = ((m20 * px + m21 * py) + m22 * d) + m23
        keep = (d > 0) & ~(z > -thr)
        dnz = jnp.where(keep, d, 0.0)
        nz = jnp.where(keep, 1.0, 0.0)

        # separable missing-aware gaussian: padded zeros contribute to
        # neither sum, which realizes the reference's skip-OOB rule
        def pass1d(a, axis):
            size = a.shape[axis]
            acc = a * k1n[half]
            for i in range(1, half + 1):
                acc = acc + k1n[half - i] * pltpu.roll(a, i, axis)
                acc = acc + k1n[half + i] * pltpu.roll(a, size - i, axis)
            return acc

        sn = pass1d(pass1d(dnz, 0), 1)
        wn = pass1d(pass1d(nz, 0), 1)

        # in-bounds total weight per position (border-truncated)
        def border_w(coord, dim):
            # position c cuts max(0, half-c) taps at the low edge and
            # max(0, c-(dim-1-half)) at the high edge (dim >> ksize, so
            # both never apply at once)
            v = jnp.full((hp, wp), border[0], jnp.float32)
            for j in range(1, half + 1):
                cut = border[j]
                v = jnp.where(coord == float(half - j), cut, v)
                v = jnp.where(coord == float(dim - 1 - half + j), cut, v)
            return v

        wtot = border_w(y, h) * border_w(x, w)

        wn_safe = jnp.where(wn == 0.0, 1.0, wn)
        mean = jnp.floor(sn / wn_safe)
        out = jnp.where((wtot - wn) > wn, 0.0, mean)
        o_ref[0] = out.astype(jnp.int32)

    return kern


@functools.partial(
    jax.jit,
    static_argnames=("ksize", "sigma", "h", "w", "hp", "wp", "interpret"),
)
def _run(dpad, scal, *, ksize, sigma, h, w, hp, wp, interpret):
    n = dpad.shape[0]
    kern = _make_kernel(h, w, hp, wp, ksize, sigma)
    plane = pl.BlockSpec(
        (1, hp, wp), lambda nn: (nn, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), plane],
        out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
        interpret=interpret,
    )(scal, dpad)


def plane_band_gauss(
    depth: jnp.ndarray,
    mat: jnp.ndarray,
    pp,
    focal,
    threshold,
    *,
    ksize: int = 5,
    sigma: float = 2.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``plane_band_depth`` + ``gaussian_depth_filter``.

    depth: (..., H, W) uint16 -> (..., H, W) uint16.
    ksize/sigma are static (the taps are baked into the kernel).
    """
    assert ksize % 2 == 1
    half = ksize // 2
    lead = depth.shape[:-2]
    h, w = depth.shape[-2:]
    d3 = depth.reshape((-1, h, w)).astype(jnp.float32)

    hp = -(-(h + 2 * half) // SUB) * SUB
    wp = -(-(w + 2 * half) // LANE) * LANE
    dpad = jnp.pad(
        d3, ((0, 0), (half, hp - h - half), (half, wp - w - half))
    )
    m = mat.astype(jnp.float32)
    scal = jnp.stack([
        m[2, 0], m[2, 1], m[2, 2], m[2, 3],
        jnp.asarray(pp[0], jnp.float32), jnp.asarray(pp[1], jnp.float32),
        jnp.asarray(focal, jnp.float32),
        jnp.asarray(threshold, jnp.float32),
    ])
    out = _run(
        dpad, scal, ksize=ksize, sigma=float(sigma), h=h, w=w, hp=hp, wp=wp,
        interpret=interpret,
    )
    return (
        out[:, half:half + h, half:half + w]
        .astype(jnp.uint16)
        .reshape(lead + (h, w))
    )
