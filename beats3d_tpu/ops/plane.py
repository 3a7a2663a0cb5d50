"""RANSAC table-plane calibration, TPU-native.

Reference: src/calibrated_plane.py:12-87 + src/cuda/calibrated_plane.cu:1-90.
25k candidate planes are built from random triples of valid points; each is a
rigid camera->plane transform whose rows are an orthonormal basis with z = the
triple's normal (so plane-space |z| is distance to the candidate plane); the
candidate with the most points within |z| < threshold wins; the winner is then
re-centered so the camera's forward ray hits the plane-space origin in (x, y)
(calibrated_plane.py:81-87).

TPU redesign: candidate construction is a vmap over candidates; the
inlier count is one big (points x candidates) masked matmul-style reduction —
a deterministic XLA reduction instead of the reference's per-point atomicAdd
loop (calibrated_plane.cu:18-25).  The whole calibration is a single jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _build_candidate(r: jnp.ndarray, pts_flat: jnp.ndarray, num_px: int):
    """Build one candidate plane matrix from a row of 32 uniforms.

    Mirrors ``make_plane_candidates`` (calibrated_plane.cu:48-90): draw up to 32
    random point indices, take the first 3 with z > 0, build an orthonormal
    basis (x = v0, z = normal, y = z x x) anchored at p0.
    Returns (4, 4) float32 camera->plane matrix (rows = axes; M @ [p,1] gives
    plane coords) and a validity flag.
    """
    idx = jnp.floor(r * num_px).astype(jnp.int32)
    idx = jnp.clip(idx, 0, num_px - 1)
    cand_pts = pts_flat[idx]  # (32, 4)
    valid = cand_pts[:, 2] > 0.0
    order = jnp.cumsum(valid.astype(jnp.int32))

    def pick(k):
        hit = valid & (order == k)
        first = jnp.argmax(hit)
        return cand_pts[first, :3], jnp.any(hit)

    p0, ok0 = pick(1)
    p1, ok1 = pick(2)
    p2, ok2 = pick(3)
    ok = ok0 & ok1 & ok2

    def norm(v):
        # One Newton-Raphson step on rsqrt: TPU's hardware rsqrt is only
        # ~3e-3 accurate, which would skew the plane basis measurably;
        # the refinement restores ~1e-7 orthonormality at negligible cost.
        s = jnp.sum(v * v)
        r = jax.lax.rsqrt(s)
        r = r * (1.5 - 0.5 * s * r * r)
        return v * r

    v0 = norm(p1 - p0)
    v1 = norm(p2 - p0)
    z_axis = norm(jnp.cross(v0, v1))
    # Canonicalize orientation: the camera (origin) must land on the negative-z
    # side of the plane, so hands above the table survive the z <= -threshold
    # filter.  The reference's cross product has a random sign (the triple's
    # draw order), making each calibration a 50/50 orientation lottery that the
    # user fixes by re-calibrating; we flip z (and y, to stay right-handed)
    # deterministically instead.
    flip = jnp.where(jnp.dot(z_axis, p0) < 0.0, -1.0, 1.0)
    z_axis = z_axis * flip
    x_axis = v0
    y_axis = norm(jnp.cross(z_axis, x_axis))

    rot = jnp.stack([x_axis, y_axis, z_axis])  # rows = axes
    # HIGHEST: p0 components reach 65535; under vmap this is a batched
    # matmul whose default bf16 input rounding would shift every candidate
    # plane's translation by up to ~100 depth units.
    t = -jax.lax.dot(rot, p0, precision=jax.lax.Precision.HIGHEST)
    mat = jnp.concatenate(
        [jnp.concatenate([rot, t[:, None]], axis=1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)],
        axis=0,
    )
    # Degenerate candidates (fewer than 3 valid points, collinear triples)
    # must score ZERO inliers: park the z-row translation at 1e30 so every
    # point's |plane z| blows past any threshold.
    degenerate = ~ok | jnp.any(~jnp.isfinite(mat))
    dead = jnp.zeros((4, 4), jnp.float32).at[2, 3].set(1e30)
    return jnp.where(degenerate, dead, mat)


def make_plane_candidates(key, pts: jnp.ndarray, num_candidates: int):
    """(num_candidates, 4, 4) candidate camera->plane transforms from random
    point triples. pts: (..., 4) float32 point cloud."""
    pts_flat = pts.reshape(-1, 4)
    num_px = pts_flat.shape[0]
    r = jax.random.uniform(key, (num_candidates, 32), dtype=jnp.float32)
    return jax.vmap(_build_candidate, in_axes=(0, None, None))(r, pts_flat, num_px)


def count_inliers(pts: jnp.ndarray, candidates: jnp.ndarray, threshold,
                  chunk: int = 512) -> jnp.ndarray:
    """Inliers per candidate: points with w == 1 and |plane z| < threshold
    (reference ``find_plane_ransac``, calibrated_plane.cu:3-26).

    Only the z row of each candidate matters: z = pts[:, :3] @ zrow + tz.
    Computed as a blocked (points x candidates) contraction.
    """
    pts_flat = pts.reshape(-1, 4)
    valid = pts_flat[:, 3] == 1.0
    zrow = candidates[:, 2, :]  # (Ncand, 4)
    ncand = zrow.shape[0]
    pad = (-ncand) % chunk
    zrow_p = jnp.pad(zrow, ((0, pad), (0, 0)))
    zrow_c = zrow_p.reshape(-1, chunk, 4)

    def per_chunk(zr):
        # HIGHEST: point coords reach 65535 while the inlier threshold is 40
        # — the TPU MXU's default bf16 input rounding injects O(100)-unit z
        # errors that visibly tilt the fitted plane (caught by the on-chip
        # e2e drive; CPU runs f32 and cannot see it).  Calibration-only, so
        # the multi-pass cost is irrelevant.
        z = jax.lax.dot(
            pts_flat[:, :3], zr[:, :3].T,
            precision=jax.lax.Precision.HIGHEST,
        ) + zr[:, 3][None, :]  # (P, chunk)
        inl = (jnp.abs(z) < threshold) & valid[:, None]
        return jnp.sum(inl, axis=0, dtype=jnp.int32)

    counts = jax.lax.map(per_chunk, zrow_c).reshape(-1)
    return counts[:ncand]


def _recenter(mat: jnp.ndarray) -> jnp.ndarray:
    """Translate the plane transform so the camera's forward ray hits the
    plane-space origin (reference calibrated_plane.py:81-87)."""
    p0 = mat[2, 2]
    p1 = mat[2, 3]
    t = -p1 / p0  # depth at which the (0,0,1) ray meets the plane
    # HIGHEST on both: translations/point values up to 65535 must not round
    # to bf16 (see count_inliers).
    c = jax.lax.dot(
        mat, jnp.array([0.0, 0.0, 1.0, 0.0], jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * t + mat[:, 3]
    shift = jnp.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32
    )
    shift = shift.at[0, 3].set(-c[0]).at[1, 3].set(-c[1])
    return jax.lax.dot(shift, mat, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def calibrate_plane(
    key,
    pts: jnp.ndarray,
    threshold,
    num_candidates: int = 25000,
    start_mat: jnp.ndarray = None,
):
    """Full plane calibration in one jit: propose, score, pick best, re-center.

    ``start_mat`` (optional) seeds candidate 0 with a previous plane so
    recalibration can only improve (reference calibrated_plane.py:56-57).
    Returns the re-centered (4, 4) camera->plane matrix.
    """
    candidates = make_plane_candidates(key, pts, num_candidates)
    if start_mat is not None:
        candidates = candidates.at[0].set(start_mat)
    counts = count_inliers(pts, candidates, threshold)
    best = jnp.argmax(counts)
    return _recenter(candidates[best])


class CalibratedPlane:
    """Stateful convenience wrapper mirroring the reference class
    (calibrated_plane.py:12-87): holds the current plane matrix and RNG key."""

    def __init__(self, num_random_guesses: int = 25000,
                 plane_z_outlier_threshold: float = 40.0, seed: int = 0):
        self.num_random_guesses = num_random_guesses
        self.plane_z_outlier_threshold = plane_z_outlier_threshold
        self._key = jax.random.PRNGKey(seed)
        self.plane = None

    def is_set(self) -> bool:
        return self.plane is not None

    def get_mat(self):
        assert self.is_set()
        return self.plane

    def make(self, pts, start_mat=None):
        self._key, sub = jax.random.split(self._key)
        self.plane = calibrate_plane(
            sub,
            pts,
            jnp.float32(self.plane_z_outlier_threshold),
            num_candidates=self.num_random_guesses,
            start_mat=start_mat,
        )
        return self.plane
