"""Render-and-compare pose fitting: fit a cylinder to a labeled region by
random search minimizing the depth-image cost (reference src/pose_fit.py,
experimental app).

The reference rasterizes a cylinder mesh through GL and reads back a uint16
depth attachment; here the cylinder surface is point-sampled and splatted
through the same z-buffer renderer used by datagen (ops/render.py) — one jit
per candidate pose, no GL.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms as tf
from . import render

MAX_UINT16 = 65535


@dataclasses.dataclass
class CylinderTform:
    """Translate/rotate/scale pose of a unit cylinder
    (reference pose_fit.py:52-87)."""

    t: np.ndarray = None
    r: np.ndarray = None
    s: np.ndarray = None

    def __post_init__(self):
        self.t = np.zeros(3, np.float32) if self.t is None else self.t
        self.r = np.zeros(3, np.float32) if self.r is None else self.r
        self.s = np.zeros(3, np.float32) if self.s is None else self.s

    def get_tform(self) -> np.ndarray:
        return (
            tf.translate(self.t)
            @ tf.rotate_z(self.r[2])
            @ tf.rotate_x(np.pi / 2 + self.r[0])
            @ tf.scale(self.s)
        )

    def copy(self) -> "CylinderTform":
        return CylinderTform(self.t.copy(), self.r.copy(), self.s.copy())

    def make_random(self, rng: np.random.Generator) -> "CylinderTform":
        """Perturb one of translate/rotate/scale (pose_fit.py:72-87)."""
        n = self.copy()
        a = rng.integers(3)
        if a == 0:
            b = rng.integers(3)
            n.t[b] = rng.normal(n.t[b], 25.0)
        elif a == 1:
            b = rng.choice([0, 2])
            n.r[b] = rng.normal(n.r[b], 0.1)
        else:
            b = rng.normal(n.s[0], 5.0)
            n.s[0] = b * 1.3
            n.s[1] = b
        return n


def cylinder_surface(n_theta: int = 96, n_len: int = 96) -> np.ndarray:
    """Point samples of a unit cylinder: radius 1 in xy, length 1 along +y
    before the rotate_x(pi/2) in get_tform stands it along plane-z.
    Returns (n_theta * n_len, 4) float32 homogeneous points."""
    theta = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    l = np.linspace(0.0, 1.0, n_len)
    tt, ll = np.meshgrid(theta, l)
    pts = np.stack(
        [np.cos(tt), np.sin(tt), ll, np.ones_like(tt)], axis=-1
    ).reshape(-1, 4)
    return pts.astype(np.float32)


@jax.jit
def render_cylinder_depth(surface, obj_tform, pp, focal, out_shape_ref):
    """Transform the unit-cylinder samples into camera space and splat a
    depth image shaped like ``out_shape_ref``."""
    # HIGHEST: camera-space coords reach thousands of depth units; default
    # MXU precision rounds inputs to bf16.
    cam = jnp.einsum(
        "ij,nj->ni", obj_tform, surface,
        precision=jax.lax.Precision.HIGHEST,
    )
    cam = cam.at[:, 3].set(1.0)
    h, w = out_shape_ref.shape
    u, v, valid = render.project_points(cam, pp, focal)
    inb = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    tgt = jnp.where(inb, v * w + u, h * w)
    zi = jnp.clip(cam[:, 2], 0, MAX_UINT16 - 1).astype(jnp.int32)
    big = jnp.int32(MAX_UINT16)
    zbuf = jnp.full((h * w + 1,), big, jnp.int32)
    zbuf = zbuf.at[tgt].min(jnp.where(inb, zi, big))
    d = jnp.where(zbuf[: h * w] != big, zbuf[: h * w], 0)
    return d.astype(jnp.uint16).reshape(h, w)


def fit_cylinder(
    observed_depth,
    labels,
    plane_mat: np.ndarray,
    init: CylinderTform,
    pp,
    focal,
    *,
    target_label: int = 1,
    iterations: int = 200,
    rng: np.random.Generator = None,
    n_samples: int = 96,
    log=None,
    on_improve=None,
):
    """Random-search pose fit (the reference's annealing-ish loop,
    pose_fit.py:253-317).  Returns (best_tform, best_cost, history).

    ``on_improve(iteration, cost, tform)`` fires for the initial pose and
    every accepted improvement — the hook the interactive fit viewer uses
    (the reference shows fit progress live in its GL window,
    pose_fit.py:90-385)."""
    rng = rng or np.random.default_rng()
    surface = jnp.asarray(cylinder_surface(n_samples, n_samples))
    inv_plane = np.linalg.inv(plane_mat.astype(np.float64)).astype(np.float32)
    obs = jnp.asarray(observed_depth)
    lab = jnp.asarray(labels)
    pp_j = jnp.asarray(pp)
    f_j = jnp.float32(focal)

    def cost_of(tform: CylinderTform) -> float:
        obj = inv_plane @ tform.get_tform()
        d1 = render_cylinder_depth(surface, jnp.asarray(obj), pp_j, f_j, obs)
        return float(render.calc_image_cost(obs, d1, lab, target_label))

    best = init
    best_cost = cost_of(init)
    history = [best_cost]
    if on_improve:
        on_improve(0, best_cost, best.copy())
    for i in range(iterations):
        cand = best.make_random(rng)
        c = cost_of(cand)
        if c < best_cost:
            best, best_cost = cand, c
            if log:
                log(f"better cost: {best_cost:.1f}")
            if on_improve:
                on_improve(i + 1, best_cost, best.copy())
        history.append(best_cost)
    return best, best_cost, history
