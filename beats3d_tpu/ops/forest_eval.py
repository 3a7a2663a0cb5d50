"""Per-pixel decision-forest evaluation — the hot inference op, TPU-native.

Behavioral contract mirrors the reference CUDA kernels
(src/cuda/tree_eval.cu:24-137 ``evaluate_image_using_forest``,
:140-212 ``evaluate_image_using_tree``, :214-248 ``make_composite_labels_image``,
and the depth-difference feature src/cuda/decision_tree_common.hpp:8-28), but the
execution model is redesigned for TPU:

* traversal is *level-synchronous*: every (pixel, tree) lane advances one tree
  level per step, so each step is two image gathers + one node-table gather over
  a dense vector of lanes — no divergent per-thread loops, no early exit, static
  shapes throughout (XLA-friendly; depth D is a compile-time constant).
* the reference's shared-memory ``atomicAdd`` pdf reduction across trees
  (tree_eval.cu:123-135) becomes a deterministic sum over the tree axis.
* sentinel semantics are identical: depth 0 and 65535 are "missing"; probes that
  land out of bounds read 65535 (decision_tree_common.hpp via cu_utils Array3d
  default); a center depth of 0 makes the feature 0.

All functions are pure and jittable; shapes/static args are compile-time.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MAX_UINT16 = 65535


def _probe(depth_flat: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray, h: int, w: int):
    """Gather depth at integer coords with out-of-bounds -> 65535.

    depth_flat: (N, H*W) uint16; yy/xx: (N, ...) int32 with the same leading dim.
    """
    inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    lin = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
    n = depth_flat.shape[0]
    flat_idx = lin.reshape(n, -1)
    vals = jnp.take_along_axis(depth_flat, flat_idx, axis=1).reshape(yy.shape)
    return jnp.where(inb, vals, jnp.uint16(MAX_UINT16))


def depth_difference_feature(
    depth: jnp.ndarray,
    yd: jnp.ndarray,
    xd: jnp.ndarray,
    d_center: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    scale_factor: float = 1.0,
) -> jnp.ndarray:
    """Shotton depth-difference feature f = D(p + u/D(p)) - D(p + v/D(p)).

    Offsets are scaled by 1/depth (depth invariance) and by ``scale_factor``
    (eval resolution / train resolution).  Probe coords use floor rounding
    (reference __float2int_rd, decision_tree_common.hpp:15-22).  A center depth
    of 0 yields f = 0 (decision_tree_common.hpp:12).

    depth: (N, H, W) uint16. yd/xd/d_center: (N, ...) broadcast-compatible lane
    coords. u, v: (..., 2) float32 probe offsets per lane.
    """
    n, h, w = depth.shape
    depth_flat = depth.reshape(n, h * w)
    df = d_center.astype(jnp.float32)
    safe_df = jnp.where(df == 0, 1.0, df)
    s = jnp.float32(scale_factor)

    ux = jnp.floor(s * u[..., 0] / safe_df).astype(jnp.int32)
    uy = jnp.floor(s * u[..., 1] / safe_df).astype(jnp.int32)
    vx = jnp.floor(s * v[..., 0] / safe_df).astype(jnp.int32)
    vy = jnp.floor(s * v[..., 1] / safe_df).astype(jnp.int32)

    du = _probe(depth_flat, yd + uy, xd + ux, h, w).astype(jnp.float32)
    dv = _probe(depth_flat, yd + vy, xd + vx, h, w).astype(jnp.float32)
    f = du - dv
    return jnp.where(df == 0, jnp.float32(0.0), f)


def forest_pdf_sum(
    depth: jnp.ndarray,
    tables: Tuple,
    *,
    labels_reduce: int = 1,
    filter_images: Optional[jnp.ndarray] = None,
    filter_class: int = -1,
    scale_factor=1.0,
):
    """Traverse all trees level-synchronously; return the per-pixel summed leaf
    pdf plus eligibility/termination masks.  This is the shardable core of
    :func:`evaluate_forest`: the pdf sum over trees is a plain addition, so a
    tree-sharded (tensor-parallel) deployment computes partial sums per shard
    and combines with one ``psum`` (see beats3d_tpu.parallel.eval_sharded).

    Returns (pdf_sum (N, Hl, Wl, C) f32, eligible (N, Hl, Wl) bool,
    all_done (N, Hl, Wl) bool).
    """
    n, h, w = depth.shape
    r = labels_reduce
    hl, wl = h // r, w // r
    num_trees = tables[0][0].shape[0]
    num_classes = tables[0][3].shape[-1]
    max_depth = len(tables)

    # Reduced-grid lane coordinates at full depth-image resolution.
    yl = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 0)
    xl = jax.lax.broadcasted_iota(jnp.int32, (hl, wl), 1)
    yd = (yl * r)[None, :, :]  # (1, hl, wl) broadcasts over N
    xd = (xl * r)[None, :, :]

    d_center = depth[:, ::r, ::r]  # exact: depth[n, yl*r, xl*r]
    eligible = (d_center != 0) & (d_center != MAX_UINT16)
    if filter_images is not None:
        eligible &= filter_images.astype(jnp.int32) == filter_class

    # Lane state over (N, hl, wl, T).
    lane_shape = (n, hl, wl, num_trees)
    g = jnp.zeros(lane_shape, dtype=jnp.int32)  # within-level node index
    done = jnp.zeros(lane_shape, dtype=jnp.bool_)
    pdf_sum = jnp.zeros((n, hl, wl, num_classes), dtype=jnp.float32)

    d_center_t = d_center[..., None]  # (N, hl, wl, 1)
    yd_t = yd[..., None]
    xd_t = xd[..., None]
    tree_base = jnp.arange(num_trees, dtype=jnp.int32)  # (T,)

    for j in range(max_depth):
        uv, thresh, lr_next, pdf = tables[j]
        g_level = 1 << j
        # Flatten (T, G) tables and gather per-lane params in one shot.
        gidx = tree_base * g_level + g  # (N, hl, wl, T)
        uv_g = jnp.take(uv.reshape(num_trees * g_level, 4), gidx, axis=0)
        th_g = jnp.take(thresh.reshape(num_trees * g_level), gidx, axis=0)

        f = depth_difference_feature(
            depth, yd_t, xd_t, d_center_t, uv_g[..., 0:2], uv_g[..., 2:4],
            scale_factor,
        )
        left = f < th_g
        side = jnp.where(left, 0, 1).astype(jnp.int32)

        lr_g = jnp.take(lr_next.reshape(num_trees * g_level * 2), gidx * 2 + side, axis=0)
        descend = lr_g == -1
        hit_leaf = (~done) & (~descend)

        # Gather only the chosen-side pdf: (T*G*2, C) indexed by gidx*2+side.
        pdf_g = jnp.take(
            pdf.reshape(num_trees * g_level * 2, num_classes), gidx * 2 + side, axis=0
        )
        pdf_sum = pdf_sum + jnp.sum(
            jnp.where(hit_leaf[..., None], pdf_g, 0.0), axis=3
        )

        g = jnp.where((~done) & descend, 2 * g + side, g)
        done = done | hit_leaf

    return pdf_sum, eligible, jnp.all(done, axis=-1)


def labels_from_pdf(pdf_sum, eligible, all_done, write_all_eligible=True):
    """Argmax + eligibility masking (the k==0 epilogue, tree_eval.cu:132-135)."""
    labels = jnp.argmax(pdf_sum, axis=-1).astype(jnp.uint16)
    write = eligible if write_all_eligible else (eligible & all_done)
    return jnp.where(write, labels, jnp.uint16(MAX_UINT16))


@functools.partial(
    jax.jit,
    static_argnames=(
        "labels_reduce",
        "filter_class",
        "write_all_eligible",
    ),
)
def evaluate_forest(
    depth: jnp.ndarray,
    tables: Tuple,
    *,
    labels_reduce: int = 1,
    filter_images: Optional[jnp.ndarray] = None,
    filter_class: int = -1,
    scale_factor=1.0,
    write_all_eligible: bool = True,
) -> jnp.ndarray:
    """Classify every (reduced) pixel of N depth images with a packed forest.

    Args:
      depth: (N, H, W) uint16 with 0/65535 missing sentinels.
      tables: ``PackedForest.tables()`` pytree — per-level SoA node tables.
      labels_reduce: classify every r-th pixel (reference tree_eval.cu:45-46,69-70).
      filter_images: optional (N, H//r, W//r) uint16; only pixels whose filter
        label equals ``filter_class`` are evaluated (tree_eval.cu:81-85).
      scale_factor: probe-offset scale for eval-res != train-res
        (tree_eval.cu:104, decision_tree.py:330). May be a traced scalar.
      write_all_eligible: True = forest-kernel semantics (every eligible pixel
        gets argmax label, even if no tree reached a leaf -> label 0,
        tree_eval.cu:132-135). False = single-tree-kernel semantics (pixels
        whose traversal never terminated keep 65535, tree_eval.cu:177-210).

    Returns (N, H//r, W//r) uint16 labels; 65535 where not evaluated.
    """
    pdf_sum, eligible, all_done = forest_pdf_sum(
        depth,
        tables,
        labels_reduce=labels_reduce,
        filter_images=filter_images,
        filter_class=filter_class,
        scale_factor=scale_factor,
    )
    return labels_from_pdf(pdf_sum, eligible, all_done, write_all_eligible)


def evaluate_tree(depth: jnp.ndarray, tables: Tuple) -> jnp.ndarray:
    """Single-tree per-pixel classification (reference ``evaluate_image_using_tree``,
    tree_eval.cu:140-212): full resolution, no filtering, unit scale; pixels whose
    traversal does not terminate keep 65535."""
    return evaluate_forest(
        depth,
        tables,
        labels_reduce=1,
        filter_images=None,
        filter_class=-1,
        scale_factor=1.0,
        write_all_eligible=False,
    )


@jax.jit
def composite_labels(label_images: jnp.ndarray, conditions: jnp.ndarray) -> jnp.ndarray:
    """Combine per-layer label images into final class ids via a conditions table.

    Mirrors reference ``make_composite_labels_image`` (tree_eval.cu:214-248) and the
    conditions semantics documented at decision_tree.py:209-225: for each pixel,
    walk the layer images in order with a running table offset; a row
    ``(0, CLASS_ID)`` at ``conditions[offset + label - 1]`` emits CLASS_ID, a row
    ``(1, NEXT_OFFSET)`` continues to the next layer image with the new offset.
    A label of 0/65535 at any step leaves the pixel unlabeled (65535).

    Args:
      label_images: (M, N, Hl, Wl) uint16 — one label image per layer model.
      conditions: (K, 2) int32.

    Returns (N, Hl, Wl) uint16 composite labels.
    """
    m = label_images.shape[0]
    out_shape = label_images.shape[1:]
    k = conditions.shape[0]

    offset = jnp.zeros(out_shape, dtype=jnp.int32)
    out = jnp.full(out_shape, MAX_UINT16, dtype=jnp.uint16)
    done = jnp.zeros(out_shape, dtype=jnp.bool_)

    for i in range(m):
        l = label_images[i].astype(jnp.int32)
        invalid = (l == 0) | (l == MAX_UINT16)
        row_idx = jnp.clip(offset + l - 1, 0, k - 1)
        flag = conditions[:, 0][row_idx]
        val = conditions[:, 1][row_idx]
        active = (~done) & (~invalid)
        emit = active & (flag == 0)
        out = jnp.where(emit, val.astype(jnp.uint16), out)
        offset = jnp.where(active & (flag == 1), val, offset)
        done = done | invalid | emit

    return out
