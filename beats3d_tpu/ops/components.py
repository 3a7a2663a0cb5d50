"""On-device connected components + two-hand group selection.

Replaces the reference's mid-frame CPU round trip: GPU depth -> host -> C++ BFS
(src/cpp_grouping/grouping.cpp:79-191) -> host -> GPU coord scatter
(3d_bz.py:222-259).  Keeping this on-device removes two transfers and a
host-sync from the frame critical path — key to the <2 ms latency target.

Algorithm: Shiloach-Vishkin-style union-find — 4-neighbor min gather, a
deterministic scatter-min *hook* onto the current root, and two rounds of path
compression per iteration, run to fixpoint under ``lax.while_loop``.  This is
O(log n) rounds even on adversarial serpentine topologies (tested), fully
deterministic (min is commutative), and needs no atomics.

Selection rule mirrors grouping.cpp:139-166: discard components with
size <= pct_thresh * num_pixels; among survivors the largest with centroid
x < dim_x/2 becomes group 1 ("right hand" — the image is mirrored) and the
largest with centroid x >= dim_x/2 becomes group 2.  Ties keep the component
encountered first in row-major scan order, which is the one with the smaller
root index — exactly what argmax-first gives us.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _gather_mm(vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``vals[idx]`` for a flat f32 table via one-hot MXU matmul.

    XLA lowers 1D dynamic gathers to ~30 ns/element scalar loops on TPU; a
    (P, NR) one-hot row-select matmul + lane mask-reduce runs the same
    gather as two dense vector/MXU ops.  Exact for integer-valued f32
    payloads < 2^24 (component labels are < h*w).
    """
    m = vals.shape[0]
    nr = (m + 127) // 128
    t2 = jnp.pad(vals, (0, nr * 128 - m)).reshape(nr, 128)
    row = idx // 128
    onehot = (
        row[:, None] == jnp.arange(nr, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    # HIGHEST: the payload values are label indices up to h*w (> 256); the
    # TPU MXU's default precision rounds f32 inputs to bf16, which corrupts
    # them and silently MERGES components (caught by the on-chip e2e drive;
    # CPU tests run f32 and cannot see it).  The matmul is tiny, the
    # multi-pass cost is noise.
    rows = jax.lax.dot(
        onehot, t2, precision=jax.lax.Precision.HIGHEST
    )  # (P, 128)
    lanesel = (idx % 128)[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(lanesel, rows, 0.0), axis=1)


@jax.jit
def label_components(mask: jnp.ndarray) -> jnp.ndarray:
    """4-connected component labels for a boolean mask.

    Shiloach-Vishkin-style union-find: gather the 4-neighbor minimum, *hook* it
    onto the current root with a deterministic scatter-min, then compress paths
    twice; iterate to fixpoint (O(log n) rounds even on adversarial serpentine
    topologies — see tests/test_components.py).

    Returns (H, W) int32: for mask pixels, the linear index of the component
    root (min linear index in the component); for background, num_pixels
    (an out-of-range sentinel).
    """
    h, w = mask.shape
    n = h * w
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ).reshape(-1)
    big = jnp.int32(n)
    mask_flat = mask.reshape(-1)
    # labels live in a length n+1 array; slot n is the background sentinel
    # (self-loop), so gathers through it stay put.
    labels0 = jnp.concatenate(
        [jnp.where(mask_flat, lin, big), jnp.array([n], jnp.int32)]
    )

    def neighbor_min(lab):
        img = lab[:n].reshape(h, w)
        pad = jnp.pad(img, 1, constant_values=big)
        m = jnp.minimum(
            jnp.minimum(pad[:-2, 1:-1], pad[2:, 1:-1]),
            jnp.minimum(pad[1:-1, :-2], pad[1:-1, 2:]),
        ).reshape(-1)
        return jnp.where(mask_flat, jnp.minimum(lab[:n], m), big)

    def compress(lab):
        """lab <- lab[lab] via the one-hot matmul gather (labels point to
        strictly-smaller same-component indices, so this is standard pointer
        doubling: reach doubles per application)."""
        g = _gather_mm(lab.astype(jnp.float32), lab).astype(jnp.int32)
        return jnp.where(mask_flat_s, g, lab)

    mask_flat_s = jnp.concatenate([mask_flat, jnp.array([False])])

    def body(state):
        lab0, _ = state
        # Several cheap elementwise min-propagation rounds (pure shifts, no
        # gathers/scatters — fast on the VPU) ...
        lab_img = lab0
        for _ in range(8):
            m = neighbor_min(lab_img)
            lab_img = jnp.concatenate(
                [m, jnp.array([n], jnp.int32)]
            )
        lab = lab_img
        # ... then two pointer-doubling compressions so the spatially
        # propagated minimum teleports along label chains — adversarial
        # serpentines converge in O(log) rounds without any scatter (the
        # reference's CPU BFS has no TPU analogue; scatters cost ~30 ns/el
        # on TPU, the matmul gather is ~free at this size).
        lab = compress(compress(lab))
        return lab, jnp.any(lab != lab0)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels0, jnp.bool_(True))
    )
    return labels[:n].reshape(h, w)


@jax.jit
def make_hand_groups(depth_small: jnp.ndarray, pct_thresh):
    """Connected components on a small depth image + left/right hand selection.

    Args:
      depth_small: (H, W) uint16 (the mipmapped depth, reference 106x60).
      pct_thresh: minimum component size as a fraction of total pixels
        (strictly greater passes; grouping.cpp:139 discards <=).

    Returns:
      groups: (H, W) uint16 stencil — 1 for the right-hand component, 2 for the
        left-hand component, 0 elsewhere (matches the image written by
        write_pixel_groups_to_stencil_image in the reference pipeline).
      g_info: (2, 3) float32 rows (size, centroid_x, centroid_y) for
        (right, left); size 0 means no group (grouping.cpp:169-190).
    """
    h, w = depth_small.shape
    n = h * w
    mask = depth_small > 0
    labels = label_components(mask)

    flat_labels = labels.reshape(-1)
    ones = mask.reshape(-1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)

    # Per-root (size, sum_x, sum_y) via one-hot matmuls instead of
    # segment_sum: TPU scatter-adds cost ~30 ns/element, while three
    # (NR, P) @ (P, 128) one-hot contractions ride the MXU.  Exact in f32
    # (sums < 2^24 at mipmap sizes).
    seg = jnp.clip(flat_labels, 0, n - 1)
    nr = (n + 127) // 128
    seg_row = seg // 128
    seg_lane = seg % 128
    onehot_row = (
        seg_row[:, None] == jnp.arange(nr, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    onehot_lane = (
        seg_lane[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)

    def seg_mm(w):
        # HIGHEST for the same reason as _gather_mm: weighted one-hot rows
        # carry coordinate products that must not be rounded to bf16.
        return jax.lax.dot(
            (onehot_row * w[:, None]).T, onehot_lane,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(-1)[:n]

    sizes = seg_mm(ones)
    sx = seg_mm(ones * xs)
    sy = seg_mm(ones * ys)

    safe_sizes = jnp.where(sizes == 0, 1.0, sizes)
    cx = sx / safe_sizes
    cy = sy / safe_sizes

    surviving = sizes / jnp.float32(n) > pct_thresh
    is_right = cx < (w / 2.0)

    right_score = jnp.where(surviving & is_right, sizes, 0.0)
    left_score = jnp.where(surviving & ~is_right, sizes, 0.0)
    r_root = jnp.argmax(right_score)
    l_root = jnp.argmax(left_score)
    r_size = right_score[r_root]
    l_size = left_score[l_root]

    groups = jnp.zeros((h, w), dtype=jnp.uint16)
    groups = jnp.where((labels == r_root) & (r_size > 0), jnp.uint16(1), groups)
    groups = jnp.where((labels == l_root) & (l_size > 0), jnp.uint16(2), groups)

    g_info = jnp.stack(
        [
            jnp.stack([r_size, cx[r_root], cy[r_root]]),
            jnp.stack([l_size, cx[l_root], cy[l_root]]),
        ]
    ).astype(jnp.float32)
    return groups, g_info
