"""Decision-forest training, TPU-native.

Level-by-level greedy best-split search mirroring the reference trainer's
behavior (src/decision_tree.py:373-601 + src/cuda/tree_train.cu), redesigned
for the MXU:

* The reference's atomicAdd histogram kernel (tree_train.cu:4-64) — one thread
  per (pixel, proposal) scattering uint64 increments — becomes a **one-hot
  matmul**: for a pixel chunk, build M[px, m*C + c] = 1 iff the pixel sits in
  eligible parent node m with label c, evaluate all proposals' split bits
  b[j, px], and compute ``left = b @ M`` on the MXU.  Deterministic integer
  counts (f32 exact below 2^24 per chunk, accumulated in int32), zero atomics.
  For deep levels where the one-hot would not fit, a segment-sum path with the
  identical contract takes over.
* The reference's triple blocking — image blocks x proposal blocks x node
  blocks (decision_tree.py:452-534, MAX 2^17 next nodes per pass :427) — is
  preserved structurally: the same streaming order, the same eligibility rule
  (tree_train.cu:42,135), the same "best gain seen so far" merge across
  proposal blocks with strict > (tree_train.cu:140,172).
* Split selection (gini gain, zero-gain double-leaf, >= 99.9% purity cutoff,
  depth-limit leaves — tree_train.cu:99-236) runs vectorized on device per
  proposal block; the few-KB per-level tree writes happen host-side into the
  reference-layout packed tree.
* Per-pixel node advancement (tree_train.cu:275-324) is a vectorized re-eval
  of each pixel's chosen split.

The reference keeps the dataset GPU-resident via nvcomp compression
(compressed_blocks.py); HBM is large enough here that blocks are shipped
per use and optionally cached on device.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forest import DecisionTree
from .proposals import make_random_features

MAX_UINT16 = 65535
CUTOFF_THRESH = 0.999  # tree_train.cu:201


# ---------------------------------------------------------------------------
# feature evaluation over flattened multi-image pixel chunks
# ---------------------------------------------------------------------------

def _chunk_features(depth_flat, b, y, x, d_center, props, h, w):
    """Depth-difference features for a pixel chunk under all proposals.

    depth_flat: (B*H*W,) uint16; b/y/x/d_center: (chunk,) int32/uint16;
    props: (P, 5).  Returns f_val (P, chunk) float32 with the exact reference
    semantics (floor offsets, OOB -> 65535, center 0 -> f = 0).
    """
    df = d_center.astype(jnp.float32)
    safe = jnp.where(df == 0, 1.0, df)[None, :]  # (1, chunk)

    def probe(cx, cy):
        dx = jnp.floor(cx[:, None] / safe).astype(jnp.int32)
        dy = jnp.floor(cy[:, None] / safe).astype(jnp.int32)
        ty = y[None, :] + dy
        tx = x[None, :] + dx
        inb = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
        lin = (
            b[None, :] * (h * w)
            + jnp.clip(ty, 0, h - 1) * w
            + jnp.clip(tx, 0, w - 1)
        )
        # chunk-padding pixels carry b == num_images, putting lin past the
        # flat array; their features are don't-care (nodes == -1 masks them
        # out of every histogram) but the clamp must be EXPLICIT so the
        # checkify sanitizer lane stays meaningful (tests/test_checkify.py)
        lin = jnp.clip(lin, 0, depth_flat.shape[0] - 1)
        vals = jnp.take(depth_flat, lin.reshape(-1)).reshape(lin.shape)
        return jnp.where(inb, vals, jnp.uint16(MAX_UINT16)).astype(jnp.float32)

    f = probe(props[:, 0], props[:, 1]) - probe(props[:, 2], props[:, 3])
    return jnp.where(df[None, :] == 0, 0.0, f)


# ---------------------------------------------------------------------------
# jitted training steps
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "w2", "node_lo", "chunk", "use_matmul"),
)
def _histogram_step(
    depth, labels, nodes, props, *, num_classes, w2, node_lo, chunk, use_matmul
):
    """Child-class histogram for one (image block, proposal block, node block).

    depth/labels: (B, H, W) uint16; nodes: (B, H, W) int32 (-1 = inactive);
    props: (P, 5).  ``w2`` parent slots cover nodes [node_lo//2, node_lo//2+w2).

    Returns (left (P, w2, C) int32, total (w2, C) int32): left-child counts per
    proposal and total (left+right) counts per parent.
    """
    bsz, h, w = depth.shape
    npx = bsz * h * w
    p = props.shape[0]
    c = num_classes
    parent_lo = node_lo // 2

    depth_flat = depth.reshape(-1)
    labels_flat = labels.reshape(-1).astype(jnp.int32)
    nodes_flat = nodes.reshape(-1)

    pad = (-npx) % chunk
    if pad:
        depth_flat = jnp.pad(depth_flat, (0, pad))
        labels_flat = jnp.pad(labels_flat, (0, pad))
        nodes_flat = jnp.pad(nodes_flat, (0, pad), constant_values=-1)
    n_chunks = (npx + pad) // chunk

    lin_all = jnp.arange(npx + pad, dtype=jnp.int32)
    b_all = lin_all // (h * w)
    rem = lin_all % (h * w)
    y_all = rem // w
    x_all = rem % w

    def body(carry, i):
        left_acc, total_acc = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        node = sl(nodes_flat)
        # eligibility: children in [node_lo, node_lo + 2*w2)   (tree_train.cu:42)
        m_local = node - parent_lo
        active = (node >= 0) & (m_local >= 0) & (m_local < w2)
        label = sl(labels_flat)
        bb, yy, xx = sl(b_all), sl(y_all), sl(x_all)

        f = _chunk_features(depth_flat, bb, yy, xx, sl(depth_flat), props, h, w)
        is_left = (f < props[:, 4][:, None]).astype(jnp.float32)  # (P, chunk)

        col = jnp.clip(m_local, 0, w2 - 1) * c + label
        if use_matmul:
            onehot = (
                (col[:, None] == jnp.arange(w2 * c, dtype=jnp.int32)[None, :])
                & active[:, None]
            ).astype(jnp.float32)
            left = jnp.dot(is_left, onehot, preferred_element_type=jnp.float32)
            total = jnp.sum(onehot, axis=0)
        else:
            seg = jnp.where(active, col, w2 * c)
            total = jax.ops.segment_sum(
                jnp.ones_like(seg, jnp.float32), seg, num_segments=w2 * c + 1
            )[: w2 * c]
            seg_p = seg[None, :] + jnp.arange(p, dtype=jnp.int32)[:, None] * (
                w2 * c + 1
            )
            left = jax.ops.segment_sum(
                is_left.reshape(-1),
                seg_p.reshape(-1),
                num_segments=p * (w2 * c + 1),
            ).reshape(p, w2 * c + 1)[:, : w2 * c]
        return (
            left_acc + left.astype(jnp.int32),
            total_acc + total.astype(jnp.int32),
        ), None

    # int32 accumulators: per-chunk counts are exact in f32 (chunk < 2^24) and
    # a bin can hold at most the dataset's labeled-pixel count, which the
    # trainer guards to < 2^31 (a ~5000-image 848x480 dataset).
    init = (
        jnp.zeros((p, w2 * c), jnp.int32),
        jnp.zeros((w2 * c,), jnp.int32),
    )
    (left, total), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return left.reshape(p, w2, c), total.reshape(w2, c)


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "w2", "node_lo", "chunk", "use_matmul",
                     "num_props"),
)
def _histogram_step_from_bits(
    bits, labels, nodes, *, num_classes, w2, node_lo, chunk, use_matmul,
    num_props,
):
    """:func:`_histogram_step` with the feature evaluation already done:
    ``bits`` (B, ceil(P/32), H, W) int32 packed split bits from
    ops.train_features_pallas.train_feature_bits (the TPU-kernel fast path —
    XLA's scalarized probe gathers are ~36 ns/element, the kernel's windowed
    lane shuffles ~1000x that)."""
    bsz, p32, h, w = bits.shape
    npx = bsz * h * w
    p = num_props
    c = num_classes
    parent_lo = node_lo // 2

    bits_flat = bits.transpose(1, 0, 2, 3).reshape(p32, npx)
    labels_flat = labels.reshape(-1).astype(jnp.int32)
    nodes_flat = nodes.reshape(-1)

    pad = (-npx) % chunk
    if pad:
        bits_flat = jnp.pad(bits_flat, ((0, 0), (0, pad)))
        labels_flat = jnp.pad(labels_flat, (0, pad))
        nodes_flat = jnp.pad(nodes_flat, (0, pad), constant_values=-1)
    n_chunks = (npx + pad) // chunk

    word_idx = jnp.arange(p, dtype=jnp.int32) // 32
    shifts = (jnp.arange(p, dtype=jnp.int32) % 32)[:, None]

    def body(carry, i):
        left_acc, total_acc = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        node = sl(nodes_flat)
        m_local = node - parent_lo
        active = (node >= 0) & (m_local >= 0) & (m_local < w2)
        label = sl(labels_flat)
        wsl = jax.lax.dynamic_slice_in_dim(bits_flat, i * chunk, chunk, axis=1)
        is_left = (
            (wsl[word_idx] >> shifts) & 1
        ).astype(jnp.float32)  # (P, chunk)

        col = jnp.clip(m_local, 0, w2 - 1) * c + label
        if use_matmul:
            onehot = (
                (col[:, None] == jnp.arange(w2 * c, dtype=jnp.int32)[None, :])
                & active[:, None]
            ).astype(jnp.float32)
            left = jnp.dot(is_left, onehot, preferred_element_type=jnp.float32)
            total = jnp.sum(onehot, axis=0)
        else:
            seg = jnp.where(active, col, w2 * c)
            total = jax.ops.segment_sum(
                jnp.ones_like(seg, jnp.float32), seg, num_segments=w2 * c + 1
            )[: w2 * c]
            seg_p = seg[None, :] + jnp.arange(p, dtype=jnp.int32)[:, None] * (
                w2 * c + 1
            )
            left = jax.ops.segment_sum(
                is_left.reshape(-1),
                seg_p.reshape(-1),
                num_segments=p * (w2 * c + 1),
            ).reshape(p, w2 * c + 1)[:, : w2 * c]
        return (
            left_acc + left.astype(jnp.int32),
            total_acc + total.astype(jnp.int32),
        ), None

    init = (
        jnp.zeros((p, w2 * c), jnp.int32),
        jnp.zeros((w2 * c,), jnp.int32),
    )
    (left, total), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return left.reshape(p, w2, c), total.reshape(w2, c)


def _gini_impurity(counts):
    """counts (..., C) float32 -> impurity, float math as tree_train.cu:72-80.

    Empty histograms (a proposal sending zero pixels one way) use a safe
    denominator: their impurity is masked out by the lsum/rsum == 0 gate in
    _pick_best_step either way (tree_train.cu:158-160), and the explicit
    guard keeps the checkify sanitizer lane meaningful."""
    s = jnp.sum(counts, axis=-1, keepdims=True)
    pr = counts / jnp.where(s == 0.0, 1.0, s)
    return 1.0 - jnp.sum(pr * pr, axis=-1)


@functools.partial(jax.jit, static_argnames=("w2", "parent_lo"))
def _pick_best_step(
    active_nodes, parent_counts, left, total, props,
    best_gain, best_params, best_left, best_right,
    *, w2, parent_lo,
):
    """Merge one proposal block's gains into the per-active-node running best.

    active_nodes: (A,) int32 (-1 padding); parent_counts: (A, C) f32;
    left: (P, w2, C) int64; total: (w2, C) int64; props (P, 5).
    best_*: running state (A,), (A, 5), (A, C), (A, C).
    Strictly-greater replacement across blocks (tree_train.cu:140,172).
    """
    m_local = active_nodes - parent_lo
    eligible = (active_nodes >= 0) & (m_local >= 0) & (m_local < w2)
    m_safe = jnp.clip(m_local, 0, w2 - 1)

    l = left[:, m_safe, :].astype(jnp.float32)          # (P, A, C)
    t = total[m_safe, :].astype(jnp.float32)            # (A, C)
    r = t[None] - l

    lsum = jnp.sum(l, axis=-1)
    rsum = jnp.sum(r, axis=-1)
    psum = jnp.sum(parent_counts, axis=-1)              # (A,)

    p_imp = _gini_impurity(parent_counts)               # (A,)
    remainder = (lsum / psum[None]) * _gini_impurity(l) + (
        rsum / psum[None]
    ) * _gini_impurity(r)
    g = p_imp[None] - remainder
    g = jnp.where((lsum == 0) | (rsum == 0), 0.0, g)    # tree_train.cu:158-160

    best_j = jnp.argmax(g, axis=0)                      # first max, like the scan
    arange_a = jnp.arange(active_nodes.shape[0])
    g_best = g[best_j, arange_a]

    improve = eligible & (g_best > best_gain)
    new_gain = jnp.where(improve, g_best, best_gain)
    new_params = jnp.where(improve[:, None], props[best_j], best_params)
    new_left = jnp.where(improve[:, None], l[best_j, arange_a], best_left)
    new_right = jnp.where(improve[:, None], r[best_j, arange_a], best_right)
    return new_gain, new_params, new_left, new_right


@functools.partial(jax.jit, static_argnames=())
def _advance_step(depth, nodes, level_params, level_status):
    """Advance nodes_by_pixel through the freshly written level
    (tree_train.cu:275-324).

    level_params: (G, 5) f32 chosen features; level_status: (G, 2) int32
    floor(l_next/r_next); nodes: (B, H, W) int32.
    """
    bsz, h, w = depth.shape
    depth_flat = depth.reshape(-1)
    nodes_flat = nodes.reshape(-1)
    npx = nodes_flat.shape[0]

    lin = jnp.arange(npx, dtype=jnp.int32)
    b = lin // (h * w)
    rem = lin % (h * w)
    y = rem // w
    x = rem % w

    act = nodes_flat >= 0
    node_safe = jnp.where(act, nodes_flat, 0)
    pr = level_params[node_safe]                         # (npx, 5)
    # feature eval with per-pixel params (not per-proposal)
    df = depth_flat.astype(jnp.float32)
    safe = jnp.where(df == 0, 1.0, df)

    def probe(cx, cy):
        dx = jnp.floor(cx / safe).astype(jnp.int32)
        dy = jnp.floor(cy / safe).astype(jnp.int32)
        ty = y + dy
        tx = x + dx
        inb = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
        gl = b * (h * w) + jnp.clip(ty, 0, h - 1) * w + jnp.clip(tx, 0, w - 1)
        vals = jnp.take(depth_flat, gl)
        return jnp.where(inb, vals, jnp.uint16(MAX_UINT16)).astype(jnp.float32)

    fv = probe(pr[:, 0], pr[:, 1]) - probe(pr[:, 2], pr[:, 3])
    fv = jnp.where(df == 0, 0.0, fv)

    is_left = fv < pr[:, 4]
    side = jnp.where(is_left, 0, 1)
    status = jnp.take_along_axis(
        level_status[node_safe], side[:, None], axis=1
    )[:, 0]
    nxt = jnp.where(status == -1, node_safe * 2 + side, -1)
    return jnp.where(act, nxt, -1).reshape(nodes.shape)


# ---------------------------------------------------------------------------
# host-side trainer
# ---------------------------------------------------------------------------

class DecisionTreeTrainer:
    """Streaming level-wise trainer (reference DecisionTreeTrainer,
    decision_tree.py:373-601)."""

    def __init__(
        self,
        num_images_per_image_block: int,
        num_proposals_per_proposal_block: int,
        max_nodes_per_block: int = 1 << 17,   # decision_tree.py:427
        matmul_bins_limit: int = 1 << 14,
        pixel_chunk: int = 1 << 13,
        streaming: bool = False,
        mesh=None,
        feature_backend: str = "auto",
        stream_codec: bool = True,
    ):
        """``streaming=True`` bounds device memory: image/label/node blocks
        live on the HOST (optionally zlib-compressed via
        data.blocks.CompressedDataset) and ship to the device per use — the
        reference's nvcomp economy (compressed_blocks.py decompress-per-use,
        decision_tree.py:505-510) with HBM as the scarce resource instead of
        GPU RAM.  ``mesh`` (a jax Mesh with 'data' and 'model' axes) runs the
        histogram step data-parallel over image rows and model-parallel over
        proposals with exact integer psum merging — bit-identical trees to
        the single-chip path."""
        self.images_per_block = num_images_per_image_block
        self.proposals_per_block = num_proposals_per_proposal_block
        self.max_nodes_per_block = max_nodes_per_block
        self.matmul_bins_limit = matmul_bins_limit
        self.pixel_chunk = pixel_chunk
        self.streaming = streaming
        # streaming blocks ship RLE-compressed and decode ON DEVICE
        # (data.device_codec, the reference's nvcomp-per-use economy,
        # compressed_blocks.py:106,158): h2d bytes — and the axon client's
        # staging retention, the round-3 streaming blocker — shrink by the
        # block compression ratio.
        self.stream_codec = stream_codec
        self.mesh = mesh
        if feature_backend == "auto":
            import jax as _jax

            feature_backend = (
                "pallas"
                if mesh is None and _jax.devices()[0].platform == "tpu"
                else "xla"
            )
        self.feature_backend = feature_backend

    def allocate(self, dataset, num_random_features: int, max_tree_depth: int):
        assert dataset.num_images % self.images_per_block == 0
        assert dataset.num_pixels() < 2**31, (
            "int32 histogram accumulators: split the dataset"
        )
        assert num_random_features % self.proposals_per_block == 0
        if self.mesh is not None:
            assert self.images_per_block % self.mesh.shape["data"] == 0, (
                "image block size must divide the mesh data axis"
            )
            assert self.proposals_per_block % self.mesh.shape["model"] == 0, (
                "proposal block size must divide the mesh model axis"
            )
        self.num_random_features = num_random_features
        self.max_tree_depth = max_tree_depth
        self.num_image_blocks = dataset.num_images // self.images_per_block
        self.num_proposal_blocks = (
            num_random_features // self.proposals_per_block
        )

    # -- one tree ------------------------------------------------------------
    def train(self, dataset, tree: DecisionTree, rng: Optional[np.random.Generator] = None,
              proposals_per_level: Optional[List[List[np.ndarray]]] = None):
        """Train ``tree`` in place.  ``proposals_per_level`` (tests only)
        injects fixed proposals: list over levels of lists over proposal
        blocks of (P, 5) arrays."""
        rng = rng or np.random.default_rng()
        c = dataset.num_classes()
        d = self.max_tree_depth
        tree.data[:] = 0.0

        w, h = dataset.img_dims
        resident = not self.streaming
        # per-image-block state: device-resident, or host-side shipped per use
        depth_blocks = []
        labels_blocks = []
        nodes_blocks = []
        nodes_store = None
        # [depth, labels, nodes] DeviceCodecDynamic stores (built lazily
        # at the first block once shapes are known) when stream_codec is on
        codec_stores = (
            [None, None, None]
            if (not resident and self.stream_codec) else None
        )
        if not resident and codec_stores is None:
            # Streaming mode keeps the mutable per-pixel node state
            # zlib-compressed on the host, re-compressed after every level's
            # advance — the reference's CompressedBlocksDynamic economy
            # (compressed_blocks.py:9-93, rewritten at decision_tree.py:
            # 442,465,510,596).  Node images are mostly -1 with coherent
            # per-node runs, so they pack 20-60x; a 5k-image 848x480 dataset
            # drops from ~8 GB of host node state to a few hundred MB.
            from ..data.blocks import CompressedBlocksDynamic

            nodes_store = CompressedBlocksDynamic(
                self.num_image_blocks, self.images_per_block,
                dataset.img_dims,
            )
        node_counts = np.zeros((1 << d, c), dtype=np.int64)
        for i in range(self.num_image_blocks):
            lab = dataset.get_labels_block(i)
            un, cnt = np.unique(lab, return_counts=True)
            for label_id, n in zip(un, cnt):
                if label_id > 0:
                    node_counts[0, label_id] += n
            nodes = np.full(lab.shape, -1, dtype=np.int32)
            nodes[lab > 0] = 0
            if resident:
                depth_blocks.append(jnp.asarray(dataset.get_depth_block(i)))
                labels_blocks.append(jnp.asarray(lab))
                nodes_blocks.append(jnp.asarray(nodes))
            elif codec_stores is not None:
                db = np.asarray(dataset.get_depth_block(i))
                if codec_stores[0] is None:
                    from ..data.device_codec import DeviceCodecDynamic

                    codec_stores[0] = DeviceCodecDynamic(
                        self.num_image_blocks, db.shape, db.dtype
                    )
                    codec_stores[1] = DeviceCodecDynamic(
                        self.num_image_blocks, lab.shape, lab.dtype
                    )
                    codec_stores[2] = DeviceCodecDynamic(
                        self.num_image_blocks, nodes.shape, nodes.dtype
                    )
                codec_stores[0].write_block(i, db)
                codec_stores[1].write_block(i, np.asarray(lab))
                codec_stores[2].write_block(i, nodes)
            else:
                nodes_store.write_block(i, nodes)

        def fetch(ib):
            """(depth, labels, nodes) device arrays for one image block."""
            if resident:
                return depth_blocks[ib], labels_blocks[ib], nodes_blocks[ib]
            if codec_stores is not None:
                # device-side decode: only RLE buffers cross h2d
                return (
                    codec_stores[0].get_block(ib),
                    codec_stores[1].get_block(ib),
                    codec_stores[2].get_block(ib),
                )
            return (
                jnp.asarray(dataset.get_depth_block(ib)),
                jnp.asarray(dataset.get_labels_block(ib)),
                jnp.asarray(nodes_store.get_block(ib)),
            )

        if self.mesh is not None:
            from ..parallel.train_sharded import sharded_histogram_step

        active = np.array([0], dtype=np.int32)

        for level in range(d):
            if len(active) == 0:
                break
            a = len(active)
            active_j = jnp.asarray(active)
            parent_counts = jnp.asarray(node_counts[active].astype(np.float32))

            best_gain = jnp.full((a,), -1.0, jnp.float32)
            best_params = jnp.zeros((a, 5), jnp.float32)
            best_left = jnp.zeros((a, c), jnp.float32)
            best_right = jnp.zeros((a, c), jnp.float32)

            max_next = 1 << (level + 1)
            if max_next > self.max_nodes_per_block:
                assert max_next % self.max_nodes_per_block == 0
                node_blocks = [
                    (i * self.max_nodes_per_block, (i + 1) * self.max_nodes_per_block)
                    for i in range(max_next // self.max_nodes_per_block)
                ]
            else:
                node_blocks = [(0, max_next)]

            for pb in range(self.num_proposal_blocks):
                if proposals_per_level is not None:
                    props_np = proposals_per_level[level][pb]
                else:
                    props_np = make_random_features(self.proposals_per_block, rng)
                props = jnp.asarray(props_np)

                # Pallas feature path: split bits once per (proposal block,
                # image block), reused across node blocks (resident mode).
                bits_cache = {}

                def feature_bits(ib, d_b, n_b):
                    if ib in bits_cache:
                        return bits_cache[ib]
                    from ..ops.train_features_pallas import train_feature_bits

                    bits = train_feature_bits(d_b, props, n_b >= 0)
                    if resident and len(node_blocks) > 1:
                        bits_cache[ib] = bits
                    return bits

                for (lo, hi) in node_blocks:
                    w2 = (hi - lo) // 2
                    use_matmul = w2 * c <= self.matmul_bins_limit
                    left = jnp.zeros((self.proposals_per_block, w2, c), jnp.int32)
                    total = jnp.zeros((w2, c), jnp.int32)
                    in_flight = []
                    for ib in range(self.num_image_blocks):
                        d_b, l_b, n_b = fetch(ib)
                        if self.mesh is not None:
                            l_i, t_i = sharded_histogram_step(
                                d_b, l_b, n_b, props, self.mesh,
                                num_classes=c, w2=w2, node_lo=lo,
                                chunk=self.pixel_chunk,
                                use_matmul=use_matmul,
                            )
                        elif self.feature_backend == "pallas":
                            l_i, t_i = _histogram_step_from_bits(
                                feature_bits(ib, d_b, n_b), l_b, n_b,
                                num_classes=c, w2=w2, node_lo=lo,
                                chunk=self.pixel_chunk,
                                use_matmul=use_matmul,
                                num_props=self.proposals_per_block,
                            )
                        else:
                            l_i, t_i = _histogram_step(
                                d_b, l_b, n_b, props,
                                num_classes=c,
                                w2=w2,
                                node_lo=lo,
                                chunk=self.pixel_chunk,
                                use_matmul=use_matmul,
                            )
                        left = left + l_i
                        total = total + t_i
                        if not resident:
                            # Bound host staging: fully-async streaming
                            # pins every shipped block's host buffer, and a
                            # deep tree's uploads (~25 GB/level-pass x
                            # levels) exhaust host RAM.  Sync every few
                            # blocks, then EXPLICITLY delete the consumed
                            # device arrays — on the axon runtime the
                            # staging is only released when the device
                            # buffer dies, not at the sync.
                            in_flight.append((d_b, l_b, n_b))
                            if (ib % 4 == 3
                                    or ib == self.num_image_blocks - 1):
                                # the tail blocks of a non-multiple-of-4
                                # level must drain too, or their staging
                                # survives level finalize + advance
                                jax.device_get(total[0, 0])
                                for arrs in in_flight:
                                    for a in arrs:
                                        a.delete()
                                in_flight = []

                    best_gain, best_params, best_left, best_right = (
                        _pick_best_step(
                            active_j, parent_counts, left, total, props,
                            best_gain, best_params, best_left, best_right,
                            w2=w2, parent_lo=lo // 2,
                        )
                    )

            # -- finalize this level (host, few KB) --------------------------
            bg = np.asarray(best_gain)
            bp = np.asarray(best_params)
            bl = np.asarray(best_left)
            br = np.asarray(best_right)
            next_active = []
            for i, node in enumerate(active):
                flat = (1 << level) - 1 + int(node)
                tree.data[flat, 0:5] = bp[i]
                parent = node_counts[node].astype(np.float64)
                if bg[i] <= 0.0:  # no gain: double leaf w/ parent pdf
                    psum = parent.sum()
                    pdf = (parent / psum).astype(np.float32)
                    tree.data[flat, 5] = 0.0
                    tree.data[flat, 6] = 0.0
                    tree.data[flat, 7 : 7 + c] = pdf
                    tree.data[flat, 7 + c : 7 + 2 * c] = pdf
                    continue
                for side, counts in ((0, bl[i]), (1, br[i])):
                    child = int(node) * 2 + side
                    col = 5 + side
                    pdf0 = 7 + side * c
                    ssum = counts.sum()
                    frac = counts / ssum
                    cut = -1
                    for k in range(c):
                        if frac[k] >= CUTOFF_THRESH:
                            cut = k
                            break
                    if cut > -1:
                        tree.data[flat, col] = 0.0
                        tree.data[flat, pdf0 + cut] = 1.0
                    elif level == d - 1:
                        tree.data[flat, col] = 0.0
                        tree.data[flat, pdf0 : pdf0 + c] = frac.astype(np.float32)
                    else:
                        tree.data[flat, col] = -1.0
                        node_counts[child] = counts.astype(np.int64)
                        next_active.append(child)

            if level == d - 1 or not next_active:
                break

            # -- advance pixels through the freshly written level -------------
            g = 1 << level
            lvl = tree.data[(1 << level) - 1 : (1 << (level + 1)) - 1]
            level_params = jnp.asarray(lvl[:, 0:5])
            level_status = jnp.asarray(np.floor(lvl[:, 5:7]).astype(np.int32))
            for ib in range(self.num_image_blocks):
                d_b, l_b, n_b = fetch(ib)
                advanced = _advance_step(d_b, n_b, level_params, level_status)
                if resident:
                    nodes_blocks[ib] = advanced
                else:
                    if codec_stores is not None:
                        codec_stores[2].write_block(
                            ib, np.asarray(advanced)
                        )
                    else:
                        nodes_store.write_block(ib, np.asarray(advanced))
                    for a in (d_b, l_b, n_b, advanced):
                        a.delete()
            if not resident:
                # release per-level transfer staging promptly (see the
                # in-loop drain above); also surface host-RAM growth so a
                # staging leak is visible in the training log
                import gc

                gc.collect()
                # log EVERY level: deep streamed levels can run past the
                # supervisor's log-staleness window, and a silent healthy
                # level is indistinguishable from a wedged RPC
                # (scripts/train_supervised.sh would kill a live run)
                rss = 0
                try:
                    with open("/proc/self/status") as f:
                        for ln in f:
                            if ln.startswith("VmRSS"):
                                rss = int(ln.split()[1])
                except OSError:
                    pass
                print(f"    [stream] level {level} done, "
                      f"rss={rss / 1e6:.1f}G", flush=True)
            active = np.array(sorted(next_active), dtype=np.int32)

        return tree
