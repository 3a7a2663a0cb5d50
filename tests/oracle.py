"""Scalar numpy oracle implementing the *reference semantics* (as documented in
SURVEY.md and the reference CUDA sources) with naive per-pixel loops.  Used only
by tests to check parity of the TPU implementations on tiny inputs.  Written
independently from the reference code — this is a behavioral spec, not a port.
"""

from __future__ import annotations

import math

import numpy as np

MAX_UINT16 = 65535


def depth_get(depth: np.ndarray, y: int, x: int) -> int:
    """Bounds-checked read with 65535 out-of-bounds default."""
    h, w = depth.shape
    if y < 0 or y >= h or x < 0 or x >= w:
        return MAX_UINT16
    return int(depth[y, x])


def compute_feature(depth, x, y, u, v, scale=1.0):
    """Shotton depth-difference feature, floor rounding, 0 if center missing."""
    d = int(depth[y, x])
    if d == 0:
        return 0.0
    df = np.float32(d)
    ux = x + int(math.floor(np.float32(scale) * np.float32(u[0]) / df))
    uy = y + int(math.floor(np.float32(scale) * np.float32(u[1]) / df))
    vx = x + int(math.floor(np.float32(scale) * np.float32(v[0]) / df))
    vy = y + int(math.floor(np.float32(scale) * np.float32(v[1]) / df))
    return float(np.float32(depth_get(depth, uy, ux)) - np.float32(depth_get(depth, vy, vx)))


def _node(tree_flat, level, g):
    return tree_flat[(1 << level) - 1 + g]


def eval_tree(depth_images, tree_flat, max_depth, num_classes):
    """Single-tree per-pixel labels; 65535 where not evaluated / no leaf hit."""
    n, h, w = depth_images.shape
    out = np.full((n, h, w), MAX_UINT16, dtype=np.uint16)
    for i in range(n):
        for y in range(h):
            for x in range(w):
                d = int(depth_images[i, y, x])
                if d == 0 or d == MAX_UINT16:
                    continue
                g = 0
                for level in range(max_depth):
                    nd = _node(tree_flat, level, g)
                    u, v, thresh = nd[0:2], nd[2:4], nd[4]
                    l_next = int(math.floor(nd[5]))
                    r_next = int(math.floor(nd[6]))
                    f = compute_feature(depth_images[i], x, y, u, v)
                    if f < thresh:
                        if l_next == -1:
                            g = g * 2
                        else:
                            pdf = nd[7 : 7 + num_classes]
                            out[i, y, x] = best_pdf_class(pdf)
                            break
                    else:
                        if r_next == -1:
                            g = g * 2 + 1
                        else:
                            pdf = nd[7 + num_classes : 7 + 2 * num_classes]
                            out[i, y, x] = best_pdf_class(pdf)
                            break
    return out


def best_pdf_class(pdf):
    """argmax with 'strictly greater than current best (init 0)' semantics."""
    best_pct, best_class = 0.0, 0
    for j, p in enumerate(pdf):
        if p > best_pct:
            best_pct, best_class = p, j
    return best_class


def eval_forest(
    depth_images,
    forest_flat,
    max_depth,
    num_classes,
    labels_reduce=1,
    filter_images=None,
    filter_class=-1,
    scale_factor=1.0,
):
    """Forest eval: summed per-tree leaf pdfs, argmax; every eligible pixel is
    written (65535 elsewhere)."""
    n, h, w = depth_images.shape
    r = labels_reduce
    hl, wl = h // r, w // r
    t = forest_flat.shape[0]
    out = np.full((n, hl, wl), MAX_UINT16, dtype=np.uint16)
    for i in range(n):
        for yl in range(hl):
            for xl in range(wl):
                if filter_images is not None:
                    if int(filter_images[i, yl, xl]) != filter_class:
                        continue
                yd, xd = yl * r, xl * r
                d = int(depth_images[i, yd, xd])
                if d == 0 or d == MAX_UINT16:
                    continue
                pdf_sum = np.zeros(num_classes, dtype=np.float64)
                for k in range(t):
                    g = 0
                    for level in range(max_depth):
                        nd = _node(forest_flat[k], level, g)
                        u, v, thresh = nd[0:2], nd[2:4], nd[4]
                        l_next = int(math.floor(nd[5]))
                        r_next = int(math.floor(nd[6]))
                        f = compute_feature(
                            depth_images[i], xd, yd, u, v, scale_factor
                        )
                        if f < thresh:
                            if l_next == -1:
                                g = g * 2
                            else:
                                pdf_sum += nd[7 : 7 + num_classes]
                                break
                        else:
                            if r_next == -1:
                                g = g * 2 + 1
                            else:
                                pdf_sum += nd[7 + num_classes : 7 + 2 * num_classes]
                                break
                out[i, yl, xl] = best_pdf_class(pdf_sum)
    return out


def composite_labels(label_images, conditions):
    """Walk the conditions table per pixel (reference tree_eval.cu:214-248)."""
    m = len(label_images)
    h, w = label_images[0].shape
    out = np.full((h, w), MAX_UINT16, dtype=np.uint16)
    for y in range(h):
        for x in range(w):
            offset = 0
            for i in range(m):
                l = int(label_images[i][y, x])
                if l == 0 or l == MAX_UINT16:
                    break
                flag, val = conditions[offset + l - 1]
                if flag == 0:
                    out[y, x] = val
                    break
                offset = val
    return out


def mean_shift(labels, variances, num_classes, num_rounds):
    """Double-precision mean shift exactly like the reference host loop."""
    h, w = labels.shape
    means = np.zeros((num_classes, 2), dtype=np.float64)
    for rnd in range(num_rounds):
        sums = np.zeros((num_classes, 3), dtype=np.float64)
        for y in range(h):
            for x in range(w):
                l = int(labels[y, x])
                if l == 0 or l == MAX_UINT16:
                    continue
                c = l - 1
                if rnd == 0:
                    sums[c] += (x, y, 1.0)
                else:
                    dx, dy = x - means[c, 0], y - means[c, 1]
                    v2 = float(variances[c]) ** 2
                    p = math.exp(-(dx * dx + dy * dy) / (2 * v2))
                    sums[c] += (dx * p, dy * p, p)
        with np.errstate(invalid="ignore", divide="ignore"):
            means += sums[:, 0:2] / sums[:, 2:3]
    return means


def make_groups(depth_small, pct_thresh):
    """BFS 4-connected components; keep largest per screen half above the size
    threshold (reference grouping.cpp:79-191).  Returns (groups image with
    1=right 2=left, g_info (2,3) = (size, cx, cy))."""
    h, w = depth_small.shape
    seen = np.zeros((h, w), dtype=bool)
    best = {1: ([], 0.0, 0.0), 2: ([], 0.0, 0.0)}
    for y0 in range(h):
        for x0 in range(w):
            if seen[y0, x0] or depth_small[y0, x0] == 0:
                continue
            seen[y0, x0] = True
            queue = [(y0, x0)]
            comp = []
            qi = 0
            while qi < len(queue):
                cy, cx = queue[qi]
                qi += 1
                comp.append((cy, cx))
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    ny, nx = cy + dy, cx + dx
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx]:
                        seen[ny, nx] = True
                        if depth_small[ny, nx]:
                            queue.append((ny, nx))
            if len(comp) / (h * w) <= pct_thresh:
                continue
            cy = sum(c[0] for c in comp) / len(comp)
            cx = sum(c[1] for c in comp) / len(comp)
            gid = 1 if cx < w / 2.0 else 2
            if len(comp) > len(best[gid][0]):
                best[gid] = (comp, cx, cy)

    groups = np.zeros((h, w), dtype=np.uint16)
    g_info = np.zeros((2, 3), dtype=np.float32)
    for gid in (1, 2):
        comp, cx, cy = best[gid]
        for (y, x) in comp:
            groups[y, x] = gid
        g_info[gid - 1] = (len(comp), cx, cy)
    return groups, g_info


# ---- training oracle -------------------------------------------------------

def gini_impurity(counts):
    s = float(np.float32(counts.sum()))
    p = 0.0
    for c in counts:
        pi = c / s
        p += pi * pi
    return 1.0 - p


def gini_gain(p_counts, l_counts, r_counts):
    p_sum = float(p_counts.sum())
    rem = (l_counts.sum() / p_sum) * gini_impurity(l_counts) + (
        r_counts.sum() / p_sum
    ) * gini_impurity(r_counts)
    return gini_impurity(p_counts) - rem


def train_tree(depth, labels, proposals_per_level, max_depth, num_classes,
               cutoff=0.999):
    """Level-by-level greedy training with a fixed per-level proposal list.

    proposals_per_level: list (len max_depth) of (P, 5) float32 arrays
    (ux, uy, vx, vy, thresh) — injected so the TPU trainer can be fed the same
    proposals for exact parity.
    Returns the packed (total_nodes, 7+2C) float32 tree.
    """
    n, h, w = depth.shape
    total = (1 << max_depth) - 1
    els = 7 + 2 * num_classes
    tree = np.zeros((total, els), dtype=np.float32)

    nodes_by_pixel = np.full((n, h, w), -1, dtype=np.int32)
    nodes_by_pixel[labels > 0] = 0

    node_counts = np.zeros((1 << max_depth, num_classes), dtype=np.int64)
    for c in range(1, num_classes):
        node_counts[0, c] = int(np.sum(labels == c))

    active = [0]
    for level in range(max_depth):
        if not active:
            break
        # histogram per (proposal, next_node, class)
        props = proposals_per_level[level]
        p_num = props.shape[0]
        width = 1 << (level + 1)
        hist = np.zeros((p_num, width, num_classes), dtype=np.int64)
        feats = {}
        for i in range(n):
            for y in range(h):
                for x in range(w):
                    node = nodes_by_pixel[i, y, x]
                    if node == -1:
                        continue
                    lab = int(labels[i, y, x])
                    for j in range(p_num):
                        f = compute_feature(
                            depth[i], x, y, props[j, 0:2], props[j, 2:4]
                        )
                        nxt = node * 2 + (0 if f < props[j, 4] else 1)
                        hist[j, nxt, lab] += 1

        next_active = []
        for node in active:
            flat = (1 << level) - 1 + node
            parent = node_counts[node].astype(np.float64)
            best_g, best_j = -1.0, 0
            for j in range(p_num):
                lc = hist[j, node * 2].astype(np.float64)
                rc = hist[j, node * 2 + 1].astype(np.float64)
                if lc.sum() == 0 or rc.sum() == 0:
                    g = 0.0
                else:
                    g = gini_gain(parent, lc, rc)
                if g > best_g:
                    best_g, best_j = g, j
            lc = hist[best_j, node * 2].astype(np.float64)
            rc = hist[best_j, node * 2 + 1].astype(np.float64)
            tree[flat, 0:5] = props[best_j]
            if best_g <= 0.0:
                tree[flat, 5] = 0.0
                tree[flat, 6] = 0.0
                psum = parent.sum()
                for c in range(num_classes):
                    p = parent[c] / psum
                    tree[flat, 7 + c] = p
                    tree[flat, 7 + num_classes + c] = p
                continue
            for side, counts, child in ((0, lc, node * 2), (1, rc, node * 2 + 1)):
                col = 5 + side
                pdf0 = 7 + side * num_classes
                ssum = counts.sum()
                cut = -1
                for c in range(num_classes):
                    if counts[c] / ssum >= cutoff:
                        cut = c
                        break
                if cut > -1:
                    tree[flat, col] = 0.0
                    tree[flat, pdf0 + cut] = 1.0
                elif level == max_depth - 1:
                    tree[flat, col] = 0.0
                    for c in range(num_classes):
                        tree[flat, pdf0 + c] = counts[c] / ssum
                else:
                    tree[flat, col] = -1.0
                    node_counts[child] = counts.astype(np.int64)
                    next_active.append(child)

        # advance pixels
        if level < max_depth - 1:
            for i in range(n):
                for y in range(h):
                    for x in range(w):
                        node = nodes_by_pixel[i, y, x]
                        if node == -1:
                            continue
                        flat = (1 << level) - 1 + node
                        u, v, th = tree[flat, 0:2], tree[flat, 2:4], tree[flat, 4]
                        f = compute_feature(depth[i], x, y, u, v)
                        side = 0 if f < th else 1
                        status = int(math.floor(tree[flat, 5 + side]))
                        if status != -1:
                            nodes_by_pixel[i, y, x] = -1
                        else:
                            nodes_by_pixel[i, y, x] = node * 2 + side
        active = sorted(next_active)
    return tree
