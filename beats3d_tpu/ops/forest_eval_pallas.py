"""Fused Pallas TPU kernel for per-pixel forest evaluation — the hot op.

Why: XLA lowers the evaluator's data-dependent image gathers to ~14-36 ns per
element on TPU, putting an 848x480 frame at ~300 ms.  The only fast dynamic
addressing Mosaic exposes is the per-lane 128-wide shuffle
(``take_along_axis(..., axis=1)`` -> tpu.dynamic_gather).  This kernel
rebuilds the traversal around that primitive:

* the depth image lives in VMEM, padded with a 65535 sentinel apron so
  out-of-bounds probes read the correct "missing" value with no branching;
* label pixels are processed in (8, 128) tiles; each tree level's probes
  are served by PER-PROBE NEEDED-SET sweeps driven by one batched
  min-extraction per iteration (default, _SWEEP_MODE 4): every straggling
  lane names the one (packed-row-start, chunk) cell that serves it, each
  loop trip serves each probe's next distinct cell with one window load +
  one lane shuffle, and all probes' next cells come from a single
  cross-lane reduce + scratch round-trip.  Trip counts track the tile's
  actual divergence (1-2 cells on coherent scenes, p50 6 / p90 15 on the
  articulated flagship, scripts/sim_v2_serve.py) — arbitrary inputs remain
  exact with cost proportional to their own needed set.  The previous
  anchored-static-window fast path + union block sweep (modes 0-3) is kept
  for A/B;
* adjacent image rows are PACKED into one i32 plane (row 2q in the low 16
  bits, row 2q+1 in the high 16), so every window gather serves BOTH rows —
  parity selection is two ~free shifts/selects instead of a second 13 ns
  lane shuffle (scripts/try_opcost.py), and ``labels_reduce=2`` striding
  falls out of the same layout (a stride-2 sublane window is a contiguous
  packed slice);
* node parameters and leaf pdfs are gathered from per-level SoA tables with
  the same chunk-shuffle pattern (dynamic chunk bounds over the tile's node
  ids);
* the per-pixel pdf sum across trees and the strictly-greater argmax
  (tree_eval.cu:7-21,123-135) happen in registers; the kernel emits final
  labels.

Semantics are bit-identical to ops/forest_eval.py (same floor rounding, OOB
and zero-center rules, filter/labels_reduce/scale_factor features); the test
suite checks both against the scalar oracle.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_UINT16 = 65535

# Row apron above/below the image: NOT a sentinel region — out-of-bounds
# probes are clamped + masked to 65535 in-register — but required so the
# per-lane window start (yc + APRON_T - 2*ii) is never negative and window
# loads never run off the end.  16 = 2 * (SUB - 1) rounded to a sublane
# multiple.  There is no column padding at all.
APRON_T = 16
APRON_B = 16
LANE = 128
SUB = 8

# Batch the probe-window base mins through the VMEM scratch (see
# _tile_context.scalar_mins).  Off by default: cheap in isolation but the
# scalar round-trip in front of every window load measured 2-4x slower in the
# full eval kernel.  Flip for experiments.
BATCH_PROBE_MINS = False

# Profiling-only knob (scripts/profile_attrib.py): comma list of kernel
# stages to neuter — results become WRONG, timing attribution only.
# "img" = constant image probes, "lut0" = zero node ids (no chunk spread),
# "pdf" = skip leaf-pdf accumulation, "nogate" = drop per-level 0/1 gates.
_NEUTER = tuple(
    s for s in os.environ.get("B3D_EVAL_NEUTER", "").split(",") if s
)

# (A shared-base fast path — one union window base for all 2T probes of a
# level — was tried and removed: 392 vs 564 fps batched, see git history.)

# Static-window geometry of the per-probe fast path: _FAST_ROWS image rows
# x _FAST_KC lane chunks.  A (SUB, LANE) label tile's own probe targets span
# 2*SUB image rows x 2 chunks even with CONSTANT offsets, so the minimal
# 2x2 window has ZERO slack: any within-tile offset variation (depth slope,
# chunk-boundary straddle) spills lanes into the exact-cleanup sweep.
# Wider windows trade unconditional rolls+shuffles for fewer dynamic-trip
# cleanup iterations; the best setting is model-dependent — benchmarked on
# the trained flagship (scripts/ab_flagship_knobs.py).  With MULTI-PASS
# anchored windows (see _FAST_PASSES) the optimum shifted narrow: each pass
# serves one per-node cluster exactly, so the minimal 2-row window wins —
# 2x2 23.3-23.8 ms vs 4x2 24.9 / 8x2 29.5 / 2x1 28.9 / 2x3 25.1 on 32
# flagship crops.
_FAST_ROWS = int(os.environ.get("B3D_EVAL_ROWS", "2"))
_FAST_KC = int(os.environ.get("B3D_EVAL_KC", "2"))

# Window geometry of the straggler re-passes (passes 2..N, see
# _FAST_PASSES); defaults to the pass-1 geometry.
_FAST_ROWS2 = int(os.environ.get("B3D_EVAL_ROWS2", str(_FAST_ROWS)))
_FAST_KC2 = int(os.environ.get("B3D_EVAL_KC2", str(_FAST_KC)))

# Exact-sweep iteration policy: 1 = needed-set min-extraction over 8-row
# BLOCKS (default: on the articulated flagship's divergent probes each
# iteration serves 16 image rows, 151.8 vs 170.2 ms for the row sweep;
# the ROW sweep won on round-2's coherent rigid-circles model 21.67 vs
# 23.48 — granularity tracks divergence), 2 = needed-set over single
# PACKED-ROW window starts, 0 = union bounding rectangle
# (see gather_probes_exact), 3 =
# ANCHORED-PASS LOOP: a dynamic-trip loop of fast-path re-passes, each
# anchored at the remaining stragglers' min id per probe (serves one
# per-node cluster per probe per iteration at fast-path cost), bounded by
# _ANCHOR_MAX iterations with the row sweep as the residual backstop.
_SWEEP_MODE = os.environ.get("B3D_EVAL_SWEEP", "4")
_SWEEP_NEEDED = _SWEEP_MODE != "0"
_SWEEP_ROW = _SWEEP_MODE == "2"
_SWEEP_ANCHOR = _SWEEP_MODE == "3"
# 4 = BATCHED PER-PROBE row sweeps, replacing the fast path + anchored
# passes + union sweep entirely: each probe keeps its own needed-set of
# (packed-row-start, chunk) cells and every loop iteration serves ONE cell
# of EVERY probe — all probes' next-cell mins come from a single batched
# cross-lane reduce + scratch round-trip (see gather_probes_batched).
# Host-side measurement on the articulated flagship (sim_v2_serve.py):
# per-probe needed sets are tiny (p50 6 / p90 15 row cells) while the
# union over 8 probes the block sweep iterates is several times larger and
# pays 8 shuffles per probe per iteration; mode 4 pays ~1 load + 1 shuffle
# per probe per iteration and max-per-probe iterations.
_SWEEP_BATCH = _SWEEP_MODE == "4"
# (A sublane-band split of the batched sweeps — serve _PSPLIT cells per
# probe per iteration — was tried and removed: with labels_reduce=2 a
# node-cluster's window-start row is SUBLANE-INVARIANT, so every band needs
# nearly every cell and the split only multiplied serve work; measured
# 94.4 ms vs 77.6 at split 2 on the flagship sweep.)

# Cells extracted (and served) per probe per sweep iteration.  2 halves the
# trip count — the SECOND-smallest distinct cell comes from the same
# batched reduce by masking the lane-broadcast min (a log2(LANE) roll-min
# chain on the stacked rows) before a second per-row reduce, sharing one
# scratch round-trip — at the cost of doubled serve slots per trip; whether
# amortizing the per-trip fixed overhead pays is an A/B question.
_MULTI = int(os.environ.get("B3D_EVAL_MULTI", "1"))

# ROWS SERVED PER PROBE PER SWEEP TRIP (batched mode 4 only).  A probe's
# needed (packed-row, chunk) cells are mostly CONTIGUOUS row runs within a
# chunk — depth varies smoothly across a tile, so adjacent lanes' targets
# land on adjacent image rows (scripts/sim_rowspan.py measures the run
# structure on the trained flagship).  With _RSPAN = D > 1 each trip
# serves rows q..q+D-1 of the min cell's chunk from ONE (3-sublane-tile)
# window load: D-1 extra static rolls + shuffles (~20 ns each, pipelinable
# vector work) replace whole loop trips, each of which costs a serial
# min-extraction -> scratch round-trip -> dependent-load chain (~300 ns).
# The plane gets two extra 8-row pad tiles so the 32-row loads stay in
# bounds.  DEFAULT 3 (round-5 A/Bs, 32 flagship crops, label sums exact):
# baseline 75.05 -> RSPAN=2 67.22 ms; with CSPAN=2 64.45 (-14.1%); RSPAN=3
# 60.86 (-19%).  The knee is sharp: RSPAN=4 64.01 / RSPAN=4+CSPAN=3 66.01 —
# past ~3 rows the marginal serves stop hiding under the per-trip serial
# chain and the extra vector work goes critical-path.
_RSPAN = int(os.environ.get("B3D_EVAL_RSPAN", "3"))

# CHUNKS served per probe per sweep trip: the {q..q+RSPAN-1} x
# {c..c+WSPAN-1} cell RECTANGLE anchored at the min cell.  A label tile
# spans 256 image columns = 2 chunks, so even a CONSTANT x-offset splits a
# probe's cells across 2 adjacent chunks with the SAME row structure
# (scripts/sim_rowspan.py rect mode) — one extra load + RSPAN more serves
# per trip collapses that duplication.  Serves whose c+g wraps past the
# plane edge are gated off (the aliased id belongs to a different real
# cell and must stay unserved).
_WSPAN = int(os.environ.get("B3D_EVAL_WSPAN", "1"))

# (PRE-ROTATED plane copies — 8 shifted copies so every window serve is a
# direct aligned (8, 128) load with no roll — were tried and REMOVED in
# round 5: warm-cache A/B measured 74.51 default vs 74.45 ms PREROT on 32
# flagship crops, i.e. a wash at 8x the plane VMEM.  The dynamic roll the
# copies eliminate is not on the serve slot's critical path; the
# scratch->scalar->dependent-load chain is.  See ROADMAP round-5 log.)
_ANCHOR_MAX = int(os.environ.get("B3D_EVAL_ANCHOR_MAX", "6"))

# 1 = ONE window base per (u, v) probe PAIR of the same walk: the pair's
# combined min id anchors a single window set serving both probes — halves
# the per-level base-reduce count and window loads; divergent u/v offsets
# spill the farther probe to the cleanup instead.
_PAIR = os.environ.get("B3D_EVAL_PAIR", "0") == "1"

# 1 = NEEDED-SET node-table sweeps: the dynamic comps/leaf-pdf chunk sweeps
# iterate exactly the distinct chunks the tile's lanes NEED (repeated
# min-extraction, the image row sweep's proven pattern) instead of the
# [min..max] span.  Wide trained levels (hundreds-thousands of evaluated
# nodes, 16k+ leaves on the articulated flagship) make a divergent tile's
# span tens of chunks while it needs only a handful.
_NEED_SWEEP = os.environ.get("B3D_EVAL_NEED", "1") == "1"

# With tile_k > 1: 1 = one UNION chunk sweep per tree serving all K tiles
# (fewer loops, wider ranges when the tiles diverge), 0 = per-tile sweeps
# (narrow ranges, pure cross-tile ILP).  A/B knob for the pairing experiment.
_UNION_COMPS = os.environ.get("B3D_EVAL_UNION", "1") == "1"

# Levels whose node table spans <= this many 128-node chunks skip the
# per-tree chunk-bound reduces and run a fully-unrolled STATIC sweep over
# every chunk: 2 cross-lane reduces (serial ~latency) traded for <= N-1
# extra straight-line load+shuffle iterations Mosaic can pipeline.  0
# disables (always dynamic).  Default 8: with the batched cross-tree sweeps
# (_CBATCH) carrying the wide levels, 8 -> 77.6 ms vs 16 -> 79.4 / 4 -> 79.4
# on the articulated flagship sweep (scripts/ab_flagship_knobs.py; the old
# per-tree-loop optimum was 16).
_STATIC_CHUNKS = int(os.environ.get("B3D_EVAL_STATCHUNKS", "8"))

# Total anchored static-window passes: passes 2..N re-anchor on the previous
# pass's straggler lanes INSIDE the exact-cleanup gate, before the needed-set
# sweep (divergent trained levels cluster per node; each extra anchor serves
# the next cluster at fast-path cost — 1 reduce + nh*KC loads per probe —
# instead of the sweep's per-block 8-roll serve).  Coherent levels sit
# outside the gate and pay pass 1 only.  Measured on the trained flagship
# at 2x2 windows: 3 passes 22.95 ms, 2 passes 23.3-23.8, 4 passes 23.5,
# 1 pass ~29.5 (scripts/ab_flagship_knobs.py).
# B3D_EVAL_FAST2=0 is kept as an alias for PASSES=1.
_FAST_PASSES = int(os.environ.get("B3D_EVAL_PASSES", "3"))
if os.environ.get("B3D_EVAL_FAST2") == "0":
    _FAST_PASSES = 1

# Deep trained levels have MANY per-node straggler clusters (one anchored
# pass serves one cluster; the rest fall through to the needed-set sweep's
# per-block 8-roll serve).  Levels >= _DEEP_LVL use _FAST_PASSES_DEEP total
# passes instead — worth more anchors exactly where clusters multiply.
_DEEP_LVL = int(os.environ.get("B3D_EVAL_DEEPLVL", "10"))
_FAST_PASSES_DEEP = int(
    os.environ.get("B3D_EVAL_PASSES_DEEP", str(_FAST_PASSES))
)
# Pass-1 window geometry at deep levels (straggler clusters spread further).
_FAST_ROWS_DEEP = int(os.environ.get("B3D_EVAL_ROWS_DEEP", str(_FAST_ROWS)))
_FAST_KC_DEEP = int(os.environ.get("B3D_EVAL_KC_DEEP", str(_FAST_KC)))

# Chunks served per tree per trip of the BATCHED table sweeps (_CBATCH):
# D > 1 serves chunks m..m+D-1 per trip — compact node renumbering and
# DFS leaf ids put a tile's lanes in ADJACENT chunks, so each extra
# (load + roll + K shuffles) per component/class replaces a whole trip's
# serial min-extraction chain.  Same trade as _RSPAN for the image sweep.
# DEFAULT 2 (round-5 A/B: 75.05 -> 72.00 ms alone, 64.45 with RSPAN=2;
# sim: fine-layer comps trips 3.43 -> 2.46).
_CSPAN = int(os.environ.get("B3D_EVAL_CSPAN", "2"))

# 1 = BATCHED cross-tree table sweeps: the per-level node-component sweeps
# and the deferred leaf-pdf sweeps run as ONE dynamic-trip loop over ALL
# trees — per iteration each tree extracts its own next needed chunk (one
# batched reduce + scratch round-trip for all trees, the _SWEEP_MODE 4
# pattern) and serves it.  Trip count = max-per-tree needed chunks instead
# of the per-tree loops' sum, and T-1 while-loop serial chains disappear.
_CBATCH = os.environ.get("B3D_EVAL_CBATCH", "1") == "1"

# 1 = ONE cross-lane reduce per probe in the fast path (min over the
# combined srow * NC + chunk id; the window anchors at the minimum-id lane's
# (row, chunk) corner) instead of independent row and chunk mins.  Halves
# the per-level serial reduce chain; lanes in a lower chunk on a later row
# spill to the exact cleanup slightly more often.  Default on (36.0 vs 44.0
# ms at 4x3 windows on the flagship sweep).
_BASE1 = os.environ.get("B3D_EVAL_BASE1", "1") == "1"


NCOMP = 7  # per-level table entries: ux, uy, vx, vy, th, lr, pdf


def pack_tables_pallas(forest_flat: np.ndarray):
    """Pack a (T, 2**D - 1, 7 + 2C) forest into COMPACT kernel tables.

    Trained deep trees are overwhelmingly leaves, but the reference's packed
    layout is a dense complete binary tree (2^D - 1 rows) — at D=16-20 that
    cannot live in ~16 MB of VMEM.  Here each level holds only the nodes a
    traversal can actually EVALUATE (reachable through a descend edge),
    renumbered 0..n_j-1, with explicit child pointers replacing the implicit
    2g+side rule: per level j the components are (ux, uy, vx, vy, thresh)
    f32 and ch — compact left/right child ids packed as
    (l+1) | ((r+1) << 16), 0 meaning "that side is a leaf" (the evaluator
    only ever tests l_next/r_next == -1, tree_eval.cu:109-121; per-level
    widths beyond 65534 are rejected).

    Layout per component: (T, SC, 8, 128) "superchunk" — compact id q lives
    at [t, (q//128)//8, (q//128)%8, q%128], so any 128-node chunk is one
    dynamic-leading-index load of an aligned (8, 128) block plus a sublane
    roll (Mosaic requires 8-aligned sublane offsets).  Levels with <= 128
    nodes are PRE-BROADCAST: all 8 sublanes hold the same 128 values, so the
    lookup is a direct load + lane shuffle.

    Leaf pdfs are DEFERRED: each (level, node, side) leaf slot gets a
    GLOBAL per-tree leaf id (BFS order), carried per level in ``lf`` —
    packed (leaf_l+1) | ((leaf_r+1) << 16), 0 meaning "that side descends"
    — and the pdfs live in ONE (T, C, LSC, 8, 128) table indexed by leaf
    id.  The kernel tracks the winning leaf id during traversal (one i32
    lookup per tree per level, sharing the component lookups' chunk bounds)
    and gathers all class pdfs ONCE after the walk.  Attribution on the
    flagship D=16 model showed per-level pdf gathers were ~90% of kernel
    time: divergent leaf nodes at deep levels made every level pay a wide
    (tree x class) chunk sweep (scripts/profile_attrib.py).

    Returns (tables, (T, D_eff, C, counts, num_leaves)): tables is
    D_eff per-level 7-tuples (ux, uy, vx, vy, thresh, ch, lf) followed by a
    1-tuple holding the global leaf-pdf table; counts[j] is the
    max-over-trees evaluated-node count at level j.
    """
    t, total, els = forest_flat.shape
    d = int(np.log2(total + 1))
    c = (els - 7) // 2

    # BFS over descend edges, per tree: dense node ids per level + compact
    # child pointers.
    ids = [[[0]] for _ in range(t)]  # ids[tree][level] -> dense g list
    childs = [[] for _ in range(t)]  # childs[tree][level] -> (cl, cr) list
    for tree in range(t):
        j = 0
        while ids[tree][j]:
            lo = (1 << j) - 1
            nxt = []
            ch = []
            for g in ids[tree][j]:
                node = forest_flat[tree, lo + g]
                cl = cr = -1
                if np.floor(node[5]) == -1:
                    cl = len(nxt)
                    nxt.append(2 * g)
                if np.floor(node[6]) == -1:
                    cr = len(nxt)
                    nxt.append(2 * g + 1)
                ch.append((cl, cr))
            childs[tree].append(ch)
            ids[tree].append(nxt)
            j += 1
            if j >= d:
                break
        while len(ids[tree]) < d + 1:
            ids[tree].append([])
            childs[tree].append([])

    counts = []
    for j in range(d):
        n_j = max(len(ids[tree][j]) for tree in range(t))
        if n_j == 0:
            break
        counts.append(n_j)
    d_eff = len(counts)

    levels = []
    for j in range(d_eff):
        n_j = counts[j]
        assert n_j < 0xFFFF, (
            f"level {j} has {n_j} evaluated nodes; compact child pointers "
            "are 16-bit — split the forest"
        )
    def shaped(x, n_entries):
        n_chunks = (max(n_entries, 1) + LANE - 1) // LANE
        scn = (n_chunks + SUB - 1) // SUB
        gpad = scn * SUB * LANE
        x = np.asarray(x)
        pad = np.zeros(x.shape[:-1] + (gpad - x.shape[-1],), x.dtype)
        x = np.concatenate([x, pad], axis=-1)
        x = x.reshape(x.shape[:-1] + (scn, SUB, LANE))
        if n_entries <= LANE:
            reps = [1] * x.ndim
            reps[-2] = SUB
            x = np.tile(x[..., 0:1, :], reps)
        return jnp.asarray(x)

    # global per-tree leaf numbering in DFS (in-order) order: a coherent
    # tile's pixels agree on the first several splits, so their leaves live
    # in one contiguous id range and the deferred pdf gather's chunk sweep
    # stays narrow.  (BFS numbering scattered a tile's leaves across level
    # bands — measured ~20 ms of sweep on the flagship fine forest.)
    leaf_counts = [0] * t
    leaf_ids = [
        [[None] * len(ids[tree][j]) for j in range(d_eff)] for tree in range(t)
    ]

    def assign_dfs(tree, j, q):
        cl, cr = childs[tree][j][q]
        lid = [0, 0]
        for side, ch_q in ((0, cl), (1, cr)):
            if ch_q == -1:  # leaf slot
                leaf_counts[tree] += 1
                lid[side] = leaf_counts[tree]
            else:
                assign_dfs(tree, j + 1, ch_q)
        leaf_ids[tree][j][q] = tuple(lid)

    for tree in range(t):
        if ids[tree][0]:
            assign_dfs(tree, 0, 0)
    num_leaves = max(max(leaf_counts), 1)
    assert num_leaves < 0xFFFF, (
        f"{num_leaves} leaves in one tree; packed leaf ids are 16-bit — "
        "split the forest"
    )

    leaf_pdf = np.zeros((t, c, num_leaves), np.float32)
    for j in range(d_eff):
        n_j = counts[j]
        comp = np.zeros((t, 5, n_j), np.float32)
        chp = np.zeros((t, n_j), np.int32)
        lfp = np.zeros((t, n_j), np.int32)
        lo = (1 << j) - 1
        for tree in range(t):
            for q, g in enumerate(ids[tree][j]):
                node = forest_flat[tree, lo + g]
                comp[tree, :, q] = node[0:5]
                cl, cr = childs[tree][j][q]
                chp[tree, q] = (cl + 1) | ((cr + 1) << 16)
                ll, lr = leaf_ids[tree][j][q]
                lfp[tree, q] = ll | (lr << 16)
                if ll:
                    leaf_pdf[tree, :, ll - 1] = node[7 : 7 + c]
                if lr:
                    leaf_pdf[tree, :, lr - 1] = node[7 + c : 7 + 2 * c]

        levels.append(
            tuple(shaped(comp[:, k], n_j) for k in range(5))
            + (shaped(chp, n_j), shaped(lfp, n_j))
        )
    tables = tuple(levels) + ((shaped(leaf_pdf, num_leaves),),)
    return tables, (t, d_eff, c, tuple(counts), num_leaves)


def _tile_context(planes, r, h, w, tytx, scratch_ref=None):
    """Coordinate grids + the two gather primitives for K tiles processed by
    ONE grid step, shared by the single-forest and fused-layered kernels.

    ``planes`` is a list of PACKED plane refs (row q = image rows 2q | 2q+1
    << 16, see _prep_planes) and ``tytx`` a list of (ty, tx) scalar tile
    indices, one per tile instance.  Probes passed to the gather primitives
    are (yy, xx, active, inst) — ``inst`` (a python int) names which tile's
    plane serves the probe.  Processing K tiles per step lets every
    dynamic-trip sweep serve the UNION of the tiles' needs (half the loop
    machinery) and fills the serial-latency bubbles of one tile's
    reduce->load->shuffle chains with the other's independent work.

    ``scratch_ref`` is an optional (SUB, >=64) i32 VMEM scratch enabling the
    BATCHED scalar-min path: full cross-lane reduces cost ~200 ns each of
    pure serial latency on TPU, so the per-level window/chunk bounds (up to
    ~6 per tree per level) are instead computed as cheap per-array axis-0
    mins, stacked 8 rows at a time, reduced across lanes ONCE, round-tripped
    through the scratch, and read back as scalars — measured 7.5x cheaper
    (scripts/try_batchmin.py)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    y_pxs = [(ty * SUB + ii) * r for (ty, tx) in tytx]
    x_pxs = [(tx * LANE + jj) * r for (ty, tx) in tytx]

    if True:
        # Static per-probe window geometry: _FAST_ROWS image rows (half as
        # many packed-plane rows) x KC chunks, fully unrolled — the common
        # case runs with NO dynamic-trip loops (Mosaic can't
        # software-pipeline those; measured 3.5x).
        n_chunks_img = (w + LANE - 1) // LANE
        KC = min(_FAST_KC, n_chunks_img)
        max_half = (h + APRON_T - 1) // 2
        big = jnp.int32(1 << 29)

        def scalar_mins(rows):
            """Scalars ``[min(row) for row in rows]`` for (1, LANE) i32 rows
            (already axis-0-reduced and masked).  With a scratch: one
            cross-lane reduce per 8 rows instead of one per row."""
            if scratch_ref is None or not BATCH_PROBE_MINS:
                return [jnp.min(row) for row in rows]
            out = [None] * len(rows)
            col = 0
            for i in range(0, len(rows), SUB):
                grp = list(rows[i : i + SUB])
                k = len(grp)
                while len(grp) < SUB:
                    grp.append(grp[0])
                m8 = jnp.concatenate(grp, axis=0)  # (SUB, LANE)
                scratch_ref[0:SUB, col : col + 1] = jnp.min(
                    m8, axis=1, keepdims=True
                )
                for j in range(k):
                    out[i + j] = scratch_ref[j, col]
                col += 1
            return out

        def row_min(arr, mask, neutral=None):
            """(1, LANE) per-lane min of ``arr`` over sublanes where ``mask``
            (cheap vector op; feeds scalar_mins)."""
            return jnp.min(
                jnp.where(mask, arr, big if neutral is None else neutral),
                axis=0, keepdims=True,
            )

        def window(plane_ref, p, cix):
            """(SUB, LANE) rows [p, p+8) of a plane: Mosaic requires
            8-aligned sublane starts, so load an aligned 16-row block and
            roll the residue away."""
            p_al = pl.multiple_of((p // SUB) * SUB, SUB)
            off = p - p_al
            blk = plane_ref[
                0,
                pl.ds(p_al, 2 * SUB),
                pl.ds(pl.multiple_of(cix * LANE, LANE), LANE),
            ]
            return pltpu.roll(blk, -off, 0)[0:SUB]

        def unpack2(v):
            """(even, odd) image rows from one gathered packed vector: low
            16 bits = even row, logical-shift high 16 = odd (sign-safe for
            depth <= 65535)."""
            return v & 0xFFFF, jax.lax.shift_right_logical(v, 16)

        def prep(yy, xx, active, inst, poison):
            """Shared probe prep: window-start row / chunk / lane of each
            lane's target, serve mask.  With ``poison``, non-served lanes
            are pushed out of every sweep range (exact path); without, they
            sit at the tile's own coords (fast path, keeps windows near)."""
            oob = (yy < 0) | (yy >= h) | (xx < 0) | (xx >= w)
            # fully-OOB lanes read the 65535 sentinel by masking and
            # never need serving: excluding them keeps windows tight and
            # stops image borders from forcing the exact path.
            serve = active & ~oob
            yc = jnp.clip(yy, 0, h - 1)
            xc = jnp.clip(xx, 0, w - 1)
            # srow: the lane's target in "window-start" coordinates — the
            # packed-plane row p and parity par that serve it satisfy
            # srow == 2p + par (a sublane-ii lane reads window row ii, i.e.
            # packed row p + ii = image rows 2p + 2ii + par).
            if poison:
                chunk = xc // LANE
                lane_idx = xc - chunk * LANE
                srow = yc + APRON_T - 2 * ii
                srow = jnp.where(serve, srow, big)
                chunk = jnp.where(serve, chunk, big)
            else:
                yc = jnp.where(serve, yc, y_pxs[inst])
                xc = jnp.where(serve, xc, x_pxs[inst])
                chunk = xc // LANE
                lane_idx = xc - chunk * LANE
                srow = yc + APRON_T - 2 * ii
            return srow, chunk, lane_idx, oob, serve, inst

        def gather_probes_fast(probes, init_vals=None, rows=None, kc=None):
            """All probes' image values via STATIC windows only: _FAST_ROWS
            padded rows x KC chunks anchored at each probe's (min row, min
            chunk) — coherent probes (one node, narrow depth) are fully
            served.  Returns (values, over): ``over`` marks lanes some probe
            left unserved; the CALLER must run an exact pass for them.  No
            dynamic-trip loops here — they are Mosaic scheduling barriers
            (measured 20x on the training kernel).  Out-of-bounds probes are
            clamped into the image and masked to 65535 (tree_eval semantics:
            OOB reads "very far", decision_tree_common.hpp:8-28).
            ``probes`` is a list of (yy, xx, active, inst).

            With ``init_vals`` this is a RE-PASS over a straggler subset
            (probes' act masks name the stragglers): lanes the new windows
            serve are merged into init_vals, everything else is kept — OOB
            sentinels were already applied by the first pass."""
            preps = [prep(yy, xx, act, inst, False)
                     for (yy, xx, act, inst) in probes]

            # Base from ACTIVE lanes only (inactive lanes sit at the tile's
            # own rows and would drag the window off-target).  All probes'
            # (row, chunk) bases in one batched reduce when enabled —
            # measured SLOWER than per-probe reduces here (the scratch
            # round-trip feeding the dynamic window starts stalls Mosaic's
            # load pipeline), so the per-probe path is the default.
            if BATCH_PROBE_MINS and scratch_ref is not None:
                base_rows = []
                for (srow, chunk, lane_idx, oob, active, _inst) in preps:
                    base_rows.append(row_min(srow, active))
                    base_rows.append(row_min(chunk, active))
                bases = scalar_mins(base_rows)
            elif _PAIR and len(preps) % 2 == 0:
                # One base per (u, v) probe pair: the SAME python scalar
                # objects are placed for both probes, so the serve loop's
                # window cache (keyed on object identity) loads each
                # window set once and serves both probes from it.
                bases = [None] * (2 * len(preps))
                for q in range(len(preps) // 2):
                    p0, p1 = preps[2 * q], preps[2 * q + 1]
                    cid0 = jnp.where(
                        p0[4], p0[0] * n_chunks_img + p0[1], big
                    )
                    cid1 = jnp.where(
                        p1[4], p1[0] * n_chunks_img + p1[1], big
                    )
                    cid = jnp.min(jnp.minimum(cid0, cid1))
                    row = cid // n_chunks_img
                    col = cid - row * n_chunks_img
                    bases[4 * q : 4 * q + 4] = [row, col, row, col]
            elif _BASE1:
                # One reduce per probe: min combined id; decompose to the
                # (row, chunk) corner (see _BASE1).
                bases = []
                for (srow, chunk, lane_idx, oob, active, _inst) in preps:
                    cid = jnp.min(jnp.where(
                        active, srow * n_chunks_img + chunk, big
                    ))
                    bases.append(cid // n_chunks_img)
                    bases.append(cid - (cid // n_chunks_img) * n_chunks_img)
            else:
                bases = []
                for (srow, chunk, lane_idx, oob, active, _inst) in preps:
                    bases.append(jnp.min(jnp.where(active, srow, big)))
                    bases.append(jnp.min(jnp.where(active, chunk, big)))

            nh = max((rows if rows is not None else _FAST_ROWS) // 2, 1)
            kcl = min(kc, n_chunks_img) if kc is not None else KC
            accs = [jnp.zeros((SUB, LANE), jnp.int32) for _ in preps]
            over = jnp.zeros((SUB, LANE), jnp.bool_)
            overs = []
            # Window cache keyed on the STRUCTURAL pair index: under _PAIR
            # probes 2q/2q+1 share one base (the same scalars are placed at
            # both slots above), so they must share one window set.  An
            # id()-based key would also work today but only because the
            # bases list pins every scalar for the loop's duration.
            win_cache = {}  # (inst, pair index) -> (wins, hb, cb)
            for p, (srow, chunk, lane_idx, oob, active, inst) in enumerate(
                    preps):
                plane_ref = planes[inst]
                ck = (inst, p // 2 if _PAIR else p)
                if ck in win_cache:
                    wins, hb, cb = win_cache[ck]
                else:
                    sb = bases[2 * p]
                    cb = jnp.clip(bases[2 * p + 1], 0, n_chunks_img - kcl)
                    hb = jnp.clip(sb // 2, 0, max_half - nh)
                    wins = []
                    for dc in range(kcl):
                        for dh in range(nh):
                            wins.append(window(plane_ref, hb + dh, cb + dc))
                    win_cache[ck] = (wins, hb, cb)
                lo_row = 2 * hb
                hi_row = 2 * hb + 2 * nh - 1
                # Hoisted masks: candidates repeat the same nh packed-row
                # values across kcl chunks; each gathered packed vector
                # serves BOTH parities via unpack2 (one shuffle, two ~free
                # selects).
                row_lo = [srow == 2 * (hb + dh) for dh in range(nh)]
                row_hi = [srow == 2 * (hb + dh) + 1 for dh in range(nh)]
                chunk_masks = [chunk == cb + dc for dc in range(kcl)]
                for k, op in enumerate(wins):
                    cm = chunk_masks[k // nh]
                    v = jnp.take_along_axis(op, lane_idx, axis=1)
                    lo, hi = unpack2(v)
                    accs[p] = jnp.where(row_lo[k % nh] & cm, lo, accs[p])
                    accs[p] = jnp.where(row_hi[k % nh] & cm, hi, accs[p])
                over_p = active & (
                    (srow < lo_row) | (srow > hi_row)
                    | (chunk < cb) | (chunk > cb + (kcl - 1))
                )
                overs.append(over_p)
                over |= over_p

            if init_vals is not None:
                # re-pass merge: only lanes this pass's windows served (the
                # probes' act masks already name the stragglers) override
                vals = tuple(
                    jnp.where(p[4] & ~ov, v, iv)
                    for v, p, ov, iv in zip(accs, preps, overs, init_vals)
                )
            else:
                vals = tuple(
                    jnp.where(p[3], MAX_UINT16, v)
                    for v, p in zip(accs, preps)
                )
            return vals, over, overs

        def batched_scalar_mins(rows_lists):
            """One scratch round-trip turning N (8, 128) i32 arrays into N
            scalar minima (plus their combined min): per array an axis-0
            min (cheap vector op), stacked 8 at a time, reduced across
            lanes ONCE per stack.  The per-iteration serial chain of a
            needed-set sweep is one reduce + one scalar read-back for ALL
            probes/trees instead of one per each."""
            scal = []
            col = 0
            for i in range(0, len(rows_lists), SUB):
                grp = rows_lists[i : i + SUB]
                k = len(grp)
                rows = [jnp.min(r, axis=0, keepdims=True) for r in grp]
                while len(rows) < SUB:
                    rows.append(rows[0])
                m8 = jnp.concatenate(rows, axis=0)  # (SUB, LANE)
                scratch_ref[0:SUB, col : col + 1] = jnp.min(
                    m8, axis=1, keepdims=True
                )
                for j in range(k):
                    scal.append(scratch_ref[j, col])
                col += 1
            g = scal[0]
            for s in scal[1:]:
                g = jnp.minimum(g, s)
            return scal, g

        def gather_probes_batched(probes):
            """Serve ALL probes by per-probe needed-set row sweeps in ONE
            dynamic-trip loop (_SWEEP_MODE 4).  Each probe's lanes name the
            (packed-row-start, chunk) cell that serves them; per iteration
            every probe extracts ITS OWN next distinct cell (one batched
            reduce for all probes, see batched_scalar_mins) and serves it
            with one window load + one lane shuffle (both parities via the
            packed plane).  Trip count is the MAX per-probe cell count —
            measured p50 6 / p90 15 on the articulated flagship — instead
            of the union over probes the block sweep pays, and per-trip
            vector work is ~8x lighter than the 8-roll block serve.
            Replaces the anchored fast path entirely (its per-probe base
            reduces cost as much as a handful of sweep trips)."""
            preps = [prep(yy, xx, act, inst, False)
                     for (yy, xx, act, inst) in probes]
            nP = len(preps)
            rems = [
                jnp.where(serve, (srow // 2) * n_chunks_img + chunk, big)
                for (srow, chunk, lane_idx, oob, serve, inst) in preps
            ]
            accs = [jnp.zeros((SUB, LANE), jnp.int32) for _ in preps]
            # per-lane parity shift (srow odd -> high half of the packed
            # word), hoisted out of the loop: one variable-shift + mask
            # replaces unpack + two selects per serve (78.5 vs 81.5 ms on
            # the flagship sweep)
            shifts = [(p[0] & 1) << 4 for p in preps]
            nE = max(1, min(_MULTI, 2))

            def probe_mins(rems_l):
                """Per-probe smallest (and with _MULTI=2 second-smallest
                distinct) remaining cell ids — ONE scratch round-trip for
                everything (see batched_scalar_mins / _MULTI)."""
                if nE == 1:
                    ms, g = batched_scalar_mins(rems_l)
                    return [ms], g
                s1, s2 = [], []
                col = 0
                for i in range(0, nP, SUB):
                    grp = rems_l[i : i + SUB]
                    k = len(grp)
                    rows = [
                        jnp.min(r, axis=0, keepdims=True) for r in grp
                    ]
                    while len(rows) < SUB:
                        rows.append(rows[0])
                    g8 = jnp.concatenate(rows, axis=0)
                    scratch_ref[0:SUB, col : col + 1] = jnp.min(
                        g8, axis=1, keepdims=True
                    )
                    b = g8  # lane-broadcast min via log2 roll-min chain
                    for sh in (64, 32, 16, 8, 4, 2, 1):
                        b = jnp.minimum(b, pltpu.roll(b, sh, 1))
                    g8b = jnp.where(g8 == b, big, g8)
                    scratch_ref[0:SUB, col + 1 : col + 2] = jnp.min(
                        g8b, axis=1, keepdims=True
                    )
                    for j in range(k):
                        s1.append(scratch_ref[j, col])
                        s2.append(scratch_ref[j, col + 1])
                    col += 2
                g = s1[0]
                for s in s1[1:]:
                    g = jnp.minimum(g, s)
                return [s1, s2], g

            ms0, g0 = probe_mins(rems)

            def cond(c):
                return c[0] < big

            def body(c):
                ms = [
                    list(c[1 + e * nP : 1 + (e + 1) * nP])
                    for e in range(nE)
                ]
                rems_l = list(c[1 + nE * nP : 1 + (nE + 1) * nP])
                accs_l = list(c[1 + (nE + 1) * nP :])
                new_rems = []
                # Cell RECTANGLE served per trip from wspan window loads
                # (see _RSPAN/_WSPAN): rows q..q+span-1 of chunks
                # c..c+wspan-1; runs drain in ceil(run/rect) trips.
                span = _RSPAN if (_RSPAN > 1 and nE == 1) else 1
                wspan = _WSPAN if (_WSPAN > 1 and nE == 1) else 1
                # power-of-2 sublane counts only: cyclic rolls over a
                # non-power-of-2 (e.g. 24-row) block need modulo-N vreg
                # rotation Mosaic does not lower exactly
                nload = (4 if span > 1 else 2) * SUB
                for p, (srow, chunk, lane_idx, oob, serve, inst) in (
                        enumerate(preps)):
                    rem = rems_l[p]
                    for e in range(nE):
                        m = ms[e][p]
                        # valid cells have q in [0, max_half] (the plane
                        # is padded so an aligned 16-row load at max_half
                        # fits); only the m == big sentinel needs clamping.
                        q = m // n_chunks_img
                        cix = jnp.clip(
                            m - q * n_chunks_img, 0, n_chunks_img - 1
                        )
                        q = jnp.minimum(q, max_half)
                        if span == 1 and wspan == 1:
                            wins = [(0, 0, window(planes[inst], q, cix))]
                        else:
                            # per chunk one nload-row load covering rows
                            # q..q+span-1+7 (span <= 8: row delta + 7 +
                            # the alignment residue <= 22 < nload); each
                            # row delta is a static re-roll of the same
                            # rolled block.
                            wins = []
                            q_al = pl.multiple_of((q // SUB) * SUB, SUB)
                            for g in range(wspan):
                                cg = jnp.minimum(
                                    cix + g, n_chunks_img - 1
                                )
                                blk = planes[inst][
                                    0,
                                    pl.ds(q_al, nload),
                                    pl.ds(
                                        pl.multiple_of(cg * LANE, LANE),
                                        LANE,
                                    ),
                                ]
                                rolled = pltpu.roll(blk, -(q - q_al), 0)
                                wins.append((0, g, rolled[0:SUB]))
                                wins.extend(
                                    (d, g,
                                     pltpu.roll(rolled, nload - d, 0)
                                     [0:SUB])
                                    for d in range(1, span)
                                )
                        for d, g, win in wins:
                            v = jnp.take_along_axis(win, lane_idx, axis=1)
                            val = jax.lax.shift_right_logical(
                                v, shifts[p]
                            ) & 0xFFFF
                            hit = (
                                rem == m + d * n_chunks_img + g
                            ) & (m < big)
                            if g:
                                # id m+..+g with c+g past the plane edge
                                # aliases (row q+d+1, wrapped chunk) — a
                                # DIFFERENT real cell; leave it unserved.
                                hit &= cix < n_chunks_img - g
                            accs_l[p] = jnp.where(hit, val, accs_l[p])
                            rem = jnp.where(hit, big, rem)
                    new_rems.append(rem)
                ms_n, g_n = probe_mins(new_rems)
                flat_ms = sum(ms_n, [])
                return (g_n,) + tuple(flat_ms) + tuple(new_rems) + tuple(
                    accs_l)

            out = jax.lax.while_loop(
                cond, body,
                (g0,) + tuple(sum(ms0, [])) + tuple(rems) + tuple(accs),
            )
            accs = out[1 + (nE + 1) * nP :]
            return tuple(
                jnp.where(p[3], MAX_UINT16, a)
                for a, p in zip(accs, preps)
            )

        def gather_probes_exact(probes, init_vals=None):
            """Exact (unconditionally dynamic) gather: ONE (row, chunk)
            needed-set sweep over every probe's stragglers (all instances
            together — each block iteration loads each instance's planes
            once and serves all its probes).  Non-served lanes are POISONED
            out of both the sweep range (min bounds skip ``big``) and the
            serves (no candidate ever equals ``big``), so a sparse set of
            stragglers costs only its own span.  Only for use inside a
            caller's single fallback gate."""
            preps = [prep(yy, xx, act, inst, True)
                     for (yy, xx, act, inst) in probes]
            insts_used = sorted({p[5] for p in preps})
            # UNION sweep: one dynamic (row, chunk) loop over all probes'
            # combined range, serving every probe per iteration — 8x fewer
            # loop iterations and window loads than per-probe sweeps at the
            # same per-lane shuffle count (the divergent-level fallback was
            # ~70% of flagship eval time, scripts/profile_attrib.py).
            # Bounds consider SERVED lanes only on both sides; the caller's
            # gate guarantees at least one served lane exists.
            accs0 = tuple(
                jnp.zeros((SUB, LANE), jnp.int32)
                if init_vals is None else init_vals[pidx]
                for pidx in range(len(preps))
            )

            def serve_block(b, cix, accs):
                """Serve every probe's lanes whose target falls in the
                aligned 8-plane-row block at (b, chunk cix) — one plane load
                per instance, all instances' probes per iteration."""
                q = b * SUB  # aligned packed-row start of this block
                col = pl.ds(pl.multiple_of(cix * LANE, LANE), LANE)
                rowsl = pl.ds(pl.multiple_of(q, SUB), 2 * SUB)
                p16s = {
                    s: planes[s][0, rowsl, col] for s in insts_used
                }
                accs = list(accs)
                inchunk = [p[1] == cix for p in preps]
                srel = [p[0] - 2 * q for p in preps]  # block-relative start
                for k in range(SUB):
                    rolled = {
                        s: pltpu.roll(p16s[s], (2 * SUB - k) % (2 * SUB),
                                      0)[0:SUB]
                        for s in insts_used
                    }
                    for pidx, (srow, chunk, lane_idx, oob, active,
                               inst) in enumerate(preps):
                        # one shuffle serves both parities of packed row
                        # q + k (image rows 2(q+k) and 2(q+k)+1)
                        v = jnp.take_along_axis(
                            rolled[inst], lane_idx, axis=1
                        )
                        lo, hi = unpack2(v)
                        sel_lo = (srel[pidx] == 2 * k) & inchunk[pidx]
                        sel_hi = (srel[pidx] == 2 * k + 1) & inchunk[pidx]
                        accs[pidx] = jnp.where(sel_lo, lo, accs[pidx])
                        accs[pidx] = jnp.where(sel_hi, hi, accs[pidx])
                return tuple(accs)

            def serve_row(q, cix, accs):
                """Serve every probe's lanes whose window START is packed
                row q of chunk cix (srow == 2q or 2q+1; sublane ii reads
                packed row q+ii, exactly the fast path's window shape): one
                aligned load + roll per instance, ONE shuffle per probe for
                both parities.  ~3x cheaper per iteration than serve_block
                at the cost of iterating distinct start rows instead of
                8-row blocks."""
                wins = {s: window(planes[s], q, cix) for s in insts_used}
                accs = list(accs)
                for pidx, (srow, chunk, lane_idx, oob, active,
                           inst) in enumerate(preps):
                    v = jnp.take_along_axis(wins[inst], lane_idx, axis=1)
                    lo, hi = unpack2(v)
                    sel = chunk == cix
                    accs[pidx] = jnp.where(
                        (srow == 2 * q) & sel, lo, accs[pidx]
                    )
                    accs[pidx] = jnp.where(
                        (srow == 2 * q + 1) & sel, hi, accs[pidx]
                    )
                return tuple(accs)

            if _SWEEP_NEEDED:
                # NEEDED-SET iteration: each straggler lane names the ONE
                # (row-block, chunk) block (or (packed-row, chunk) cell,
                # _SWEEP_ROW) that serves it; iterate exactly the distinct
                # needed ids by repeated min-extraction.  The union
                # rectangle this replaces paid one dynamic-trip iteration
                # per CELL of the bounding box of all stragglers — ~2.7x
                # more iterations than blocks actually needed on the
                # flagship workload (scripts/sim_sweep.py), plus 4
                # cross-lane bounds reduces per call that the min-extract
                # form does not need.
                rdiv = 2 if _SWEEP_ROW else 2 * SUB
                serve = serve_row if _SWEEP_ROW else serve_block
                nbs = [
                    jnp.where(
                        active,
                        (srow // rdiv) * n_chunks_img + chunk,
                        big,
                    )
                    for (srow, chunk, lane_idx, oob, active, _inst) in preps
                ]
                rem0 = jnp.concatenate(nbs, axis=0)  # (8P, LANE)

                def cond(carry):
                    return carry[0] < big

                def body(carry):
                    m, rem, accs = carry
                    accs = serve(
                        m // n_chunks_img, m % n_chunks_img, accs
                    )
                    rem = jnp.where(rem == m, big, rem)
                    return (jnp.min(rem), rem, accs)

                _, _, got = jax.lax.while_loop(
                    cond, body, (jnp.min(rem0), rem0, accs0)
                )
            else:
                # UNION-RECTANGLE iteration (previous policy, kept for
                # A/B): one iteration per cell of the stragglers' bounding
                # box.  Bounds consider SERVED lanes only on both sides.
                act_srows = [
                    jnp.where(active, srow, -1)
                    for (srow, chunk, lane_idx, oob, active, _inst) in preps
                ]
                act_chunks = [
                    jnp.where(active, chunk, -1)
                    for (srow, chunk, lane_idx, oob, active, _inst) in preps
                ]
                m_srow = act_srows[0]
                m_chunk = act_chunks[0]
                for a, b in zip(act_srows[1:], act_chunks[1:]):
                    m_srow = jnp.maximum(m_srow, a)
                    m_chunk = jnp.maximum(m_chunk, b)
                n_srow = preps[0][0]
                n_chunk = preps[0][1]
                for (srow, chunk, lane_idx, oob, active, _inst) in preps[1:]:
                    n_srow = jnp.minimum(n_srow, srow)
                    n_chunk = jnp.minimum(n_chunk, chunk)
                s_hi = jnp.max(m_srow)
                s_lo = jnp.minimum(jnp.min(n_srow), jnp.maximum(s_hi, 0))
                c_hi = jnp.max(m_chunk)
                c_lo = jnp.minimum(jnp.min(n_chunk), jnp.maximum(c_hi, 0))
                nc = c_hi - c_lo + 1
                b_lo = s_lo // (2 * SUB)
                b_hi = s_hi // (2 * SUB)
                total = (b_hi - b_lo + 1) * nc

                got = jax.lax.fori_loop(
                    0, total,
                    lambda i, accs: serve_block(
                        b_lo + i // nc, c_lo + i % nc, accs
                    ),
                    accs0,
                )
            return tuple(
                jnp.where(p[3], MAX_UINT16, g) for g, p in zip(got, preps)
            )

        def gather_image_multi(probes, passes=None, rows=None, kc=None):
            """Fast static-window gather with a single self-contained exact
            fallback gate (see gather_probes_fast/exact).  ``passes``
            overrides the total anchored-pass count (see _FAST_PASSES /
            _FAST_PASSES_DEEP); ``rows``/``kc`` override the pass-1 window
            geometry."""
            n_passes = _FAST_PASSES if passes is None else passes
            if _SWEEP_BATCH:
                return gather_probes_batched(probes)
            if "nofast" in _NEUTER:
                # exact-only mode (correct): skips the fast path's 2 serial
                # cross-lane reduces per probe, betting on the blocked
                # sweep being as cheap for typical spans.
                return gather_probes_exact(probes)
            vals, over, overs = gather_probes_fast(probes, rows=rows, kc=kc)
            if "noexact" in _NEUTER:
                return vals

            def cleanup(_, vals_in):
                # NARROWED cleanup: each probe re-gathers only the lanes the
                # static windows could not serve, so the sweep bounds cover
                # the stragglers' span, not every active lane's.
                probes2 = [
                    (yy, xx, act & overs[p], inst)
                    for p, (yy, xx, act, inst) in enumerate(probes)
                ]
                vals_in = list(vals_in)
                if _SWEEP_ANCHOR:
                    # Anchored-pass LOOP (_SWEEP_MODE 3): keep re-anchoring
                    # fast-path windows on the remaining stragglers until
                    # none remain — one per-node cluster served per probe
                    # per iteration at fast-path cost — instead of a fixed
                    # number of unconditional passes + the per-cell row
                    # sweep.  Bounded by _ANCHOR_MAX (bottom-edge lanes can
                    # sit just past the clipped window forever); the row
                    # sweep mops up any residue.
                    np_ = len(probes2)

                    def w_cond(c):
                        m = c[1]
                        for mm in c[2 : 1 + np_]:
                            m = jnp.maximum(m, mm)
                        return jnp.logical_and(
                            c[0] < _ANCHOR_MAX, jnp.max(m) > 0
                        )

                    def w_body(c):
                        it = c[0]
                        masks = list(c[1 : 1 + np_])
                        vals = list(c[1 + np_ :])
                        probes_i = [
                            (probes2[p][0], probes2[p][1], masks[p] > 0,
                             probes2[p][3])
                            for p in range(np_)
                        ]
                        vals_n, _, overs_n = gather_probes_fast(
                            probes_i, init_vals=vals,
                            rows=_FAST_ROWS2, kc=_FAST_KC2,
                        )
                        masks_n = [
                            ((masks[p] > 0) & overs_n[p]).astype(jnp.int32)
                            for p in range(np_)
                        ]
                        return (it + 1,) + tuple(masks_n) + tuple(vals_n)

                    init = (
                        (jnp.int32(0),)
                        + tuple(
                            p2[2].astype(jnp.int32) for p2 in probes2
                        )
                        + tuple(vals_in)
                    )
                    out = jax.lax.while_loop(w_cond, w_body, init)
                    masks = out[1 : 1 + np_]
                    vals_in = list(out[1 + np_ :])
                    probes2 = [
                        (probes2[p][0], probes2[p][1], masks[p] > 0,
                         probes2[p][3])
                        for p in range(np_)
                    ]
                    return gather_probes_exact(probes2, init_vals=vals_in)
                for _ in range(n_passes - 1):
                    # Extra anchored-window pass over the stragglers ONLY
                    # (inside this gate, so coherent levels never pay it);
                    # see _FAST_PASSES.
                    vals_in, _, overs_n = gather_probes_fast(
                        probes2, init_vals=vals_in,
                        rows=_FAST_ROWS2, kc=_FAST_KC2,
                    )
                    vals_in = list(vals_in)
                    probes2 = [
                        (yy, xx, act & overs_n[p], inst)
                        for p, (yy, xx, act, inst) in enumerate(probes2)
                    ]
                return gather_probes_exact(probes2, init_vals=vals_in)

            return jax.lax.fori_loop(
                0, jnp.any(over).astype(jnp.int32), cleanup, vals
            )

        def chunk_bound_rows(g, active):
            """The two (1, LANE) rows whose scalar_mins yield this lookup's
            (c_lo, -c_hi) — callers hoist them so all of a level's lookups
            share ONE batched reduce (see _traverse_tile)."""
            chunk = jnp.where(active, g, 0) // LANE
            return [row_min(chunk, active), row_min(-chunk, active, 0)]

        def chunk_bounds(pair):
            """(c_lo, c_hi) from the two scalars of chunk_bound_rows; with no
            active lanes c_lo=big collapses onto c_hi=0 (one harmless trip)."""
            c_hi = -pair[1]
            return jnp.minimum(pair[0], c_hi), c_hi

        def chunked_lookup(load_superchunk, g, active, dtype, num_nodes,
                           bounds=None):
            """Per-lane table[g].  ``load_superchunk(sc)`` returns the
            (SUB, LANE) block holding chunks [sc*8, sc*8+8); chunk cix lives
            at sublane cix % 8, so one roll exposes it at row 0.
            ``num_nodes`` is static: levels with <= 128 nodes are stored
            pre-broadcast (all sublanes equal) — one load + one shuffle.
            ``bounds`` optionally supplies precomputed (c_lo, c_hi)."""
            gc = jnp.where(active, g, 0)
            if num_nodes <= LANE:
                return jnp.take_along_axis(load_superchunk(0), gc, axis=1)

            chunk = gc // LANE
            lane_idx = gc - chunk * LANE
            if bounds is not None:
                c_lo, c_hi = bounds
            else:
                c_lo, c_hi = chunk_bounds(
                    scalar_mins(chunk_bound_rows(g, active))
                )

            def body(cix, acc):
                blk = load_superchunk(cix // SUB)
                row = pltpu.roll(blk, (SUB - cix % SUB) % SUB, 0)[0:1]
                op = jnp.broadcast_to(row, (SUB, LANE))
                val = jnp.take_along_axis(op, lane_idx, axis=1)
                return jnp.where(chunk == cix, val, acc)

            init = jnp.zeros((SUB, LANE), dtype)
            if isinstance(c_lo, int) and isinstance(c_hi, int):
                # static bounds: unrolled straight-line sweep — Mosaic can
                # software-pipeline it, unlike a dynamic-trip scf loop
                acc = init
                for cix in range(c_lo, c_hi + 1):
                    acc = body(cix, acc)
                return acc
            return jax.lax.fori_loop(c_lo, c_hi + 1, body, init)

    return y_pxs, x_pxs, gather_image_multi, chunked_lookup, (
        gather_probes_fast, gather_probes_exact,
        scalar_mins, chunk_bound_rows, chunk_bounds, batched_scalar_mins)


def _traverse_tiles(tables, leaf_pdf_r, num_leaves, num_trees, depth_levels,
                    num_classes, counts, insts, scale, y_pxs, x_pxs,
                    gather_image_multi, chunked_lookup, bound_helpers=None):
    """Level-synchronous traversal of K (8, 128) tiles through one forest;
    ``insts`` is a list of per-tile (eligible, safe_df, zero_center).
    Returns (per-tile argmax classes, per-tile all-trees-done masks).

    ALL trees of ALL tiles advance together per level: the kernel is
    latency-bound (scalar reductions, divides, dependent shuffles), so the
    per-level serial chain — bound reduces, one unioned image sweep, the
    any()-gates — is paid ONCE for K*T (tile, tree) walks instead of K*T
    times, and each per-tree table sweep serves every tile's lanes from one
    block load (adjacent compacted tiles visit near-identical node ranges)."""
    scalar_mins, chunk_bound_rows, chunk_bounds, batched_mins = (
        bound_helpers if bound_helpers is not None
        else (None, None, None, None)
    )
    T = num_trees
    K = len(insts)
    NI = K * T  # flattened (tile, tree) walks: i = s * T + t
    gs = [jnp.zeros((SUB, LANE), jnp.int32) for _ in range(NI)]
    dones = [(~insts[i // T][0]).astype(jnp.int32) for i in range(NI)]
    # global leaf id per walk, resolved at hit time from the lf component;
    # the class pdfs are gathered ONCE after the walk (see pack_tables_pallas)
    leafs = [jnp.zeros((SUB, LANE), jnp.int32) for _ in range(NI)]

    for j in range(depth_levels):
        ux_r, uy_r, vx_r, vy_r, th_r, ch_r, lf_r = tables[
            j * NCOMP : (j + 1) * NCOMP
        ]
        n_nodes = counts[j]

        def level_fn(state):
            gs = list(state[:NI])
            dones = list(state[NI : 2 * NI])
            leafs = list(state[2 * NI :])

            # One batched reduce yields every tree's node-chunk bounds for
            # this level — the UNION over tiles, so all tiles' component
            # lookups for a tree share one sweep (and the scalar-extraction
            # count stays 2 per tree regardless of K).  With _UNION_COMPS
            # off, bounds (and sweeps below) are per walk instead: narrower
            # ranges at divergent levels, pure cross-tile ILP.
            union = _UNION_COMPS or K == 1
            tree_bounds = [None] * T
            walk_bounds = [None] * NI
            n_chunks_lvl = (n_nodes + LANE - 1) // LANE
            use_cbatch = (
                _CBATCH and n_nodes > LANE
                and n_chunks_lvl > _STATIC_CHUNKS
                and batched_mins is not None
            )
            comps_all = None
            if use_cbatch:
                # One cross-tree needed-set loop serving every tree's 7
                # components for all K tiles (see _CBATCH).
                chunks_ts, lanes_ts, rems0 = [], [], []
                for t in range(T):
                    chs, lns, rem_rows = [], [], []
                    for s in range(K):
                        i = s * T + t
                        a = dones[i] == 0
                        gc = jnp.where(a, gs[i], 0)
                        ch = gc // LANE
                        chs.append(ch)
                        lns.append(gc - ch * LANE)
                        rem_rows.append(
                            jnp.where(a, ch, jnp.int32(1 << 29))
                        )
                    chunks_ts.append(chs)
                    lanes_ts.append(lns)
                    rems0.append(
                        jnp.concatenate(rem_rows, axis=0)
                        if K > 1 else rem_rows[0]
                    )
                bigc = jnp.int32(1 << 29)
                accs0 = tuple(
                    jnp.zeros((SUB, LANE), ref.dtype)
                    for t in range(T)
                    for ref in (ux_r, uy_r, vx_r, vy_r, th_r, ch_r, lf_r)
                    for _ in range(K)
                )
                cms0, cg0 = batched_mins(rems0)

                def c_cond(c):
                    return c[0] < bigc

                def c_body(c):
                    ms = list(c[1 : 1 + T])
                    rems_l = list(c[1 + T : 1 + 2 * T])
                    accs_l = list(c[1 + 2 * T :])
                    new_rems = []
                    refs = (ux_r, uy_r, vx_r, vy_r, th_r, ch_r, lf_r)
                    for t in range(T):
                        m = ms[t]
                        for g in range(_CSPAN):
                            # chunks past the level edge match no lane
                            # (ids are 1-D, no aliasing); m == sentinel
                            # matches nothing either.
                            cix = jnp.clip(m + g, 0, n_chunks_lvl - 1)
                            for ci, ref in enumerate(refs):
                                blk = ref[t, cix // SUB]
                                row = pltpu.roll(
                                    blk, (SUB - cix % SUB) % SUB, 0
                                )[0:1]
                                op = jnp.broadcast_to(row, (SUB, LANE))
                                for s in range(K):
                                    val = jnp.take_along_axis(
                                        op, lanes_ts[t][s], axis=1
                                    )
                                    pos = (t * NCOMP + ci) * K + s
                                    accs_l[pos] = jnp.where(
                                        chunks_ts[t][s] == m + g, val,
                                        accs_l[pos],
                                    )
                        new_rems.append(
                            jnp.where(
                                (rems_l[t] >= m)
                                & (rems_l[t] < m + _CSPAN),
                                bigc, rems_l[t],
                            )
                        )
                    cms_n, cg_n = batched_mins(new_rems)
                    return (
                        (cg_n,) + tuple(cms_n) + tuple(new_rems)
                        + tuple(accs_l)
                    )

                c_out = jax.lax.while_loop(
                    c_cond, c_body,
                    (cg0,) + tuple(cms0) + tuple(rems0) + accs0,
                )
                flat_accs = c_out[1 + 2 * T :]
                # comps_all[t][comp][tile]
                comps_all = [
                    [
                        [
                            flat_accs[(t * NCOMP + ci) * K + s]
                            for s in range(K)
                        ]
                        for ci in range(NCOMP)
                    ]
                    for t in range(T)
                ]
            if use_cbatch:
                pass
            elif n_nodes > LANE and n_chunks_lvl <= _STATIC_CHUNKS:
                # Static full sweep: no bound reduces at all (see
                # _STATIC_CHUNKS); comps_merged unrolls int bounds.
                tree_bounds = [(0, n_chunks_lvl - 1)] * T
                walk_bounds = [(0, n_chunks_lvl - 1)] * NI
            elif n_nodes > LANE and scalar_mins is not None:
                if union:
                    rows = []
                    for t in range(T):
                        lo_row, hi_row = None, None
                        for s in range(K):
                            pair = chunk_bound_rows(
                                gs[s * T + t], dones[s * T + t] == 0
                            )
                            lo_row = (
                                pair[0] if lo_row is None
                                else jnp.minimum(lo_row, pair[0])
                            )
                            hi_row = (
                                pair[1] if hi_row is None
                                else jnp.minimum(hi_row, pair[1])
                            )
                        rows.extend([lo_row, hi_row])
                    flat = scalar_mins(rows)
                    tree_bounds = [
                        chunk_bounds(flat[2 * t : 2 * t + 2])
                        for t in range(T)
                    ]
                else:
                    rows = []
                    for i in range(NI):
                        rows.extend(
                            chunk_bound_rows(gs[i], dones[i] == 0)
                        )
                    flat = scalar_mins(rows)
                    walk_bounds = [
                        chunk_bounds(flat[2 * i : 2 * i + 2])
                        for i in range(NI)
                    ]

            comp_refs = (ux_r, uy_r, vx_r, vy_r, th_r, ch_r, lf_r)

            def comps_merged(t, g_list, act_list, bounds):
                """All 7 components of every listed tile's node ``g`` for
                tree t in ONE chunk sweep — each block is loaded/rolled once
                and serves all listed tiles (the 7*K separate chunked_lookup
                fori_loops this replaces each ran their own dynamic-trip
                loop over the same chunk range; Mosaic cannot pipeline
                those)."""
                gcs = [jnp.where(a, g, 0) for g, a in zip(g_list, act_list)]
                chunks = [gc // LANE for gc in gcs]
                lanes = [gc - c * LANE for gc, c in zip(gcs, chunks)]
                c_lo, c_hi = bounds

                kk = len(g_list)

                def body(cix, accs):
                    out = []
                    pos = 0
                    for ref in comp_refs:
                        blk = ref[t, cix // SUB]
                        row = pltpu.roll(blk, (SUB - cix % SUB) % SUB, 0)[0:1]
                        op = jnp.broadcast_to(row, (SUB, LANE))
                        for s in range(kk):
                            val = jnp.take_along_axis(op, lanes[s], axis=1)
                            out.append(
                                jnp.where(chunks[s] == cix, val, accs[pos])
                            )
                            pos += 1
                    return tuple(out)

                init = tuple(
                    jnp.zeros((SUB, LANE), ref.dtype)
                    for ref in comp_refs for _ in range(kk)
                )
                if isinstance(c_lo, int) and isinstance(c_hi, int):
                    flat = init
                    for cix in range(c_lo, c_hi + 1):
                        flat = body(cix, flat)
                elif _NEED_SWEEP:
                    # needed-set: iterate exactly the distinct chunks any
                    # lane needs (min-extraction); wide divergent levels
                    # pay per NEEDED chunk, not per span chunk
                    big = jnp.int32(1 << 29)
                    rem0 = jnp.concatenate(
                        [
                            jnp.where(a, ch, big)
                            for ch, a in zip(chunks, act_list)
                        ],
                        axis=0,
                    )

                    def n_cond(carry):
                        return carry[0] < big

                    def n_body(carry):
                        m = carry[0]
                        rem = carry[1]
                        accs = body(m, tuple(carry[2:]))
                        rem = jnp.where(rem == m, big, rem)
                        return (jnp.min(rem), rem) + tuple(accs)

                    out = jax.lax.while_loop(
                        n_cond, n_body, (jnp.min(rem0), rem0) + init
                    )
                    flat = tuple(out[2:])
                else:
                    flat = jax.lax.fori_loop(c_lo, c_hi + 1, body, init)
                # -> [comp][tile]
                return [
                    flat[c * kk : (c + 1) * kk]
                    for c in range(len(comp_refs))
                ]

            actives = [None] * NI
            ths = [None] * NI
            chs = [None] * NI
            lfs = [None] * NI
            probes = []
            for t in range(T):
                g_list, act_list = [], []
                for s in range(K):
                    i = s * T + t
                    act_list.append(dones[i] == 0)
                    g_list.append(
                        gs[i] if "lut0" not in _NEUTER
                        else jnp.zeros((SUB, LANE), jnp.int32)
                    )

                if comps_all is not None:
                    comps = comps_all[t]
                    uxs, uys, vxs, vys = (
                        comps[0], comps[1], comps[2], comps[3]
                    )
                    for s in range(K):
                        i = s * T + t
                        ths[i] = comps[4][s]
                        chs[i] = comps[5][s]
                        lfs[i] = comps[6][s]
                elif n_nodes > LANE and (
                    tree_bounds[t] is not None or walk_bounds[t] is not None
                ):
                    if union:
                        comps = comps_merged(
                            t, g_list, act_list, tree_bounds[t]
                        )
                        uxs, uys, vxs, vys = (
                            comps[0], comps[1], comps[2], comps[3]
                        )
                        for s in range(K):
                            i = s * T + t
                            ths[i] = comps[4][s]
                            chs[i] = comps[5][s]
                            lfs[i] = comps[6][s]
                    else:
                        uxs, uys, vxs, vys = [], [], [], []
                        for s in range(K):
                            i = s * T + t
                            cs = comps_merged(
                                t, [g_list[s]], [act_list[s]],
                                walk_bounds[i],
                            )
                            uxs.append(cs[0][0])
                            uys.append(cs[1][0])
                            vxs.append(cs[2][0])
                            vys.append(cs[3][0])
                            ths[i] = cs[4][0]
                            chs[i] = cs[5][0]
                            lfs[i] = cs[6][0]
                else:
                    uxs, uys, vxs, vys = [], [], [], []
                    for s in range(K):
                        i = s * T + t

                        def comp(ref, _g=g_list[s], _a=act_list[s]):
                            return chunked_lookup(
                                lambda sc, _r=ref: _r[t, sc],
                                _g, _a, ref.dtype, n_nodes,
                                bounds=tree_bounds[t],
                            )

                        uxs.append(comp(ux_r))
                        uys.append(comp(uy_r))
                        vxs.append(comp(vx_r))
                        vys.append(comp(vy_r))
                        ths[i] = comp(th_r)
                        chs[i] = comp(ch_r)
                        lfs[i] = comp(lf_r)

                for s in range(K):
                    i = s * T + t
                    safe_df = insts[s][1]
                    dux = jnp.floor(scale * uxs[s] / safe_df).astype(jnp.int32)
                    duy = jnp.floor(scale * uys[s] / safe_df).astype(jnp.int32)
                    dvx = jnp.floor(scale * vxs[s] / safe_df).astype(jnp.int32)
                    dvy = jnp.floor(scale * vys[s] / safe_df).astype(jnp.int32)
                    probes.append(
                        (y_pxs[s] + duy, x_pxs[s] + dux, act_list[s], s)
                    )
                    probes.append(
                        (y_pxs[s] + dvy, x_pxs[s] + dvx, act_list[s], s)
                    )
                    actives[i] = act_list[s]

            # probes are ordered [(t, s, u/v)]: index of walk i = s*T + t
            # is 2 * (t * K + s) for u, +1 for v.
            if "img" in _NEUTER:
                vals = tuple(
                    y_pxs[p[3]] + x_pxs[p[3]] for p in probes
                )
            else:
                deep = j >= _DEEP_LVL
                vals = gather_image_multi(
                    probes,
                    passes=_FAST_PASSES_DEEP if deep else _FAST_PASSES,
                    rows=_FAST_ROWS_DEEP if deep else None,
                    kc=_FAST_KC_DEEP if deep else None,
                )

            for t in range(T):
                for s in range(K):
                    i = s * T + t
                    pu = 2 * (t * K + s)
                    f = vals[pu].astype(jnp.float32) - vals[
                        pu + 1
                    ].astype(jnp.float32)
                    f = jnp.where(insts[s][2], 0.0, f)
                    left = f < ths[i]
                    side = jnp.where(left, 0, 1)
                    # compact child pointer for the chosen side; 0 = leaf —
                    # in which case the lf component carries the leaf id + 1
                    child = (chs[i] >> (side * 16)) & 0xFFFF
                    descend = child != 0
                    hit = actives[i] & (~descend)
                    gs[i] = jnp.where(actives[i] & descend, child - 1, gs[i])
                    dones[i] = jnp.where(hit, 1, dones[i])
                    leafv = ((lfs[i] >> (side * 16)) & 0xFFFF) - 1
                    leafs[i] = jnp.where(hit, leafv, leafs[i])
            return tuple(gs) + tuple(dones) + tuple(leafs)

        # Skip the level only when EVERY walk is done everywhere (one
        # scalar reduce per level, not per walk).  bool vectors don't
        # legalize as scf loop carries; use i32.
        nd = dones[0]
        for i in range(1, NI):
            nd = jnp.minimum(nd, dones[i])
        state = tuple(gs) + tuple(dones) + tuple(leafs)
        if "nogate" in _NEUTER:
            state = level_fn(state)
        else:
            state = jax.lax.fori_loop(
                0,
                jnp.any(nd == 0).astype(jnp.int32),
                lambda _, s: level_fn(s),
                state,
            )
        gs = list(state[:NI])
        dones = list(state[NI : 2 * NI])
        leafs = list(state[2 * NI :])

    all_dones = []
    for s in range(K):
        ad = dones[s * T] != 0
        for t in range(1, T):
            ad &= dones[s * T + t] != 0
        all_dones.append(ad)

    # Deferred pdf gather: every eligible pixel that landed on a leaf reads
    # its C class pdfs ONCE from the global leaf table — the per-level
    # (tree x class) chunk sweeps this replaces were ~90% of kernel time on
    # deep models (scripts/profile_attrib.py).
    pdf_sums = [
        [jnp.zeros((SUB, LANE), jnp.float32) for _ in range(num_classes)]
        for _ in range(K)
    ]
    if "pdf" not in _NEUTER:
        acts = [
            (dones[i] != 0) & insts[i // T][0] for i in range(NI)
        ]
        union = _UNION_COMPS or K == 1
        leaf_bounds = [None] * T  # union over tiles, per tree
        leaf_walk_bounds = [None] * NI
        use_pbatch = (
            _CBATCH and num_leaves > LANE and batched_mins is not None
            and "pdfstatic" not in _NEUTER
        )
        if use_pbatch:
            # One cross-tree needed-set loop over leaf-pdf chunks: per
            # iteration each tree serves its own next chunk for all K
            # tiles x C classes (see _CBATCH).
            n_chunks_lf = (num_leaves + LANE - 1) // LANE
            bigp = jnp.int32(1 << 29)
            chunks_ts, lanes_ts, rems0 = [], [], []
            for t in range(T):
                chs, lns, rem_rows = [], [], []
                for s in range(K):
                    i = s * T + t
                    gc = jnp.where(acts[i], leafs[i], 0)
                    ch = gc // LANE
                    chs.append(ch)
                    lns.append(gc - ch * LANE)
                    rem_rows.append(jnp.where(acts[i], ch, bigp))
                chunks_ts.append(chs)
                lanes_ts.append(lns)
                rems0.append(
                    jnp.concatenate(rem_rows, axis=0)
                    if K > 1 else rem_rows[0]
                )
            accs0 = tuple(
                jnp.zeros((SUB, LANE), jnp.float32)
                for _ in range(T * num_classes * K)
            )
            pms0, pg0 = batched_mins(rems0)

            def p_cond(c):
                return c[0] < bigp

            def p_body(c):
                ms = list(c[1 : 1 + T])
                rems_l = list(c[1 + T : 1 + 2 * T])
                accs_l = list(c[1 + 2 * T :])
                new_rems = []
                for t in range(T):
                    m = ms[t]
                    for g in range(_CSPAN):
                        cix = jnp.clip(m + g, 0, n_chunks_lf - 1)
                        for k in range(num_classes):
                            blk = leaf_pdf_r[t, k, cix // SUB]
                            row = pltpu.roll(
                                blk, (SUB - cix % SUB) % SUB, 0
                            )[0:1]
                            op = jnp.broadcast_to(row, (SUB, LANE))
                            for s in range(K):
                                val = jnp.take_along_axis(
                                    op, lanes_ts[t][s], axis=1
                                )
                                pos = (t * num_classes + k) * K + s
                                accs_l[pos] = jnp.where(
                                    chunks_ts[t][s] == m + g, val,
                                    accs_l[pos],
                                )
                    new_rems.append(
                        jnp.where(
                            (rems_l[t] >= m) & (rems_l[t] < m + _CSPAN),
                            bigp, rems_l[t],
                        )
                    )
                pms_n, pg_n = batched_mins(new_rems)
                return (
                    (pg_n,) + tuple(pms_n) + tuple(new_rems)
                    + tuple(accs_l)
                )

            p_out = jax.lax.while_loop(
                p_cond, p_body, (pg0,) + tuple(pms0) + tuple(rems0) + accs0
            )
            flat_pdf = p_out[1 + 2 * T :]
            for s in range(K):
                for k in range(num_classes):
                    for t in range(T):
                        i = s * T + t
                        pdf_sums[s][k] = pdf_sums[s][k] + jnp.where(
                            acts[i],
                            flat_pdf[(t * num_classes + k) * K + s],
                            0.0,
                        )
        elif "pdfstatic" in _NEUTER:
            leaf_bounds = [
                (0, (num_leaves + LANE - 1) // LANE - 1)
            ] * T
            leaf_walk_bounds = [leaf_bounds[i % T] for i in range(NI)]
        elif num_leaves > LANE and scalar_mins is not None:
            if union:
                rows = []
                for t in range(T):
                    lo_row, hi_row = None, None
                    for s in range(K):
                        i = s * T + t
                        pair = chunk_bound_rows(leafs[i], acts[i])
                        lo_row = pair[0] if lo_row is None else jnp.minimum(
                            lo_row, pair[0])
                        hi_row = pair[1] if hi_row is None else jnp.minimum(
                            hi_row, pair[1])
                    rows.extend([lo_row, hi_row])
                flat = scalar_mins(rows)
                leaf_bounds = [
                    chunk_bounds(flat[2 * t : 2 * t + 2]) for t in range(T)
                ]
            else:
                rows = []
                for i in range(NI):
                    rows.extend(chunk_bound_rows(leafs[i], acts[i]))
                flat = scalar_mins(rows)
                leaf_walk_bounds = [
                    chunk_bounds(flat[2 * i : 2 * i + 2]) for i in range(NI)
                ]
        for t in (range(T) if not use_pbatch else ()):
            if num_leaves <= LANE:
                # pre-broadcast table: one direct load + shuffle per class
                for s in range(K):
                    i = s * T + t
                    for k in range(num_classes):
                        val = chunked_lookup(
                            lambda sc, _t=t, _k=k: leaf_pdf_r[_t, _k, sc],
                            leafs[i], acts[i], jnp.float32, num_leaves,
                            bounds=leaf_bounds[t],
                        )
                        pdf_sums[s][k] = pdf_sums[s][k] + jnp.where(
                            acts[i], val, 0.0
                        )
                continue

            # ONE chunk sweep per tree serving every listed tile and class
            # per iteration (K*C separate chunked_lookups would run K*C
            # dynamic-trip loops over the same chunk range).
            def pdf_sweep(t, s_list, bounds):
                kk = len(s_list)
                chunks_l, lanes_l = [], []
                for s in s_list:
                    i = s * T + t
                    gc = jnp.where(acts[i], leafs[i], 0)
                    chunks_l.append(gc // LANE)
                    lanes_l.append(gc - (gc // LANE) * LANE)
                if bounds is not None:
                    c_lo, c_hi = bounds
                else:
                    c_hi, c_lo = None, None
                    for si, s in enumerate(s_list):
                        i = s * T + t
                        hi = jnp.max(jnp.where(acts[i], chunks_l[si], -1))
                        lo = jnp.min(
                            jnp.where(
                                acts[i], chunks_l[si], jnp.int32(1 << 29)
                            )
                        )
                        c_hi = hi if c_hi is None else jnp.maximum(c_hi, hi)
                        c_lo = lo if c_lo is None else jnp.minimum(c_lo, lo)
                    c_lo = jnp.minimum(c_lo, jnp.maximum(c_hi, 0))

                def body(cix, accs, _t=t, _chunks=chunks_l, _lanes=lanes_l):
                    out = []
                    pos = 0
                    for k in range(num_classes):
                        blk = leaf_pdf_r[_t, k, cix // SUB]
                        row = pltpu.roll(
                            blk, (SUB - cix % SUB) % SUB, 0
                        )[0:1]
                        op = jnp.broadcast_to(row, (SUB, LANE))
                        for si in range(kk):
                            val = jnp.take_along_axis(
                                op, _lanes[si], axis=1
                            )
                            out.append(
                                jnp.where(
                                    _chunks[si] == cix, val, accs[pos]
                                )
                            )
                            pos += 1
                    return tuple(out)

                init = tuple(
                    jnp.zeros((SUB, LANE), jnp.float32)
                    for _ in range(num_classes * kk)
                )
                if _NEED_SWEEP:
                    # needed-set sweep over the tile's distinct leaf chunks
                    # (16k+ leaves/tree on the articulated flagship: a
                    # divergent tile's [min..max] span is tens-of-chunks
                    # wide while only a few are occupied)
                    bigp = jnp.int32(1 << 29)
                    rem0 = jnp.concatenate(
                        [
                            jnp.where(acts[s * T + t], chunks_l[si], bigp)
                            for si, s in enumerate(s_list)
                        ],
                        axis=0,
                    )

                    def p_cond(carry):
                        return carry[0] < bigp

                    def p_body(carry):
                        m = carry[0]
                        rem = carry[1]
                        accs = body(m, tuple(carry[2:]))
                        rem = jnp.where(rem == m, bigp, rem)
                        return (jnp.min(rem), rem) + tuple(accs)

                    out = jax.lax.while_loop(
                        p_cond, p_body, (jnp.min(rem0), rem0) + init
                    )
                    vals = tuple(out[2:])
                else:
                    vals = jax.lax.fori_loop(c_lo, c_hi + 1, body, init)
                for k in range(num_classes):
                    for si, s in enumerate(s_list):
                        i = s * T + t
                        pdf_sums[s][k] = pdf_sums[s][k] + jnp.where(
                            acts[i], vals[k * kk + si], 0.0
                        )

            if union:
                pdf_sweep(t, list(range(K)), leaf_bounds[t])
            else:
                for s in range(K):
                    pdf_sweep(t, [s], leaf_walk_bounds[s * T + t])

    best_cs = []
    for s in range(K):
        best_v = jnp.zeros((SUB, LANE), jnp.float32)
        best_c = jnp.zeros((SUB, LANE), jnp.int32)
        for k in range(num_classes):
            better = pdf_sums[s][k] > best_v
            best_v = jnp.where(better, pdf_sums[s][k], best_v)
            best_c = jnp.where(better, k, best_c)
        best_cs.append(best_c)
    return best_cs, all_dones


def _prep_planes(di, r, hl_pad, wl_pad):
    """Row-apron pad + adjacent-row i32 packing + strided label-center image.

    The apron is 16 rows top/bottom only (see APRON_T) — OOB probes are
    masked in-register, so no sentinel padding and NO column padding at all,
    keeping this XLA preamble an order of magnitude smaller than a sentinel
    apron would be.  Packed row q = padded image row 2q in the low 16 bits,
    row 2q+1 in the high 16: one window gather serves both rows (and the
    labels_reduce=2 stride falls out of the same layout), at half the plane
    VMEM of the even/odd split it replaces."""
    n, h, w = di.shape
    hl, wl = h // r, w // r
    # The plane must be wide enough for whole-LANE window loads and tall
    # enough for the deepest aligned 16-packed-row window
    # (max srow = h-1+APRON_T in 2x packed units).
    w_pad = ((w + LANE - 1) // LANE) * LANE
    packed_rows = (((h + APRON_T - 1) // 2) // SUB) * SUB + 2 * SUB
    if _RSPAN > 1:
        # multi-row serving loads 4 sublane tiles (32 rows) per window —
        # a POWER-OF-2 sublane count, so the cyclic rolls the serve chain
        # applies lower exactly (a 24-row load would need modulo-24
        # rotation across 3 vregs)
        packed_rows += 2 * SUB
    pad_b = packed_rows * 2 - h - APRON_T
    padded = jnp.pad(di, ((0, 0), (APRON_T, pad_b), (0, w_pad - w)))
    depth_packed = padded[:, 0::2, :] | (padded[:, 1::2, :] << 16)
    d_center = di[:, ::r, ::r]
    if hl_pad != hl or wl_pad != wl:
        d_center = jnp.pad(
            d_center, ((0, 0), (0, hl_pad - hl), (0, wl_pad - wl))
        )
    return depth_packed, d_center


def _make_kernel(num_trees, depth_levels, num_classes, counts, num_leaves,
                 r, h, w, write_all_eligible):
    """Single-forest kernel body with static config baked in."""

    def kernel(scale_ref, fc_ref, packed_ref, dc_ref, filt_ref, *args):
        tables = args[: depth_levels * NCOMP]
        leaf_pdf_r = args[depth_levels * NCOMP]
        out_ref = args[depth_levels * NCOMP + 1]
        scratch_ref = args[depth_levels * NCOMP + 2]

        y_pxs, x_pxs, gather_image_multi, chunked_lookup, prims = (
            _tile_context(
                [packed_ref], r, h, w,
                [(pl.program_id(1), pl.program_id(2))],
                scratch_ref=scratch_ref,
            )
        )
        d_center = dc_ref[0]
        filt = filt_ref[0]
        fc = fc_ref[0, 0]
        scale = scale_ref[0, 0]

        eligible = (d_center != 0) & (d_center != MAX_UINT16)
        eligible &= (fc < 0) | (filt == fc)

        df = d_center.astype(jnp.float32)
        safe_df = jnp.where(df == 0.0, 1.0, df)
        zero_center = df == 0.0

        best_cs, all_dones = _traverse_tiles(
            tables, leaf_pdf_r, num_leaves, num_trees, depth_levels,
            num_classes, counts, [(eligible, safe_df, zero_center)], scale,
            y_pxs, x_pxs, gather_image_multi, chunked_lookup,
            bound_helpers=prims[2:6],
        )
        write = (
            eligible if write_all_eligible else (eligible & all_dones[0])
        )
        out_ref[0] = jnp.where(write, best_cs[0], MAX_UINT16)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims",
        "labels_reduce",
        "write_all_eligible",
        "interpret",
    ),
)
def _run_pallas(
    depth_packed, d_center, filt, scale, filter_class, tables_flat,
    *, dims, labels_reduce, write_all_eligible, interpret,
):
    (n, h, w, hl_pad, wl_pad, num_trees, depth_levels, num_classes,
     counts, num_leaves) = dims
    r = labels_reduce

    kernel = _make_kernel(
        num_trees, depth_levels, num_classes, counts, num_leaves, r, h, w,
        write_all_eligible
    )

    grid = (n, hl_pad // SUB, wl_pad // LANE)
    plane_spec = pl.BlockSpec(
        (1,) + depth_packed.shape[1:],
        lambda nn, ty, tx: (nn, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tile_spec = pl.BlockSpec(
        (1, SUB, LANE), lambda nn, ty, tx: (nn, ty, tx),
        memory_space=pltpu.VMEM,
    )
    table_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in tables_flat
    ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane_spec,
            tile_spec,
            tile_spec,
            *table_specs,
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((n, hl_pad, wl_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((SUB, 64), jnp.int32)],
        interpret=interpret,
    )(scale, filter_class, depth_packed, d_center, filt, *tables_flat)


@functools.partial(
    jax.jit,
    static_argnames=(
        "meta",
        "labels_reduce",
        "filter_class",
        "write_all_eligible",
        "interpret",
    ),
)
def evaluate_forest_pallas(
    depth: jnp.ndarray,
    packed_tables,
    meta: Tuple[int, int, int],
    *,
    labels_reduce: int = 1,
    filter_images: Optional[jnp.ndarray] = None,
    filter_class: int = -1,
    scale_factor=1.0,
    write_all_eligible: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fast path for :func:`ops.forest_eval.evaluate_forest`.

    depth: (N, H, W) uint16; packed_tables/meta from :func:`pack_tables_pallas`.
    Returns (N, H//r, W//r) uint16 labels (65535 where not evaluated).
    """
    num_trees, depth_levels, num_classes, counts, num_leaves = meta
    n, h, w = depth.shape
    r = labels_reduce
    hl, wl = h // r, w // r
    hl_pad = ((hl + SUB - 1) // SUB) * SUB
    wl_pad = ((wl + LANE - 1) // LANE) * LANE

    di = depth.astype(jnp.int32)
    depth_packed, d_center = _prep_planes(di, r, hl_pad, wl_pad)
    if filter_images is not None:
        filt = jnp.pad(
            filter_images.astype(jnp.int32),
            ((0, 0), (0, hl_pad - hl), (0, wl_pad - wl)),
        )
        fc = jnp.full((1, 1), filter_class, jnp.int32)
    else:
        filt = jnp.zeros_like(d_center)
        fc = jnp.full((1, 1), -1, jnp.int32)

    tables_flat = []
    for lvl in packed_tables:
        tables_flat.extend(lvl)

    dims = (
        n, h, w, hl_pad, wl_pad, num_trees, depth_levels, num_classes,
        counts, num_leaves,
    )
    out = _run_pallas(
        depth_packed,
        d_center,
        filt,
        jnp.full((1, 1), scale_factor, jnp.float32),
        fc,
        tuple(tables_flat),
        dims=dims,
        labels_reduce=r,
        write_all_eligible=write_all_eligible,
        interpret=interpret,
    )
    return out[:, :hl, :wl].astype(jnp.uint16)


# ---------------------------------------------------------------------------
# fused layered evaluation: all layers + composite in ONE kernel
# ---------------------------------------------------------------------------

def _make_layered_kernel(metas, filter_specs, r, h, w, num_cond, nty, ntx,
                         tile_k=1):
    """Kernel running every layer's forest over ``tile_k`` tiles (each layer
    filtered by an earlier layer's in-register labels) and walking the
    conditions table — the whole LayeredDecisionForest.run +
    make_composite_labels_image (tree_eval.cu:214-248) in a single grid pass.

    The grid is a COMPACTED 1-D list of occupied tiles (scalar-prefetched
    flat ids, dynamic length): background tiles never run at all — the
    TPU-native equivalent of the reference kernel's per-pixel early-outs
    (tree_eval.cu:81-93), moved up to tile granularity so empty desk pixels
    cost zero grid steps instead of a per-level check.  With tile_k > 1 each
    grid step walks K consecutive compacted tiles together: the per-level
    serial machinery (bound reduces, table sweeps, gates) is shared across
    the K tiles (see _traverse_tiles), and each tile writes to its own
    output canvas (slot = its rank in the compacted list, mod K; the caller
    merges by rank)."""
    K = tile_k

    def kernel(idx_ref, scale_ref, *args):
        # per-slot inputs: (packed plane, d_center) x K
        planes = []
        dcs = []
        pos = 0
        for s in range(K):
            planes.append(args[pos])
            dcs.append(args[pos + 1])
            pos += 2
        layer_tables = []
        layer_leaf_pdfs = []
        for (t, d, c, _counts, _nl) in metas:
            layer_tables.append(args[pos : pos + d * NCOMP])
            layer_leaf_pdfs.append(args[pos + d * NCOMP])
            pos += d * NCOMP + 1
        cond_flag_ref = args[pos]
        cond_val_ref = args[pos + 1]
        out_refs = args[pos + 2 : pos + 2 + K]
        scratch_ref = args[pos + 2 + K]

        tytx = []
        for s in range(K):
            flat = idx_ref[K * pl.program_id(0) + s]
            tytx.append(((flat // ntx) % nty, flat % ntx))
        y_pxs, x_pxs, gather_image_multi, chunked_lookup, prims = (
            _tile_context(planes, r, h, w, tytx, scratch_ref=scratch_ref)
        )
        scale = scale_ref[0, 0]

        insts_base = []
        for s in range(K):
            d_center = dcs[s][0]
            base_eligible = (d_center != 0) & (d_center != MAX_UINT16)
            df = d_center.astype(jnp.float32)
            safe_df = jnp.where(df == 0.0, 1.0, df)
            zero_center = df == 0.0
            insts_base.append((base_eligible, safe_df, zero_center))

        labels = []  # [layer][tile]
        for i, ((t, d, c, counts, nl), (fm, fc)) in enumerate(
            zip(metas, filter_specs)
        ):
            insts = []
            for s in range(K):
                eligible = insts_base[s][0]
                if fm is not None:
                    eligible = eligible & (labels[fm][s] == fc)
                insts.append((eligible, insts_base[s][1], insts_base[s][2]))
            best_cs, _ = _traverse_tiles(
                layer_tables[i], layer_leaf_pdfs[i], nl, t, d, c, counts,
                insts, scale, y_pxs, x_pxs,
                gather_image_multi, chunked_lookup, bound_helpers=prims[2:6],
            )
            labels.append([
                jnp.where(insts[s][0], best_cs[s], MAX_UINT16)
                for s in range(K)
            ])

        # composite walk (reference conditions semantics,
        # decision_tree.py:209-225)
        def cond_lookup(ref, idx):
            # conditions live in row 0 of a (SUB, LANE) block
            return chunked_lookup(
                lambda sc, _r=ref: _r[...], idx,
                jnp.ones((SUB, LANE), jnp.bool_), jnp.int32, num_cond,
            )

        for s in range(K):
            offset = jnp.zeros((SUB, LANE), jnp.int32)
            out = jnp.full((SUB, LANE), MAX_UINT16, jnp.int32)
            done = jnp.zeros((SUB, LANE), jnp.bool_)
            for i in range(len(metas)):
                l = labels[i][s]
                invalid = (l == 0) | (l == MAX_UINT16)
                row_idx = jnp.clip(offset + l - 1, 0, num_cond - 1)
                flag = cond_lookup(cond_flag_ref, row_idx)
                val = cond_lookup(cond_val_ref, row_idx)
                active = (~done) & (~invalid)
                emit = active & (flag == 0)
                out = jnp.where(emit, val, out)
                offset = jnp.where(active & (flag == 1), val, offset)
                done = done | invalid | emit

            out_refs[s][0] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "metas", "filter_specs", "labels_reduce", "interpret",
        "tile_k",
    ),
)
def _run_layered_pallas(
    depth_packed, d_center, scale, tables_flat,
    cond_flag, cond_val,
    *, dims, metas, filter_specs, labels_reduce, interpret, tile_k=1,
):
    (n, h, w, hl_pad, wl_pad, num_cond) = dims
    r = labels_reduce
    nty, ntx = hl_pad // SUB, wl_pad // LANE
    ntiles = n * nty * ntx
    K = tile_k
    kernel = _make_layered_kernel(
        metas, filter_specs, r, h, w, num_cond, nty, ntx, tile_k=K
    )

    # Tile compaction: only tiles holding at least one classifiable pixel get
    # a grid step.  flatnonzero keeps ascending order, so the hand index is
    # monotone across steps and each packed plane is DMA'd into VMEM once
    # (and with K > 1 a step's K tiles are spatial neighbors, keeping the
    # unioned sweeps narrow).
    elig = (d_center != 0) & (d_center != MAX_UINT16)
    tile_act = elig.reshape(n, nty, SUB, ntx, LANE).any(axis=(2, 4))
    flat_act = tile_act.reshape(ntiles)
    tile_list = jnp.flatnonzero(
        flat_act, size=ntiles, fill_value=0
    ).astype(jnp.int32)
    if interpret:
        # interpret mode needs a concrete trip count; run every tile
        # (identity list) — semantics identical, just unskipped.
        n_active = ntiles
        tile_list = jnp.arange(ntiles, dtype=jnp.int32)
    else:
        n_active = flat_act.sum().astype(jnp.int32)
    # The last grid step's K slots may read past n_active (and past ntiles
    # when ntiles % K != 0): pad with tile 0, whose writes land in slots the
    # rank merge never reads.
    if K > 1:
        tile_list = jnp.concatenate(
            [tile_list, jnp.zeros((K - 1,), jnp.int32)]
        )

    def plane_map_s(s):
        def m(i, idx):
            return (idx[K * i + s] // (nty * ntx), 0, 0)
        return m

    def tile_map_s(s):
        def m(i, idx):
            f = idx[K * i + s]
            return (f // (nty * ntx), (f // ntx) % nty, f % ntx)
        return m

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    slot_specs = []
    for s in range(K):
        slot_specs += [
            pl.BlockSpec(
                (1,) + depth_packed.shape[1:], plane_map_s(s),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUB, LANE), tile_map_s(s), memory_space=pltpu.VMEM
            ),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((n_active + K - 1) // K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *slot_specs,
            *[vm for _ in tables_flat],
            vm,
            vm,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, SUB, LANE), tile_map_s(s), memory_space=pltpu.VMEM
            )
            for s in range(K)
        ],
        scratch_shapes=[pltpu.VMEM((SUB, 64), jnp.int32)],
    )

    slot_inputs = []
    for _ in range(K):
        slot_inputs += [depth_packed, d_center]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, hl_pad, wl_pad), jnp.int32)
            for _ in range(K)
        ],
        interpret=interpret,
    )(tile_list, scale, *slot_inputs, *tables_flat, cond_flag, cond_val)

    if K == 1:
        out = outs[0]
    else:
        # Each tile's labels live in the canvas of its slot = rank-in-the-
        # list mod K (a padded final step duplicates tile 0 into an unread
        # slot).  Merge by per-tile slot id.  In interpret mode the list is
        # the identity, so the rank IS the flat id.
        if interpret:
            ranks = jnp.arange(ntiles, dtype=jnp.int32)
        else:
            ranks = jnp.cumsum(flat_act.astype(jnp.int32)) - 1
        slot = (ranks % K).reshape(n, nty, 1, ntx, 1)
        slot = jnp.broadcast_to(
            slot, (n, nty, SUB, ntx, LANE)
        ).reshape(n, hl_pad, wl_pad)
        out = outs[K - 1]
        for s in range(K - 1):
            out = jnp.where(slot == s, outs[s], out)
    # Unvisited (all-background) tiles hold uninitialized output; every
    # ineligible pixel's label is MAX_UINT16 by the kernel's own rule, so one
    # mask restores exact semantics.
    return jnp.where(elig, out, MAX_UINT16)


def _pack_conditions(conditions: np.ndarray):
    """conditions (K, 2) -> two (SUB, LANE) superchunk-row-0 arrays."""
    k = conditions.shape[0]
    assert k <= LANE, "conditions tables beyond 128 rows unsupported in-kernel"
    flag = np.zeros((SUB, LANE), np.int32)
    val = np.zeros((SUB, LANE), np.int32)
    flag[:, :k] = conditions[:, 0][None, :]  # pre-broadcast for the fast path
    val[:, :k] = conditions[:, 1][None, :]
    return jnp.asarray(flag), jnp.asarray(val)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metas", "num_cond", "filter_specs", "labels_reduce", "interpret"
    ),
)
def evaluate_layered_pallas(
    depth: jnp.ndarray,
    layer_tables: tuple,
    metas: tuple,
    conditions_packed,
    num_cond: int,
    *,
    filter_specs: tuple,
    labels_reduce: int = 1,
    scale_factor=1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """All layers + composite in one fused kernel.

    layer_tables/metas: per-layer outputs of :func:`pack_tables_pallas`;
    conditions_packed: output of :func:`_pack_conditions` (host-side, once
    per model); num_cond: static conditions-table row count; filter_specs as
    in models.layered.run_layered.  Returns (N, H//r, W//r) uint16 composite.
    """
    n, h, w = depth.shape
    r = labels_reduce
    hl, wl = h // r, w // r
    hl_pad = ((hl + SUB - 1) // SUB) * SUB
    wl_pad = ((wl + LANE - 1) // LANE) * LANE

    di = depth.astype(jnp.int32)
    depth_packed, d_center = _prep_planes(di, r, hl_pad, wl_pad)

    cond_flag, cond_val = conditions_packed
    tables_flat = []
    for lvl_tables in layer_tables:
        for lvl in lvl_tables:
            tables_flat.extend(lvl)

    dims = (n, h, w, hl_pad, wl_pad, num_cond)
    out = _run_layered_pallas(
        depth_packed, d_center,
        jnp.full((1, 1), scale_factor, jnp.float32),
        tuple(tables_flat), cond_flag, cond_val,
        dims=dims, metas=tuple(metas), filter_specs=tuple(filter_specs),
        labels_reduce=r, interpret=interpret,
        tile_k=int(os.environ.get("B3D_EVAL_TILEK", "1")),
    )
    return out[:, :hl, :wl].astype(jnp.uint16)
