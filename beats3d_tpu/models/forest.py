"""Randomized-decision-forest model containers and artifact IO.

Artifact contract (kept byte-compatible with the reference so its saved models load
unchanged; cf. reference src/decision_tree.py:124-168):

    forest = float32 array of shape (num_trees, 2**max_depth - 1, 7 + 2*num_classes)

Each node packs (ux, uy, vx, vy, thresh, l_next, r_next, l_pdf[C], r_pdf[C]).
``l_next``/``r_next`` semantics (reference src/cuda/tree_eval.cu:95-127): a float
whose floor == -1 means "descend to the child at the next level"; anything else
(the trainer writes 0.0) means "this branch terminates here, emit the
corresponding pdf".  Node indices are *within-level* indices: the children of
within-level node ``g`` are ``2g`` (left) and ``2g + 1`` (right) at the next level.

The flat packed layout is what gets saved/loaded.  For TPU evaluation we re-pack
into a structure-of-arrays *per tree level* (:class:`PackedForest`): level ``j``
holds ``2**j`` nodes, so the shallow levels are tiny gather tables that XLA keeps
in fast memory, and traversal is level-synchronous (all pixels advance one level
per step) — the TPU-native replacement for the reference's per-thread
data-dependent descent.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np


def forest_config(max_depth: int, num_classes: int):
    """(total_nodes, max_leaf_nodes, node_els) for a packed tree.

    Mirrors reference src/decision_tree.py:135-144 (``DecisionTree.get_config``).
    """
    total_tree_nodes = (2 ** max_depth) - 1
    max_leaf_nodes = 2 ** max_depth
    tree_node_els = 7 + (num_classes * 2)
    return total_tree_nodes, max_leaf_nodes, tree_node_els


@dataclasses.dataclass
class DecisionTree:
    """A single tree in packed layout (host numpy).

    ``data`` has shape (total_nodes, 7 + 2C), float32, level-order
    (within-level node g of level j lives at flat index 2**j - 1 + g).
    """

    max_depth: int
    num_classes: int
    data: np.ndarray = None

    def __post_init__(self):
        total, _, els = forest_config(self.max_depth, self.num_classes)
        if self.data is None:
            self.data = np.zeros((total, els), dtype=np.float32)
        assert self.data.shape == (total, els), self.data.shape

    @property
    def total_nodes(self) -> int:
        return self.data.shape[0]


@dataclasses.dataclass
class DecisionForest:
    """A forest in packed layout (host numpy), shape (T, total_nodes, 7+2C)."""

    num_trees: int
    max_depth: int
    num_classes: int
    data: np.ndarray = None

    def __post_init__(self):
        total, _, els = forest_config(self.max_depth, self.num_classes)
        if self.data is None:
            self.data = np.zeros((self.num_trees, total, els), dtype=np.float32)
        assert self.data.shape == (self.num_trees, total, els), self.data.shape

    @staticmethod
    def load(path: str) -> "DecisionForest":
        """Load a .npy forest, inferring dims from the array shape.

        Mirrors reference src/decision_tree.py:146-158 (``DecisionForest.load``).
        """
        arr = np.load(path).astype(np.float32)
        num_trees = arr.shape[0]
        max_depth = int(np.log2(arr.shape[1] + 1))
        num_classes = (arr.shape[2] - 7) // 2
        return DecisionForest(num_trees, max_depth, num_classes, arr)

    def save(self, path: str) -> None:
        np.save(path, self.data)

    @staticmethod
    def from_trees(trees: List[DecisionTree]) -> "DecisionForest":
        t0 = trees[0]
        data = np.stack([t.data for t in trees]).astype(np.float32)
        return DecisionForest(len(trees), t0.max_depth, t0.num_classes, data)

    def pack(self) -> "PackedForest":
        return PackedForest.from_flat(self.data)


@dataclasses.dataclass
class ForestLevel:
    """Per-level SoA node tables (device arrays once used under jit).

    Shapes (T = num_trees, G = 2**level, C = num_classes):
      uv:      (T, G, 4) float32  — (ux, uy, vx, vy) probe offsets
      thresh:  (T, G)    float32
      lr_next: (T, G, 2) int32    — floor of the stored floats; -1 = descend
      pdf:     (T, G, 2, C) float32 — (left, right) leaf pdfs
    """

    uv: jnp.ndarray
    thresh: jnp.ndarray
    lr_next: jnp.ndarray
    pdf: jnp.ndarray


@dataclasses.dataclass
class PackedForest:
    """Level-synchronous SoA packing of a forest for TPU evaluation.

    Registered as a pytree-compatible object via plain tuples in
    :meth:`tables` so it can be passed through ``jax.jit`` boundaries.
    """

    num_trees: int
    max_depth: int
    num_classes: int
    levels: List[ForestLevel]

    @staticmethod
    def from_flat(arr: np.ndarray) -> "PackedForest":
        assert arr.ndim == 3, arr.shape
        num_trees = arr.shape[0]
        max_depth = int(np.log2(arr.shape[1] + 1))
        num_classes = (arr.shape[2] - 7) // 2
        assert arr.shape[1] == 2 ** max_depth - 1

        levels = []
        for j in range(max_depth):
            lo, hi = 2 ** j - 1, 2 ** (j + 1) - 1
            nodes = arr[:, lo:hi, :]
            uv = np.ascontiguousarray(nodes[:, :, 0:4], dtype=np.float32)
            thresh = np.ascontiguousarray(nodes[:, :, 4], dtype=np.float32)
            # Reference reads l/r via __float2int_rd (floor): tree_eval.cu:101-102.
            lr_next = np.floor(nodes[:, :, 5:7]).astype(np.int32)
            c = num_classes
            pdf = np.stack(
                [nodes[:, :, 7 : 7 + c], nodes[:, :, 7 + c : 7 + 2 * c]], axis=2
            ).astype(np.float32)
            levels.append(
                ForestLevel(
                    uv=jnp.asarray(uv),
                    thresh=jnp.asarray(thresh),
                    lr_next=jnp.asarray(lr_next),
                    pdf=jnp.asarray(pdf),
                )
            )
        return PackedForest(num_trees, max_depth, num_classes, levels)

    def tables(self):
        """Pytree of per-level tables, suitable as a jit argument."""
        return tuple(
            (lv.uv, lv.thresh, lv.lr_next, lv.pdf) for lv in self.levels
        )
