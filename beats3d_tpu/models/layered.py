"""Layered (stacked/conditional) decision forests, Keskin-style.

Config JSON schema is identical to the reference's
(src/decision_tree.py:171-230): ``layers`` is a list of ``{"model": <relative
.npy path>, "filter_model": <index of earlier layer>, "filter_model_class":
<class id>}`` (filter keys optional), plus a ``conditions`` table of
``(0, CLASS_ID) | (1, NEXT_OFFSET)`` rows and ``label_colors`` (RGBA per final
class).  Model paths are resolved relative to the config file.

Note: the reference has a truthy-string bug at decision_tree.py:192
(``'filter_model_class in l'``) whose *effective* behavior is "use the filter
whenever 'filter_model' is present"; we implement that effective behavior and
require 'filter_model_class' alongside 'filter_model'.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import forest_eval
from ..ops import forest_eval_pallas
from .forest import DecisionForest, PackedForest

MAX_UINT16 = 65535


@dataclasses.dataclass
class LayerSpec:
    forest: PackedForest
    filter_model: Optional[int]
    filter_model_class: Optional[int]
    pallas_tables: Optional[tuple] = None   # (levels, meta) lazy
    flat: Optional[object] = None           # original packed array


@dataclasses.dataclass
class LayeredDecisionForest:
    """Runs N forests in sequence; later forests only evaluate pixels that an
    earlier ("filter") forest labeled with a given class, then composites the
    per-layer label images into final class ids (reference
    decision_tree.py:233-264)."""

    layers: List[LayerSpec]
    conditions: jnp.ndarray  # (K, 2) int32
    label_colors: np.ndarray  # (num_layered_classes, 4) uint8
    num_layered_classes: int
    labels_reduce: int = 1
    conditions_np: Optional[np.ndarray] = None
    _cond_packed: Optional[tuple] = None

    @staticmethod
    def load(config_path: str, labels_reduce: int = 1) -> "LayeredDecisionForest":
        with open(config_path) as f:
            cfg = json.load(f)
        root = os.path.dirname(os.path.abspath(config_path))
        return LayeredDecisionForest.from_config(cfg, root, labels_reduce)

    @staticmethod
    def from_config(cfg: dict, root: str, labels_reduce: int = 1):
        layers = []
        for l in cfg["layers"]:
            df = DecisionForest.load(os.path.join(root, l["model"]))
            forest = df.pack()
            if "filter_model" in l:
                layers.append(
                    LayerSpec(forest, int(l["filter_model"]),
                              int(l["filter_model_class"]), flat=df.data)
                )
            else:
                layers.append(LayerSpec(forest, None, None, flat=df.data))

        conditions = np.array(cfg["conditions"], dtype=np.int32)
        num_layered_classes = int(
            max(c[1] for c in conditions if c[0] == 0)
        )
        label_colors = np.array(cfg["label_colors"], dtype=np.uint8)
        assert label_colors.shape == (num_layered_classes, 4), label_colors.shape
        return LayeredDecisionForest(
            layers=layers,
            conditions=jnp.asarray(conditions),
            label_colors=label_colors,
            num_layered_classes=num_layered_classes,
            labels_reduce=labels_reduce,
            conditions_np=conditions,
        )

    def pallas_supported(self) -> bool:
        """The fused kernel walks the conditions table with a single
        128-lane shuffle; wider tables (reference models use ~8 rows) fall
        back to the XLA composite instead of crashing."""
        return np.asarray(self.conditions_np).shape[0] <= 128

    def layer_tables(self) -> Tuple:
        """Pytree of all layers' XLA tables (for passing through jit)."""
        return tuple(l.forest.tables() for l in self.layers)

    def layer_tables_pallas(self) -> Tuple:
        """Pytree of all layers' Pallas-kernel tables."""
        out = []
        for l in self.layers:
            if l.pallas_tables is None:
                l.pallas_tables = forest_eval_pallas.pack_tables_pallas(l.flat)
            out.append(l.pallas_tables[0])
        return tuple(out)

    def conditions_packed(self) -> tuple:
        """Kernel-layout conditions tables for the fused Pallas path."""
        if self._cond_packed is None:
            self._cond_packed = forest_eval_pallas._pack_conditions(
                np.asarray(self.conditions_np)
            )
        return self._cond_packed

    def layer_metas(self) -> Tuple:
        """Static (T, D, C) per layer for the Pallas backend."""
        out = []
        for l in self.layers:
            if l.pallas_tables is None:
                l.pallas_tables = forest_eval_pallas.pack_tables_pallas(l.flat)
            out.append(l.pallas_tables[1])
        return tuple(out)

    def run(self, depth: jnp.ndarray, scale_factor=1.0,
            backend: str = "xla") -> jnp.ndarray:
        """Evaluate all layers on (N, H, W) uint16 depth; returns composite
        (N, H//r, W//r) uint16 labels (65535 = unlabeled)."""
        if backend == "pallas" and not self.pallas_supported():
            backend = "xla"  # conditions table too wide for the fused kernel
        tables = (
            self.layer_tables_pallas() if backend == "pallas"
            else self.layer_tables()
        )
        fspecs = tuple(
            (l.filter_model, l.filter_model_class) for l in self.layers
        )
        if backend == "pallas":
            return forest_eval_pallas.evaluate_layered_pallas(
                depth,
                self.layer_tables_pallas(),
                self.layer_metas(),
                self.conditions_packed(),
                int(np.asarray(self.conditions_np).shape[0]),
                filter_specs=fspecs,
                labels_reduce=self.labels_reduce,
                scale_factor=scale_factor,
            )
        return run_layered(
            depth,
            tables,
            self.conditions,
            filter_specs=fspecs,
            labels_reduce=self.labels_reduce,
            scale_factor=scale_factor,
        )


def run_layered(
    depth: jnp.ndarray,
    layer_tables: Tuple,
    conditions: jnp.ndarray,
    *,
    filter_specs: Tuple,
    labels_reduce: int,
    scale_factor=1.0,
    backend: str = "xla",
    metas: Optional[Tuple] = None,
    conditions_packed=None,
    num_cond: Optional[int] = None,
) -> jnp.ndarray:
    """Functional layered-forest forward pass (jit-traceable; call under jit).

    filter_specs: static tuple of (filter_model_index | None, filter_class |
    None).  backend "pallas" dispatches to the fused single-kernel path
    (all layers + composite in one grid pass, ~50x faster on hardware);
    "xla" runs the vectorized evaluator layer by layer.
    """
    if backend == "pallas":
        return forest_eval_pallas.evaluate_layered_pallas(
            depth, layer_tables, metas, conditions_packed, num_cond,
            filter_specs=filter_specs, labels_reduce=labels_reduce,
            scale_factor=scale_factor,
        )
    label_images = []
    for i, (tables, (fm, fc)) in enumerate(zip(layer_tables, filter_specs)):
        kw = dict(labels_reduce=labels_reduce, scale_factor=scale_factor)
        if fm is not None:
            kw.update(filter_images=label_images[fm], filter_class=int(fc))
        labels = forest_eval.evaluate_forest(depth, tables, **kw)
        label_images.append(labels)

    stacked = jnp.stack(label_images, axis=0)  # (M, N, Hl, Wl)
    return forest_eval.composite_labels(stacked, conditions)
