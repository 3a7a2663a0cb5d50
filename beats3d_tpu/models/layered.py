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
from .forest import DecisionForest, PackedForest

MAX_UINT16 = 65535


@dataclasses.dataclass
class LayerSpec:
    forest: PackedForest
    filter_model: Optional[int]
    filter_model_class: Optional[int]


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
            forest = DecisionForest.load(os.path.join(root, l["model"])).pack()
            if "filter_model" in l:
                layers.append(
                    LayerSpec(forest, int(l["filter_model"]), int(l["filter_model_class"]))
                )
            else:
                layers.append(LayerSpec(forest, None, None))

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
        )

    def layer_tables(self) -> Tuple:
        """Pytree of all layers' tables (for passing through jit boundaries)."""
        return tuple(l.forest.tables() for l in self.layers)

    def run(self, depth: jnp.ndarray, scale_factor=1.0) -> jnp.ndarray:
        """Evaluate all layers on (N, H, W) uint16 depth; returns composite
        (N, H//r, W//r) uint16 labels (65535 = unlabeled)."""
        return run_layered(
            depth,
            self.layer_tables(),
            self.conditions,
            filter_specs=tuple(
                (l.filter_model, l.filter_model_class) for l in self.layers
            ),
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
) -> jnp.ndarray:
    """Functional layered-forest forward pass (jit-traceable; call under jit).

    filter_specs: static tuple of (filter_model_index | None, filter_class | None).
    """
    label_images = []
    for tables, (fm, fc) in zip(layer_tables, filter_specs):
        if fm is not None:
            filt = label_images[fm]
            labels = forest_eval.evaluate_forest(
                depth,
                tables,
                labels_reduce=labels_reduce,
                filter_images=filt,
                filter_class=int(fc),
                scale_factor=scale_factor,
            )
        else:
            labels = forest_eval.evaluate_forest(
                depth,
                tables,
                labels_reduce=labels_reduce,
                scale_factor=scale_factor,
            )
        label_images.append(labels)

    stacked = jnp.stack(label_images, axis=0)  # (M, N, Hl, Wl)
    return forest_eval.composite_labels(stacked, conditions)
