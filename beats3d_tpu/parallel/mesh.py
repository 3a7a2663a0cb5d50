"""Device-mesh construction for multi-chip scale-out.

The reference is strictly single-GPU (SURVEY.md §2.6, §5.8) — no collectives
exist to translate.  Scale-out here is a deliberate TPU-native addition for
the offline paths where throughput matters (batch eval and forest training):

* ``data`` axis — pure data parallelism over images/frames.  Training
  histograms are additive integer counts, so the cross-chip combine is exactly
  one ``psum`` riding ICI (SURVEY.md §5.8).
* ``model`` axis — trees (for ensemble eval: partial pdf sums + ``psum``) or
  split proposals (for training: each shard scans its own proposal slice; the
  best-gain merge is a tiny ``pmax``-style reduction).

A forest is KBs-MBs of read-only parameters, so model state replicates
trivially; no TP/PP of parameters is warranted (SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_data: int = None, n_model: int = 1, devices=None) -> Mesh:
    """A (data, model) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))
