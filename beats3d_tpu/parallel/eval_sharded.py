"""Multi-chip forest evaluation: frames sharded over ``data``, trees sharded
over ``model`` with a one-psum pdf combine (tensor-parallel ensemble)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import forest_eval


def evaluate_forest_sharded(
    depth: jnp.ndarray,
    tables: Tuple,
    mesh: Mesh,
    *,
    labels_reduce: int = 1,
    scale_factor: float = 1.0,
) -> jnp.ndarray:
    """Labels for a batch of depth frames on a (data, model) mesh.

    depth: (N, H, W) uint16, N divisible by mesh 'data' size.  ``tables``
    tree axis must be divisible by mesh 'model' size; each model shard
    traverses its tree slice and the per-pixel pdf sums combine with one
    ``psum`` over 'model' (the reference's shared-memory atomicAdd reduction,
    tree_eval.cu:123-135, reborn as an ICI collective).
    """
    table_spec = jax.tree.map(lambda _: P("model"), tables)

    @functools.partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("data"), table_spec),
        out_specs=P("data"),
    )
    def shard_fn(depth_shard, table_shard):
        pdf, eligible, all_done = forest_eval.forest_pdf_sum(
            depth_shard,
            table_shard,
            labels_reduce=labels_reduce,
            scale_factor=scale_factor,
        )
        pdf = jax.lax.psum(pdf, "model")
        all_done = jax.lax.pmin(
            all_done.astype(jnp.int32), "model"
        ).astype(bool)
        return forest_eval.labels_from_pdf(pdf, eligible, all_done)

    return shard_fn(depth, tables)
