"""Multi-chip forest-training steps.

Training histograms are additive integer counts, so data parallelism over
image blocks is exact: each chip histograms its image shard, one ``psum`` over
'data' combines (SURVEY.md §2.6/§5.8).  Split proposals shard over 'model' —
each chip scans its own proposal slice and the per-node best-gain merge is a
tiny all-reduce of (gain, argmax) pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..train import trainer as _trainer


def sharded_histogram_step(
    depth, labels, nodes, props, mesh: Mesh,
    *, num_classes: int, w2: int, node_lo: int, chunk: int = 1 << 13,
    use_matmul: bool = True,
):
    """Distributed `_histogram_step`: images sharded over 'data', proposals
    sharded over 'model'.

    depth/labels/nodes: (B, H, W) with B divisible by the data axis;
    props: (P, 5) with P divisible by the model axis.
    Returns (left (P, w2, C) int32, total (w2, C) int32), replicated.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("data"), P("data"), P("data"), P("model")),
        out_specs=(P("model"), P()),
    )
    def fn(d, l, n, pr):
        left, total = _trainer._histogram_step(
            d, l, n, pr,
            num_classes=num_classes, w2=w2, node_lo=node_lo,
            chunk=chunk, use_matmul=use_matmul,
        )
        left = jax.lax.psum(left, "data")
        total = jax.lax.psum(total, "data")
        # 'total' is proposal-independent; average the (identical) model-shard
        # copies via psum/size to keep it replicated.
        total = jax.lax.psum(total, "model") // mesh.shape["model"]
        return left, total

    return fn(depth, labels, nodes, props)


def sharded_train_step(
    depth, labels, nodes, props, active_nodes, parent_counts,
    best_gain, best_params, best_left, best_right, mesh: Mesh,
    *, num_classes: int, w2: int, node_lo: int, chunk: int = 1 << 13,
):
    """One full distributed training step: histogram + best-split merge.

    This is the unit `dryrun_multichip` compiles: it exercises data-parallel
    psum of histograms and model-parallel proposal scanning with a cross-shard
    argmax merge, i.e. the framework's real dp+mp sharding.
    """
    p = props.shape[0]
    m = mesh.shape["model"]

    @functools.partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P("data"), P("data"), P("data"), P("model"),
            P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P(), P()),
    )
    def fn(d, l, n, pr, act, pc, bg, bp, bl, br):
        left, total = _trainer._histogram_step(
            d, l, n, pr,
            num_classes=num_classes, w2=w2, node_lo=node_lo,
            chunk=chunk, use_matmul=True,
        )
        left = jax.lax.psum(left, "data")
        total = jax.lax.psum(total, "data")

        # local best over this shard's proposal slice
        g, params, lcounts, rcounts = _trainer._pick_best_step(
            act, pc, left, total, pr,
            bg, bp, bl, br, w2=w2, parent_lo=node_lo // 2,
        )
        # merge across model shards: keep the shard with the max gain; exact
        # ties resolve to the lowest shard index = lowest global proposal
        # index, matching the reference's ascending strict-> scan.
        midx = jax.lax.axis_index("model")
        g_max = jax.lax.pmax(g, "model")
        tied = g == g_max
        widx = jax.lax.pmin(jnp.where(tied, midx, m), "model")
        winner = tied & (midx == widx)
        pick = lambda v: jax.lax.psum(
            jnp.where(winner.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0),
            "model",
        ) / jax.lax.psum(
            winner.astype(jnp.float32).reshape((-1,) + (1,) * (v.ndim - 1)),
            "model",
        )
        return pick(g), pick(params), pick(lcounts), pick(rcounts)

    return fn(
        depth, labels, nodes, props, active_nodes, parent_counts,
        best_gain, best_params, best_left, best_right,
    )
