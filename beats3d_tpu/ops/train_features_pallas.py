"""Fused Pallas kernel for training-time feature evaluation — the trainer's
hot op.

The histogram step needs, for every (pixel, proposal), the split bit
``f(pixel, proposal) < thresh`` where f is the depth-difference feature
(tree_train.cu:24-60).  XLA lowers the per-pixel probe reads to a scalarized
gather (~36 ns/element), which prices a full-res 848x480 dataset out of
reach; the reference does these reads as coalesced SIMT loads.  This module
reuses the eval kernel's windowed lane-shuffle gather (ops/forest_eval_pallas
_tile_context): proposals have ONE (ux, uy, vx, vy) for the whole image, so a
tile's probe targets spread only with its depth variation.

TWO kernels, because even a never-taken dynamic fallback inside a kernel is a
Mosaic scheduling barrier (measured 20x):

* the FAST kernel serves every probe from a static window and emits packed
  split bits plus a per-tile overflow flag;
* the EXACT kernel re-runs only the flagged tiles (compacted dynamic grid,
  usually empty) with per-probe dynamic sweeps, overwriting the fast bits
  in place via io-aliasing.

Output: packed split bits, (N, ceil(P/32), H, W) int32 — bit p%32 of word
p//32 is ``f < thresh`` for proposal p.  Bits for pixels the histogram later
ignores (inactive nodes) are don't-care but still computed exactly.

Semantics match train.trainer._chunk_features bit-for-bit for every pixel:
floor(offset / center_depth) probe coordinates, OOB probes read 65535,
center depth 0 forces f = 0 (decision_tree_common.hpp:8-28).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .forest_eval_pallas import APRON_B, APRON_T, LANE, SUB, _tile_context


def _make_kernel(p_total, h, w, nty, ntx, exact):
    p32 = (p_total + 31) // 32

    def body_common(flat, props_ref, depth_ref, dc_ref, act_ref):
        ty = (flat // ntx) % nty
        tx = flat % ntx
        y_pxs, x_pxs, _, _, prims = _tile_context(
            [depth_ref], 1, h, w, [(ty, tx)]
        )
        y_px, x_px = y_pxs[0], x_pxs[0]
        gather_fast, gather_exact = prims[0], prims[1]
        d_center = dc_ref[0]
        df = d_center.astype(jnp.float32)
        safe = jnp.where(df == 0.0, 1.0, df)
        zc = df == 0.0
        act = act_ref[0] != 0

        def proposal_probes(p):
            # SMEM f32 scalar reads cost ~4 us EACH on this chip; the
            # proposal table is pre-broadcast in VMEM instead (sublane k =
            # component k, lanes replicated) so one (8,128) load + row
            # broadcasts serve all five components.
            blk = props_ref[p]
            comp = lambda k: jnp.broadcast_to(blk[k : k + 1], (SUB, LANE))
            ux, uy, vx, vy, th = (comp(k) for k in range(5))
            dux = jnp.floor(ux / safe).astype(jnp.int32)
            duy = jnp.floor(uy / safe).astype(jnp.int32)
            dvx = jnp.floor(vx / safe).astype(jnp.int32)
            dvy = jnp.floor(vy / safe).astype(jnp.int32)
            return [(y_px + duy, x_px + dux, act, 0),
                    (y_px + dvy, x_px + dvx, act, 0)], th

        words = [jnp.zeros((SUB, LANE), jnp.int32) for _ in range(p32)]
        over_any = jnp.zeros((SUB, LANE), jnp.bool_)
        for p in range(p_total):
            probes, th = proposal_probes(p)
            if exact:
                du, dv = gather_exact(probes)
            else:
                (du, dv), over, _ = gather_fast(probes)
                over_any |= over
            f = du.astype(jnp.float32) - dv.astype(jnp.float32)
            f = jnp.where(zc, 0.0, f)
            bit = (f < th).astype(jnp.int32)
            words[p // 32] = words[p // 32] | (bit << (p % 32))
        return words, over_any

    if exact:
        def kernel(idx_ref, props_ref, depth_ref, dc_ref, act_ref,
                   bits_in_ref, out_ref):
            # bits_in_ref is the io-aliased fast output (unused: this tile
            # is recomputed from scratch; unflagged tiles keep their data).
            del bits_in_ref
            flat = idx_ref[pl.program_id(0)]
            words, _ = body_common(flat, props_ref, depth_ref, dc_ref, act_ref)
            for wd in range(p32):
                out_ref[0, wd] = words[wd]
    else:
        def kernel(idx_ref, props_ref, depth_ref, dc_ref, act_ref, out_ref,
                   over_ref):
            flat = idx_ref[pl.program_id(0)]
            words, over_any = body_common(
                flat, props_ref, depth_ref, dc_ref, act_ref
            )
            for wd in range(p32):
                out_ref[0, wd] = words[wd]
            over_ref[0] = jnp.any(
                over_any, axis=0, keepdims=True
            ).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def train_feature_bits(
    depth: jnp.ndarray,
    props: jnp.ndarray,
    active=None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed split bits for every (pixel, proposal).

    depth: (N, H, W) uint16; props: (P, 5) float32 (ux, uy, vx, vy, thresh);
    active: optional (N, H, W) bool — pixels the histogram will actually use
    (node id >= 0).  Tiles with no active pixel are skipped entirely via the
    compacted dynamic grid (their bits are uninitialized don't-cares, exactly
    like the reference's eligibility early-out tree_train.cu:42), and the
    mask tightens each probe's gather window.
    Returns (N, ceil(P/32), H, W) int32.
    """
    n, h, w = depth.shape
    p_total = props.shape[0]
    p32 = (p_total + 31) // 32

    h_pad = ((h + SUB - 1) // SUB) * SUB
    w_pad = ((w + LANE - 1) // LANE) * LANE
    nty, ntx = h_pad // SUB, w_pad // LANE
    ntiles = n * nty * ntx

    di = depth.astype(jnp.int32)
    # adjacent-row packed plane with the row apron (see
    # forest_eval_pallas._prep_planes): one gather serves two image rows
    packed_rows = (((h + APRON_T - 1) // 2) // SUB) * SUB + 2 * SUB
    pad_b = packed_rows * 2 - h - APRON_T
    padded = jnp.pad(di, ((0, 0), (APRON_T, pad_b), (0, w_pad - w)))
    plane = padded[:, 0::2, :] | (padded[:, 1::2, :] << 16)
    d_center = jnp.pad(di, ((0, 0), (0, h_pad - h), (0, w_pad - w)))

    if active is None:
        act = jnp.pad(
            jnp.ones((n, h, w), jnp.int32),
            ((0, 0), (0, h_pad - h), (0, w_pad - w)),
        )
    else:
        act = jnp.pad(
            active.astype(jnp.int32), ((0, 0), (0, h_pad - h), (0, w_pad - w))
        )
    tile_act = act.reshape(n, nty, SUB, ntx, LANE).any(axis=(2, 4))
    flat_act = tile_act.reshape(ntiles)
    if interpret:
        n_active = ntiles
        tile_list = jnp.arange(ntiles, dtype=jnp.int32)
    else:
        tile_list = jnp.flatnonzero(
            flat_act, size=ntiles, fill_value=0
        ).astype(jnp.int32)
        n_active = flat_act.sum().astype(jnp.int32)

    def plane_map(i, idx):
        return (idx[i] // (nty * ntx), 0, 0)

    def tile_map(i, idx):
        f = idx[i]
        return (f // (nty * ntx), (f // ntx) % nty, f % ntx)

    def out_map(i, idx):
        f = idx[i]
        return (f // (nty * ntx), 0, (f // ntx) % nty, f % ntx)

    def over_map(i, idx):
        return (idx[i], 0, 0)

    # pre-broadcast proposal table: (P, 8, 128), sublane k = component k
    props_pad = jnp.pad(props.astype(jnp.float32), ((0, 0), (0, 8 - 5)))
    props_vmem = jnp.broadcast_to(props_pad[:, :, None], (p_total, 8, LANE))

    fast = pl.pallas_call(
        _make_kernel(p_total, h, w, nty, ntx, exact=False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_active,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1,) + plane.shape[1:], plane_map,
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, SUB, LANE), tile_map, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, SUB, LANE), tile_map, memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, p32, SUB, LANE), out_map, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, LANE), over_map, memory_space=pltpu.VMEM
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, p32, h_pad, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, 1, LANE), jnp.int32),
        ],
        interpret=interpret,
    )
    bits, over_tiles = fast(tile_list, props_vmem, plane, d_center, act)

    # Exact pass over overflowing tiles only (usually none).  Unvisited
    # over rows are uninitialized; mask by the visited tiles.
    over_flag = (over_tiles.reshape(ntiles, LANE).sum(axis=1) > 0) & flat_act
    if interpret:
        n_over = ntiles
        over_list = jnp.arange(ntiles, dtype=jnp.int32)
    else:
        over_list = jnp.flatnonzero(
            over_flag, size=ntiles, fill_value=0
        ).astype(jnp.int32)
        n_over = over_flag.sum().astype(jnp.int32)

    exact = pl.pallas_call(
        _make_kernel(p_total, h, w, nty, ntx, exact=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_over,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1,) + plane.shape[1:], plane_map,
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, SUB, LANE), tile_map, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, SUB, LANE), tile_map, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, p32, SUB, LANE), out_map, memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, p32, SUB, LANE), out_map, memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n, p32, h_pad, w_pad), jnp.int32),
        input_output_aliases={5: 0},
        interpret=interpret,
    )
    bits = exact(over_list, props_vmem, plane, d_center, act, bits)
    return bits[:, :, :h, :w]
