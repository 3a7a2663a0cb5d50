"""Device-side dataset decompression (reference: nvcomp-backed compressed
blocks, src/compressed_blocks.py:16,30,106,158).

The reference decompresses training blocks ON the GPU with nvcomp so the
PCIe/host side only ever carries compressed bytes.  The TPU-native
equivalent here is an nvcomp-Cascaded-style run-length scheme whose DECODER
is a jitted XLA program: the host ships (values, run-lengths) padded to a
fixed budget, and the device reconstructs the dense block with a
cumsum + searchsorted gather — no host-side inflate, and the h2d transfer
(and the axon client's staging retention, see ROADMAP §4) shrinks by the
compression ratio.

Depth/label training images are stencil-dominated (large zero runs, smooth
surfaces), so plain RLE reaches 5-40x on the flagship datagen blocks; blocks
whose run count exceeds the budget fall back to raw (flagged per block).

Encode: :func:`rle_encode` (host, numpy).  Decode: :func:`rle_decode`
(jit; call with the arrays already on device).  Self-describing container
for a whole dataset: :class:`DeviceCodecBlocks`.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np


def _rle_host(flat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(values, run_lengths) of a 1-D array; run lengths capped at 2**31-1."""
    n = flat.shape[0]
    if n == 0:
        return flat[:0], np.zeros(0, np.int32)
    edges = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    starts = np.concatenate([[0], edges])
    lengths = np.diff(np.concatenate([starts, [n]]))
    return flat[starts], lengths.astype(np.int32)


def rle_encode(arr: np.ndarray, budget: int):
    """Encode ``arr`` into fixed-shape RLE buffers.

    Returns (values (budget,), lengths (budget,) int32, n_runs, raw):
    ``raw=True`` means the block did not fit the budget — values/lengths
    then hold the raw flat data split across both buffers is NOT attempted;
    the caller ships the raw array instead (see DeviceCodecBlocks)."""
    flat = np.ascontiguousarray(arr).reshape(-1)
    vals, lens = _rle_host(flat)
    if len(vals) > budget:
        return None, None, len(vals), True
    v = np.zeros(budget, arr.dtype)
    l = np.zeros(budget, np.int32)
    v[: len(vals)] = vals
    l[: len(lens)] = lens
    return v, l, len(vals), False


@functools.partial(jax.jit, static_argnames=("n", "shape", "dtype"))
def rle_decode(values, lengths, *, n: int, shape, dtype):
    """Reconstruct the dense block ON DEVICE from RLE buffers.

    out[i] = values[j] where j is the run covering position i: runs' end
    offsets are an inclusive cumsum of lengths (padded runs have length 0
    and never cover anything); position -> run is one vectorized
    searchsorted over the sorted ends."""
    import jax.numpy as jnp

    ends = jnp.cumsum(lengths)  # (budget,) inclusive end offsets
    pos = jnp.arange(n, dtype=jnp.int32)
    run = jnp.searchsorted(ends, pos, side="right").astype(jnp.int32)
    out = values[jnp.clip(run, 0, values.shape[0] - 1)]
    return out.reshape(shape).astype(dtype)


def _encode_one(arr: np.ndarray, cap: int):
    """(vals, lens|None, raw): power-of-two-bucketed RLE buffers, or the
    raw array when the run count exceeds ``cap``."""
    flat = np.ascontiguousarray(arr).reshape(-1)
    vals, lens = _rle_host(flat)
    nruns = len(vals)
    if nruns > cap:
        return np.ascontiguousarray(arr), None, True
    budget = 16
    while budget < nruns:
        budget *= 2
    v = np.zeros(budget, arr.dtype)
    l = np.zeros(budget, np.int32)
    v[:nruns] = vals
    l[:nruns] = lens
    return v, l, False


class DeviceCodecDynamic:
    """Rewritable per-block RLE store with device-side decode — the codec
    counterpart of blocks.CompressedBlocksDynamic (per-level node-state
    recompression) whose get_block lands decoded ON DEVICE with only the
    compressed buffers crossing h2d."""

    def __init__(self, num_blocks: int, shape, dtype,
                 budget_frac: float = 0.25):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.n = int(np.prod(self.shape))
        self.cap = max(16, int(self.n * budget_frac))
        self._vals = [None] * num_blocks
        self._lens = [None] * num_blocks
        self._raw = [False] * num_blocks

    def write_block(self, i: int, arr: np.ndarray):
        assert tuple(arr.shape) == self.shape
        v, l, raw = _encode_one(arr.astype(self.dtype, copy=False), self.cap)
        self._vals[i], self._lens[i], self._raw[i] = v, l, raw

    def get_block(self, i: int):
        import jax.numpy as jnp

        if self._raw[i]:
            return jnp.asarray(self._vals[i])
        return rle_decode(
            jnp.asarray(self._vals[i]), jnp.asarray(self._lens[i]),
            n=self.n, shape=self.shape, dtype=str(self.dtype),
        )

    def compressed_bytes(self) -> int:
        tot = 0
        for v, l in zip(self._vals, self._lens):
            if v is not None:
                tot += v.nbytes + (l.nbytes if l is not None else 0)
        return tot

    def raw_bytes(self) -> int:
        return sum(
            self.n * self.dtype.itemsize
            for v in self._vals if v is not None
        )

    def compression_ratio(self) -> float:
        return self.raw_bytes() / max(1, self.compressed_bytes())


class DeviceCodecBlocks:
    """Per-block RLE store with device-side decode and raw fallback.

    Mirrors blocks.CompressedBlocksStatic's get_block contract but returns
    a DEVICE array decoded on-chip; the host->device transfer per use is
    the compressed buffers only."""

    def __init__(self, blocks, budget_frac: float = 0.25):
        """``blocks``: iterable of same-shape numpy arrays.  Each block's
        buffers are sized to the next power of two above its run count
        (few distinct decode-program shapes, near-tight storage); blocks
        needing more than ``budget_frac`` of the dense element count in
        runs ship raw (RLE would not pay)."""
        self._vals = []
        self._lens = []
        self._raw = []
        self.shape = None
        for b in blocks:  # one block at a time: only encoded buffers live
            if self.shape is None:
                self.shape = b.shape
                self.dtype = b.dtype
                self.n = int(np.prod(self.shape))
                cap = max(16, int(self.n * budget_frac))
            assert b.shape == self.shape and b.dtype == self.dtype
            v, l, raw = _encode_one(b, cap)
            self._vals.append(v)
            self._lens.append(l)
            self._raw.append(raw)
        assert self._vals, "empty block list"

    def __len__(self):
        return len(self._vals)

    def get_block(self, i: int):
        """Decode block i on the current default device; returns jax array."""
        import jax.numpy as jnp

        if self._raw[i]:
            return jnp.asarray(self._vals[i])
        return rle_decode(
            jnp.asarray(self._vals[i]), jnp.asarray(self._lens[i]),
            n=self.n, shape=self.shape, dtype=str(self.dtype),
        )

    def compressed_bytes(self) -> int:
        tot = 0
        for v, l, raw in zip(self._vals, self._lens, self._raw):
            tot += v.nbytes + (l.nbytes if l is not None else 0)
        return tot

    def raw_bytes(self) -> int:
        return sum(
            int(np.prod(self.shape)) * self.dtype.itemsize
            for _ in self._vals
        )

    def compression_ratio(self) -> float:
        return self.raw_bytes() / max(1, self.compressed_bytes())
