"""Probe: dynamic grid size + scalar-prefetch tile list on Mosaic (jax 0.9)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128


def kernel(idx_ref, x_ref, o_ref):
    o_ref[0] = x_ref[0] * 2 + 1


@functools.partial(jax.jit, static_argnames=("max_tiles",))
def run(x, tile_list, n_active, *, max_tiles):
    # x: (T, SUB, LANE) tiles; tile_list: (max_tiles,) i32 tile ids
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_active,),
        in_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda i, idx: (idx[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i, idx: (idx[i], 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={1: 0},
    )(tile_list, x)


def main():
    T = 240
    x = jnp.arange(T * SUB * LANE, dtype=jnp.int32).reshape(T, SUB, LANE)
    tl = np.zeros((T,), np.int32)
    active = [3, 7, 100, 239]
    tl[: len(active)] = active
    tl = jnp.asarray(tl)

    out = run(x, tl, jnp.int32(len(active)), max_tiles=T)
    out = np.asarray(out)
    xs = np.arange(T * SUB * LANE, dtype=np.int32).reshape(T, SUB, LANE)
    for t in range(T):
        want = xs[t] * 2 + 1 if t in active else xs[t]
        assert np.array_equal(out[t], want), f"tile {t} mismatch"
    print("dynamic grid + prefetch + io-alias: OK")

    # timing: full vs 4-active
    def bench(n):
        na = jnp.int32(n)
        run(x, tl, na, max_tiles=T)
        t0 = time.perf_counter()
        for _ in range(50):
            o = run(x, tl, na, max_tiles=T)
        np.asarray(o)
        return (time.perf_counter() - t0) / 50 * 1e3

    print(f"240 steps: {bench(240):.3f} ms ; 4 steps: {bench(4):.3f} ms")


if __name__ == "__main__":
    main()
