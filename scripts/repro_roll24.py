"""On-chip repro for the RSPAN mismatch: is a STATIC sublane roll of a
(24, 128) block by nload-d (e.g. 23) lowered correctly by Mosaic?

Builds a (24, 128) block whose value encodes its row, applies the exact
rect-serving index chain (dynamic roll by -off, then static roll by
nload - d, slice [0:8]) for every (off, d) combination, and checks rows
against the expected q + d + i — on the REAL chip, where interpret mode
can't see a lowering bug.

Run: python scripts/repro_roll24.py
"""
import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from beats3d_tpu.utils import enable_compilation_cache  # noqa: E402

SUB, LANE = 8, 128
NLOAD = 24


def make_kernel(d):
    def kernel(x_ref, off_ref, o_ref):
        blk = x_ref[:]
        off = off_ref[0, 0]
        rolled = pltpu.roll(blk, -off, 0)
        if d == 0:
            win = rolled[0:SUB]
        else:
            win = pltpu.roll(rolled, NLOAD - d, 0)[0:SUB]
        o_ref[:] = win

    return kernel


@functools.partial(jax.jit, static_argnames=("d",))
def run(x, off, *, d):
    return pl.pallas_call(
        make_kernel(d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
    )(x, off)


def main():
    enable_compilation_cache()
    x = jnp.asarray(
        np.arange(NLOAD, dtype=np.int32)[:, None]
        * np.ones((1, LANE), np.int32)
    )
    bad = 0
    for d in (0, 1, 2, 3, 7):
        for off in range(SUB):
            got = np.asarray(
                run(x, jnp.full((1, 1), off, jnp.int32), d=d)
            )
            want = (np.arange(SUB) + off + d)[:, None] % NLOAD * np.ones(
                (1, LANE), np.int32
            )
            if not (got == want).all():
                bad += 1
                print(f"MISMATCH d={d} off={off}: rows "
                      f"{got[:, 0].tolist()} want {want[:, 0].tolist()}")
    print("OK: static roll24 chain exact on chip" if bad == 0
          else f"{bad} mismatching (d, off) combos")


if __name__ == "__main__":
    main()
