"""Does Mosaic support take_along_axis(axis=0) (sublane gather) on TPU?
And how fast vs the 8-step compare-select emulation?"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

SUB, LANE, NT = 8, 128, 64


def make_kernel(mode, reps):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[0]
        idx = idx_ref[0] % SUB
        acc = jnp.zeros((SUB, LANE), jnp.int32)
        for rep in range(reps):
            xv = x + rep
            if mode == "axis0":
                acc = acc + jnp.take_along_axis(xv, idx, axis=0)
            elif mode == "emul8":
                v = jnp.zeros((SUB, LANE), jnp.int32)
                for r in range(SUB):
                    row = jnp.broadcast_to(xv[r : r + 1], (SUB, LANE))
                    v = jnp.where(idx == r, row, v)
                acc = acc + v
            elif mode == "axis1":
                acc = acc + jnp.take_along_axis(xv, idx, axis=1)
        o_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x, idx, *, mode, reps):
    return pl.pallas_call(
        make_kernel(mode, reps),
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, idx)


def timeit(f, iters=50):
    o = f(); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, (NT, SUB, LANE)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, SUB, (NT, SUB, LANE)).astype(np.int32))
    ref = None
    for mode in ("emul8", "axis0", "axis1"):
        try:
            r = np.asarray(run(x, idx, mode=mode, reps=2))
            t1 = timeit(lambda: run(x, idx, mode=mode, reps=2))
            t2 = timeit(lambda: run(x, idx, mode=mode, reps=34))
            per = (t2 - t1) / 32 / NT * 1e6
            match = ""
            if mode == "emul8":
                ref = r
            elif mode == "axis0" and ref is not None:
                match = "  MATCHES emul8" if np.array_equal(r, ref) else "  MISMATCH"
            print(f"{mode:6s}: {per:8.1f} ns/op/tile (r2 {t1:.3f}, r34 {t2:.3f}){match}")
        except Exception as e:
            print(f"{mode:6s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
