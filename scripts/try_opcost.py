"""Per-op cost of kernel atoms on (8,128) vregs inside a Mosaic kernel."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
NTILE = 64


def make_kernel(op, k):
    def kernel(x_ref, i_ref, o_ref):
        x = x_ref[0]
        idx = i_ref[0]
        acc = x
        if op == "gather":
            for _ in range(k):
                acc = jnp.take_along_axis(acc & 127, idx, axis=1)
        elif op == "gather_same":
            g = idx
            for _ in range(k):
                v = jnp.take_along_axis(x, g, axis=1)
                acc = acc + v
        elif op == "where":
            m = x > 5
            for _ in range(k):
                acc = jnp.where(m, acc + 1, acc)
        elif op == "fmath":
            f = x.astype(jnp.float32) + 2.0
            a = f
            for _ in range(k):
                a = jnp.floor(1.5 * a / (f + 3.0))
            acc = a.astype(jnp.int32)
        elif op == "any":
            for _ in range(k):
                t = jnp.any(acc > 0).astype(jnp.int32)
                acc = acc + t
        elif op == "minmax":
            for _ in range(k):
                t = jnp.min(acc) + jnp.max(acc)
                acc = acc + t
        elif op == "roll":
            for _ in range(k):
                acc = pltpu.roll(acc, 1, 0)
        elif op == "bcast_row":
            for _ in range(k):
                row = acc[0:1]
                acc = acc + jnp.broadcast_to(row, (SUB, LANE))
        o_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("op", "k"))
def run(x, idx, *, op, k):
    return pl.pallas_call(
        make_kernel(op, k),
        grid=(x.shape[0],),
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
    x = jnp.asarray(rng.integers(0, 100, (NTILE, SUB, LANE)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, LANE, (NTILE, SUB, LANE)).astype(np.int32))
    for op in ("gather", "gather_same", "where", "fmath", "any", "minmax",
               "roll", "bcast_row"):
        t1 = timeit(lambda: run(x, idx, op=op, k=8))
        t2 = timeit(lambda: run(x, idx, op=op, k=264))
        per = (t2 - t1) / (264 - 8) / NTILE * 1e6  # ns per op per tile
        print(f"{op:12s}: {per:8.1f} ns/op/tile   (k8 {t1:.3f} ms, k264 {t2:.3f} ms)")


if __name__ == "__main__":
    main()
