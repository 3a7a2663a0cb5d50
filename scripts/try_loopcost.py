"""Micro: fixed cost of a dynamic-trip-count scf loop in Mosaic."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128


def make_kernel(n_loops, trips_from_data):
    def kernel(x_ref, o_ref):
        acc = x_ref[0]
        # dynamic (data-dependent) trip count: 1
        t = jnp.minimum(jnp.max(acc) * 0 + 1, 1)
        for i in range(n_loops):
            if trips_from_data:
                acc = jax.lax.fori_loop(0, t, lambda _, a: a + 1, acc)
            else:
                acc = acc + 1
        o_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("n_loops", "dyn"))
def run(x, *, n_loops, dyn):
    k = make_kernel(n_loops, dyn)
    return pl.pallas_call(
        k,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def timeit(f, iters=50):
    o = f()
    np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    x = jnp.zeros((64, SUB, LANE), jnp.int32)
    for dyn in (False, True):
        for n in (1, 16, 64, 256):
            t = timeit(lambda: run(x, n_loops=n, dyn=dyn))
            print(f"dyn={dyn} n_loops={n:4d}: {t:7.3f} ms "
                  f"({t/64/n*1e3:7.2f} us/tile/loop)")


if __name__ == "__main__":
    main()
