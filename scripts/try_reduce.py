"""Do independent vector->scalar reduces pipeline? And what does a dynamic
loop bound really cost vs static, holding the body constant?"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SUB, LANE = 8, 128
NT = 256


def make_kernel(mode, k):
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        acc = x
        if mode == "indep_reduce":
            # k independent reduces; their scalar results only used at the end
            tot = 0
            for i in range(k):
                tot = tot + jnp.min(x + i)
            acc = x + tot
        elif mode == "serial_reduce":
            s = 0
            for i in range(k):
                s = jnp.min(x + s)
            acc = x + s
        elif mode == "static_loop":
            for i in range(k):
                acc = jax.lax.fori_loop(0, 4, lambda _, a: a + 1, acc,
                                        unroll=True)
        elif mode == "dyn_loop":
            lo = jnp.min(x) * 0  # dynamic 0
            for i in range(k):
                acc = jax.lax.fori_loop(lo, lo + 4, lambda _, a: a + 1, acc)
        elif mode == "dyn_loop_1red":
            for i in range(k):
                lo = jnp.min(acc) * 0
                acc = jax.lax.fori_loop(lo, lo + 4, lambda _, a: a + 1, acc)
        o_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "k"))
def run(x, *, mode, k):
    return pl.pallas_call(
        make_kernel(mode, k),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def timeit(f, iters=30):
    o = f(); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, (NT, SUB, LANE)).astype(np.int32))
    for mode in ("indep_reduce", "serial_reduce", "static_loop", "dyn_loop",
                 "dyn_loop_1red"):
        t1 = timeit(lambda: run(x, mode=mode, k=2))
        t2 = timeit(lambda: run(x, mode=mode, k=34))
        per = (t2 - t1) / 32 / NT * 1e3
        print(f"{mode:14s}: {per:7.1f} ns/unit/tile (k2 {t1:.3f}, k34 {t2:.3f})")


if __name__ == "__main__":
    main()
