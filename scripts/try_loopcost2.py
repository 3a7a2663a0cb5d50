"""Micro: dynamic-loop cost vs number of vreg carries; div cost; nested 0/1."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SUB, LANE = 8, 128
NT = 64


def make_kernel(mode, n_loops, n_carries):
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        t = jnp.minimum(jnp.max(x) * 0 + 1, 1)  # dynamic 1
        carries = tuple(x + i for i in range(n_carries))
        if mode == "flat":
            for _ in range(n_loops):
                carries = jax.lax.fori_loop(
                    0, t, lambda _, cs: tuple(c + 1 for c in cs), carries)
        elif mode == "nested":
            for _ in range(n_loops):
                def outer(_, cs):
                    return jax.lax.fori_loop(
                        0, t, lambda __, cs2: tuple(c + 1 for c in cs2), cs)
                carries = jax.lax.fori_loop(0, t, outer, carries)
        elif mode == "noloop":
            for _ in range(n_loops):
                carries = tuple(c + 1 for c in carries)
        elif mode == "div":
            f = x.astype(jnp.float32) + 3.0
            a = [f + i for i in range(4)]
            for _ in range(n_loops):
                a = [jnp.floor((v + 1.0) / f) for v in a]
            carries = tuple(v.astype(jnp.int32) for v in a) + carries[4:]
        acc = carries[0]
        for c in carries[1:]:
            acc = acc + (c if acc.dtype == c.dtype else c.astype(acc.dtype))
        o_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "n_loops", "n_carries"))
def run(x, *, mode, n_loops, n_carries):
    return pl.pallas_call(
        make_kernel(mode, n_loops, n_carries),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def timeit(f, iters=50):
    o = f(); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    x = jnp.zeros((NT, SUB, LANE), jnp.int32)
    for mode, carries in (("noloop", 8), ("flat", 1), ("flat", 4), ("flat", 8),
                          ("flat", 16), ("nested", 8), ("div", 8)):
        t1 = timeit(lambda: run(x, mode=mode, n_loops=8, n_carries=carries))
        t2 = timeit(lambda: run(x, mode=mode, n_loops=72, n_carries=carries))
        per = (t2 - t1) / 64 / NT * 1e3
        print(f"{mode:7s} carries={carries:2d}: {per:8.1f} ns/loop/tile "
              f"(k8 {t1:.3f}, k72 {t2:.3f})")


if __name__ == "__main__":
    main()
