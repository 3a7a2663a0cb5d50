"""Can we replace N full min-reduces (scalar window bases) with axis-mins +
one cross-lane reduce + scalar extraction from a VMEM scratch ref?

Variants:
  a) baseline: 16 jnp.min full reduces -> 16 scalars
  b) batched: per-array axis-0 min (vector), stack rows -> (8,128), one
     axis-1 min -> (8,1), write to VMEM scratch, read back 16 scalars
  c) smem: same but scatter the (8,1) through an SMEM scratch
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

SUB, LANE = 8, 128
NT = 64
NPROBE = 8  # arrays needing (rowmin, chunkmin) -> 16 scalars


def make_kernel(mode, reps):
    def kernel(x_ref, o_ref, *scratch):
        acc = x_ref[0]
        arrs = [acc + i for i in range(NPROBE)]
        for rep in range(reps):
            if mode == "base":
                mins = [jnp.min(a + rep) for a in arrs]
                mins += [jnp.min(a + rep + 1) for a in arrs]
            elif mode == "batched":
                vs = scratch[0]
                rows = [jnp.min(a + rep, axis=0, keepdims=True) for a in arrs]
                rows += [jnp.min(a + rep + 1, axis=0, keepdims=True) for a in arrs]
                m8a = jnp.concatenate(rows[:8], axis=0)       # (8,128)
                m8b = jnp.concatenate(rows[8:], axis=0)
                va = jnp.min(m8a, axis=1, keepdims=True)       # (8,1)
                vb = jnp.min(m8b, axis=1, keepdims=True)
                vs[0:SUB, 0:1] = va
                vs[0:SUB, 1:2] = vb
                mins = [vs[i, 0] for i in range(8)] + [vs[i, 1] for i in range(8)]
            # use the scalars so nothing is DCE'd
            s = mins[0]
            for m in mins[1:]:
                s = s + m
            acc = acc + s
        o_ref[0] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "reps"))
def run(x, *, mode, reps):
    scratch = [pltpu.VMEM((SUB, LANE), jnp.int32)]
    return pl.pallas_call(
        make_kernel(mode, reps),
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=scratch,
    )(x)


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
    for mode in ("base", "batched"):
        try:
            r1 = run(x, mode=mode, reps=2)
            r8 = run(x, mode=mode, reps=18)
            ok = np.asarray(r1).sum()
            t1 = timeit(lambda: run(x, mode=mode, reps=2))
            t2 = timeit(lambda: run(x, mode=mode, reps=18))
            per = (t2 - t1) / 16 / NT * 1e6
            print(f"{mode:8s}: {per:8.1f} ns/rep/tile (r2 {t1:.3f} ms, r18 {t2:.3f} ms) chk {ok}")
        except Exception as e:
            print(f"{mode:8s}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
