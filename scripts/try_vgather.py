"""Micro-test: does Mosaic lower take_along_axis(axis=0) (sublane gather)
on (8,128) / (16,128) blocks, and how fast is it vs the roll-candidate
enumeration the exact sweep uses today?
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


def k_vgather(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)


def k_vgather16(x_ref, idx_ref, o_ref):
    x = x_ref[...]  # (16,128)
    idx = idx_ref[...]  # (8,128) values in [0,16)
    lo = jnp.take_along_axis(x[0:SUB], idx % SUB, axis=0)
    hi = jnp.take_along_axis(x[SUB:], idx % SUB, axis=0)
    o_ref[...] = jnp.where(idx < SUB, lo, hi)


def k_rolls(x_ref, idx_ref, o_ref):
    # reference approach: enumerate 8 roll candidates + select
    x = x_ref[...]
    idx = idx_ref[...]
    acc = jnp.zeros((SUB, LANE), jnp.int32)
    for k in range(SUB):
        cand = pltpu.roll(x, (SUB - k) % SUB, 0)
        acc = jnp.where(idx == k + jax.lax.broadcasted_iota(
            jnp.int32, (SUB, LANE), 0), cand, acc)
    o_ref[...] = acc


def run(kernel, x, idx, reps):
    def body(x, idx):
        def k(x_ref, idx_ref, o_ref):
            v = x_ref[...]
            o = jnp.zeros((SUB, LANE), jnp.int32)
            for _ in range(reps):
                if kernel == "v8":
                    o = o + jnp.take_along_axis(v, idx_ref[...] ^ o % 2, axis=0)
                elif kernel == "roll":
                    idxv = idx_ref[...] ^ o % 2
                    acc = jnp.zeros((SUB, LANE), jnp.int32)
                    for k2 in range(SUB):
                        cand = pltpu.roll(v, (SUB - k2) % SUB, 0)
                        acc = jnp.where(idxv == k2, cand, acc)
                    o = o + acc
                elif kernel == "h":
                    o = o + jnp.take_along_axis(v, idx_ref[...] ^ o % 2, axis=1)
            o_ref[...] = o
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
        )(x, idx)
    f = jax.jit(body)
    o = f(x, idx)
    np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(50):
        o = f(x, idx)
    np.asarray(o)
    return (time.perf_counter() - t0) / 50 / reps * 1e9


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1000, (SUB, LANE)), jnp.int32)
    idx8 = jnp.asarray(rng.integers(0, SUB, (SUB, LANE)), jnp.int32)

    # correctness first
    out = pl.pallas_call(
        k_vgather, out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32)
    )(x, idx8)
    want = np.take_along_axis(np.asarray(x), np.asarray(idx8), axis=0)
    print("vgather8 correct:", bool((np.asarray(out) == want).all()))

    x16 = jnp.asarray(rng.integers(0, 1000, (2 * SUB, LANE)), jnp.int32)
    idx16 = jnp.asarray(rng.integers(0, 2 * SUB, (SUB, LANE)), jnp.int32)
    out16 = pl.pallas_call(
        k_vgather16, out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32)
    )(x16, idx16)
    want16 = np.take_along_axis(
        np.asarray(x16), np.asarray(idx16), axis=0)[:SUB]
    # note: numpy take_along_axis needs idx shape match; emulate manually
    xa, ia = np.asarray(x16), np.asarray(idx16)
    want16 = np.empty((SUB, LANE), np.int32)
    for s in range(SUB):
        for l in range(LANE):
            want16[s, l] = xa[ia[s, l], l]
    print("vgather16 correct:", bool((np.asarray(out16) == want16).all()))

    for name in ("v8", "roll", "h"):
        ns = run(name, x, idx8, 64)
        print(f"{name}: {ns:.1f} ns/op")


if __name__ == "__main__":
    main()
