"""Measured costs of the candidate serving primitives — the data behind the
round-5 roofline verdict (ROADMAP).  Each pattern runs inside a real Mosaic
kernel on the chip, amortized over a big grid, reported as ns per unit:

* shuf_dep / shuf_indep: dependent-chain vs independent lane shuffles — is
  take_along_axis latency (13 ns) or throughput (~1 ns) bound when serves
  are parallel?  Decides how much rectangle serving (RSPAN/WSPAN) costs.
* serve_trip[S]: one FULL batched-sweep trip for 8 probes serving S cells
  each — per-probe axis-0 min, one batched cross-lane reduce, scratch
  round-trip, scalar read-back, dynamic window load + roll + S shuffles +
  selects, rem update, while-loop carry.  The marginal cost of S and the
  fixed trip cost are THE two numbers the serving-cost model rests on.
* mm_f32 / mm_f32_hi / mm_bf16: (8,128)x(128,128) matmul at each precision
  (HIGHEST = the exact-selection one-hot path); mm_wide = (16,128)x(128,512).
* onehot: building a (128, 512) lane-index one-hot from an (8,128) index
  vreg (the per-(tile,probe) cost of any MXU gather formulation).
* scratch_rt: vector->VMEM scratch->scalar read-back round-trip alone.

Run ON THE CHIP: python scripts/prim_bench.py [iters]
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from beats3d_tpu.utils import enable_compilation_cache  # noqa: E402

SUB, LANE = 8, 128
NTILE = 256
PLANE_ROWS = 64


def make_kernel(op, k):
    def kernel(x_ref, i_ref, p_ref, o_ref, scratch):
        x = x_ref[0]
        idx = i_ref[0]
        acc = x

        if op == "shuf_dep":
            for _ in range(k):
                acc = jnp.take_along_axis(acc & 127, idx, axis=1)
        elif op == "shuf_indep":
            # k independent shuffles of DIFFERENT sources, one dependent
            # merge at the end: measures shuffle THROUGHPUT
            srcs = [x + i for i in range(k)]
            outs = [jnp.take_along_axis(s, idx, axis=1) for s in srcs]
            for o in outs:
                acc = acc + o
        elif op == "roll_indep":
            srcs = [x + i for i in range(k)]
            outs = [pltpu.roll(s, 1 + (i % 7), 0)
                    for i, s in enumerate(srcs)]
            for o in outs:
                acc = acc + o
        elif op == "scratch_rt":
            for i in range(k):
                row = jnp.min(acc, axis=1, keepdims=True)  # (8,1)
                scratch[0:SUB, 0:1] = row
                s0 = scratch[0, 0]
                acc = acc + s0
        elif op.startswith("serve_trip"):
            S = int(op.rsplit("_", 1)[1])
            plane = p_ref[0]
            nP = 8
            big = jnp.int32(1 << 29)
            rems = [
                (acc + 131 * p) % 997 for p in range(nP)
            ]
            accs = [jnp.zeros((SUB, LANE), jnp.int32) for _ in range(nP)]

            def batched_mins(rl):
                rows = [jnp.min(r, axis=0, keepdims=True) for r in rl]
                m8 = jnp.concatenate(rows, axis=0)
                scratch[0:SUB, 0:1] = jnp.min(m8, axis=1, keepdims=True)
                scal = [scratch[j, 0] for j in range(nP)]
                g = scal[0]
                for s in scal[1:]:
                    g = jnp.minimum(g, s)
                return scal, g

            ms0, g0 = batched_mins(rems)

            def cond(c):
                return c[0] < k  # fixed trip count = k for timing

            def body(c):
                trip = c[0]
                ms = list(c[1 : 1 + nP])
                rems_l = list(c[1 + nP : 1 + 2 * nP])
                accs_l = list(c[1 + 2 * nP :])
                new_rems = []
                for p in range(nP):
                    m = ms[p]
                    q = jnp.clip(m // 4, 0, PLANE_ROWS - 24)
                    q_al = pl.multiple_of((q // SUB) * SUB, SUB)
                    blk = plane[pl.ds(q_al, 3 * SUB), :]
                    rolled = pltpu.roll(blk, -(q - q_al), 0)
                    rem = rems_l[p]
                    for d in range(S):
                        win = (
                            rolled[0:SUB] if d == 0
                            else pltpu.roll(rolled, 3 * SUB - d, 0)[0:SUB]
                        )
                        v = jnp.take_along_axis(win, idx, axis=1)
                        hit = (rem == m + d) & (m < big)
                        accs_l[p] = jnp.where(hit, v, accs_l[p])
                        rem = jnp.where(hit, big, rem)
                    new_rems.append(rem + 1)  # keep rems alive/changing
                ms_n, _ = batched_mins(new_rems)
                return (
                    (trip + 1,) + tuple(ms_n) + tuple(new_rems)
                    + tuple(accs_l)
                )

            out = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0),) + tuple(ms0) + tuple(rems) + tuple(accs),
            )
            for a in out[1 + 2 * nP :]:
                acc = acc + a
        elif op.startswith("mm_"):
            a8 = (x & 7).astype(
                jnp.bfloat16 if op == "mm_bf16" else jnp.float32
            )
            b = p_ref[0][0:LANE, :].astype(a8.dtype)
            prec = (
                jax.lax.Precision.HIGHEST if op.endswith("_hi")
                else jax.lax.Precision.DEFAULT
            )
            accf = a8[:, 0:LANE] * 1.0
            for _ in range(k):
                accf = jax.lax.dot(
                    accf, b[0:LANE, 0:LANE], precision=prec,
                    preferred_element_type=accf.dtype,
                ) * 1e-3
            acc = acc + accf[:, 0:LANE].astype(jnp.int32)
        elif op == "onehot":
            # (128, 512) one-hot of a 512-px index block, built per k
            flat = acc.reshape(1, SUB * LANE) & 127
            ii = jax.lax.broadcasted_iota(
                jnp.int32, (LANE, SUB * LANE // 2), 0
            )
            for i in range(k):
                oh = (
                    jnp.broadcast_to(
                        flat[:, 0 : SUB * LANE // 2] + i, ii.shape
                    ) == ii
                ).astype(jnp.float32)
                acc = acc + jnp.sum(oh, axis=0, keepdims=True).astype(
                    jnp.int32
                )[0:1, 0:LANE]
        o_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("op", "k"))
def run(x, idx, plane, *, op, k):
    return pl.pallas_call(
        make_kernel(op, k),
        grid=(x.shape[0],),
        in_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (1, PLANE_ROWS + 2 * SUB, LANE), lambda i: (i % 4, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((SUB, 64), jnp.int32)],
    )(x, idx, plane)


def timeit(f, iters):
    o = f()
    np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 100, (NTILE, SUB, LANE)).astype(np.int32)
    )
    idx = jnp.asarray(
        rng.integers(0, LANE, (NTILE, SUB, LANE)).astype(np.int32)
    )
    plane = jnp.asarray(
        rng.integers(0, 60000, (4, PLANE_ROWS + 2 * SUB, LANE)).astype(
            np.int32
        )
    )

    def per_unit(op, k1, k2, unit_count=1):
        t1 = timeit(lambda: run(x, idx, plane, op=op, k=k1), iters)
        t2 = timeit(lambda: run(x, idx, plane, op=op, k=k2), iters)
        per_k = (t2 - t1) / (k2 - k1) / NTILE * 1e6  # ns per k per tile
        return per_k / unit_count, t1, t2

    print(f"{'pattern':16s} {'ns/unit':>9s}  (ms at k1 / k2)")
    for op, k1, k2, ucount, label in [
        ("shuf_dep", 8, 40, 1, "dependent shuffle"),
        ("shuf_indep", 8, 40, 1, "independent shuffle"),
        ("roll_indep", 8, 40, 1, "independent roll"),
        ("scratch_rt", 2, 10, 1, "scratch round-trip"),
        ("serve_trip_1", 3, 12, 1, "full trip, 1 cell/probe"),
        ("serve_trip_2", 3, 12, 1, "full trip, 2 cells/probe"),
        ("serve_trip_4", 3, 12, 1, "full trip, 4 cells/probe"),
        ("serve_trip_8", 3, 12, 1, "full trip, 8 cells/probe"),
        ("mm_f32", 2, 10, 1, "(8,128)x(128,128) f32 dflt"),
        ("mm_f32_hi", 2, 10, 1, "(8,128)x(128,128) f32 HIGHEST"),
        ("mm_bf16", 2, 10, 1, "(8,128)x(128,128) bf16"),
        ("onehot", 2, 10, 1, "(128,512) one-hot build"),
    ]:
        try:
            ns, t1, t2 = per_unit(op, k1, k2, ucount)
            print(f"{op:16s} {ns:9.1f}  ({t1:.2f} / {t2:.2f})  {label}")
        except Exception as e:  # noqa: BLE001
            print(f"{op:16s}      FAIL  {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
