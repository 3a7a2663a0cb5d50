"""Is the eval preamble (pad/split/compaction/mask) the floor at crop size?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from beats3d_tpu.ops import forest_eval_pallas as fep

SUB, LANE, MAX = fep.SUB, fep.LANE, fep.MAX_UINT16
PAD_Y, PAD_B, PAD_X = fep.PAD_Y, fep.PAD_B, fep.PAD_X


def timeit(f, iters=60):
    o = f(); np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n, h, w = 2, 256, 384
    r = 2
    hl, wl = h // r, w // r
    hl_pad = ((hl + SUB - 1) // SUB) * SUB
    wl_pad = ((wl + LANE - 1) // LANE) * LANE
    nty, ntx = hl_pad // SUB, wl_pad // LANE
    ntiles = n * nty * ntx

    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.integers(1, 3000, (n, h, w)).astype(np.uint16))

    @jax.jit
    def preamble(depth):
        di = depth.astype(jnp.int32)
        padded = jnp.pad(
            di, ((0, 0), (PAD_Y, PAD_B + 2 * SUB), (PAD_X, PAD_X + LANE)),
            constant_values=MAX)
        de = padded[:, 0::2, :]
        do = padded[:, 1::2, :]
        dc = jnp.pad(di[:, ::r, ::r],
                     ((0, 0), (0, hl_pad - hl), (0, wl_pad - wl)))
        elig = (dc != 0) & (dc != MAX)
        ta = elig.reshape(n, nty, SUB, ntx, LANE).any(axis=(2, 4))
        fa = ta.reshape(ntiles)
        tl = jnp.flatnonzero(fa, size=ntiles, fill_value=0).astype(jnp.int32)
        na = fa.sum().astype(jnp.int32)
        out = jnp.where(elig, dc, MAX)  # stand-in for the post-mask
        return de, do, dc, tl, na, out

    print(f"preamble only  : {timeit(lambda: preamble(depth)):.3f} ms")

    # u16 variant: skip the i32 conversion for planes (kernel would need u16
    # loads); measures dtype contribution
    @jax.jit
    def preamble_u16(depth):
        padded = jnp.pad(
            depth, ((0, 0), (PAD_Y, PAD_B + 2 * SUB), (PAD_X, PAD_X + LANE)),
            constant_values=np.uint16(MAX))
        de = padded[:, 0::2, :]
        do = padded[:, 1::2, :]
        return de, do

    print(f"pad+split u16  : {timeit(lambda: preamble_u16(depth)):.3f} ms")

    @jax.jit
    def pad_only(depth):
        di = depth.astype(jnp.int32)
        return jnp.pad(
            di, ((0, 0), (PAD_Y, PAD_B + 2 * SUB), (PAD_X, PAD_X + LANE)),
            constant_values=MAX)

    print(f"pad only       : {timeit(lambda: pad_only(depth)):.3f} ms")

    p = pad_only(depth)

    @jax.jit
    def split_only(p):
        return p[:, 0::2, :], p[:, 1::2, :]

    print(f"split only     : {timeit(lambda: split_only(p)):.3f} ms")

    # full eval for reference, tiny model
    def rand_forest(t, d, c):
        total = (1 << d) - 1
        arr = np.zeros((t, total, 7 + 2 * c), np.float32)
        arr[:, :, 5:7] = 0.0
        arr[:, :, 7:] = 0.5
        return arr

    tables, meta = fep.pack_tables_pallas(rand_forest(1, 2, 3))
    fn = lambda: fep.evaluate_layered_pallas(
        depth, (tables,), (meta,), fep._pack_conditions(
            np.array([[0, 1], [0, 2]], np.int32)),
        2, filter_specs=((None, -1),), labels_reduce=2,
        scale_factor=jnp.float32(1.0))
    print(f"eval T=1 D=2   : {timeit(fn):.3f} ms   (preamble + min kernel)")


if __name__ == "__main__":
    main()
