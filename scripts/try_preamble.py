"""Micro-bench the layered-eval XLA preamble pieces on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

MAX = 65535
PAD_Y, PAD_B, PAD_X, LANE, SUB = 48, 64, 128, 128, 8


def timeit(f, *a, iters=50):
    o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n, h, w = 2, 480, 848
    r = 2
    hl, wl = h // r, w // r
    hl_pad = ((hl + SUB - 1) // SUB) * SUB
    wl_pad = ((wl + LANE - 1) // LANE) * LANE
    nty, ntx = hl_pad // SUB, wl_pad // LANE
    ntiles = n * nty * ntx

    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.integers(0, 3000, (n, h, w)).astype(np.uint16))

    @jax.jit
    def pad_split(depth):
        di = depth.astype(jnp.int32)
        padded = jnp.pad(
            di, ((0, 0), (PAD_Y, PAD_B + 2 * SUB), (PAD_X, PAD_X + LANE)),
            constant_values=MAX)
        return padded[:, 0::2, :], padded[:, 1::2, :]

    @jax.jit
    def dcenter(depth):
        di = depth.astype(jnp.int32)
        return jnp.pad(di[:, ::r, ::r],
                       ((0, 0), (0, hl_pad - hl), (0, wl_pad - wl)))

    @jax.jit
    def act_fnz(dc):
        elig = (dc != 0) & (dc != MAX)
        ta = elig.reshape(n, nty, SUB, ntx, LANE).any(axis=(2, 4))
        fa = ta.reshape(ntiles)
        tl = jnp.flatnonzero(fa, size=ntiles, fill_value=0).astype(jnp.int32)
        return tl, fa.sum()

    @jax.jit
    def act_scatter(dc):
        elig = (dc != 0) & (dc != MAX)
        ta = elig.reshape(n, nty, SUB, ntx, LANE).any(axis=(2, 4))
        fa = ta.reshape(ntiles)
        pos = jnp.cumsum(fa) - fa
        tl = jnp.zeros(ntiles, jnp.int32).at[
            jnp.where(fa, pos, ntiles)
        ].set(jnp.arange(ntiles, dtype=jnp.int32), mode="drop")
        return tl, fa.sum()

    @jax.jit
    def mask(dc, out):
        elig = (dc != 0) & (dc != MAX)
        return jnp.where(elig, out, MAX)

    dc = dcenter(depth)
    out = dc * 0
    print(f"pad+split : {timeit(pad_split, depth):.3f} ms")
    print(f"d_center  : {timeit(dcenter, depth):.3f} ms")
    print(f"act fnz   : {timeit(act_fnz, dc):.3f} ms")
    print(f"act scat  : {timeit(act_scatter, dc):.3f} ms")
    print(f"post mask : {timeit(mask, dc, out):.3f} ms")
    # sanity: same list
    a, na = act_fnz(dc)
    b, nb = act_scatter(dc)
    na, nb = int(na), int(nb)
    assert na == nb and np.array_equal(np.asarray(a)[:na], np.asarray(b)[:nb])
    print("lists match, n_active =", na)


if __name__ == "__main__":
    main()
