"""How does the fused layered kernel scale with T, D, C?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from beats3d_tpu.ops import forest_eval_pallas as fep


def timeit(f, iters=40):
    o = f(); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3


def rand_forest(t, d, c, seed=0):
    rng = np.random.default_rng(seed)
    total = (1 << d) - 1
    arr = np.zeros((t, total, 7 + 2 * c), np.float32)
    arr[:, :, 0:4] = rng.uniform(-30000, 30000, (t, total, 4))
    arr[:, :, 4] = rng.uniform(-200, 200, (t, total))
    leaf = rng.random((t, total, 2)) < 0.3
    arr[:, :, 5:7] = np.where(leaf, 0.0, -1.0)
    arr[:, (1 << (d - 1)) - 1:, 5:7] = 0.0
    arr[:, :, 7:] = rng.random((t, total, 2 * c))
    return arr


def main():
    h, w = 256, 384
    d_img = np.full((2, h, w), 65535, np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 128) ** 2 + (xx - 192) ** 2 / 2) < 100**2
    for i in range(2):
        d_img[i][blob] = 2300 + (yy[blob] % 40).astype(np.uint16)
    d_img = jnp.asarray(d_img)

    for (t, d, c) in ((1, 8, 3), (2, 8, 3), (4, 8, 3), (8, 8, 3),
                      (4, 4, 3), (4, 12, 3), (4, 8, 7)):
        tables, meta = fep.pack_tables_pallas(rand_forest(t, d, c))
        fn = lambda: fep.evaluate_layered_pallas(
            d_img, (tables,), (meta,), fep._pack_conditions(
                np.array([[0, i + 1] for i in range(c - 1)], np.int32)),
            c - 1, filter_specs=((None, -1),), labels_reduce=2,
            scale_factor=jnp.float32(1.0))
        print(f"T={t} D={d:2d} C={c}: {timeit(fn):6.2f} ms")


if __name__ == "__main__":
    main()
