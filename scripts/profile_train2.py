"""Isolate train_feature_bits cost: offsets size x depth shape x active mask."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from beats3d_tpu.ops.train_features_pallas import train_feature_bits


def timeit(f, iters=10):
    o = f(); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3


def props_with(rng, mag):
    p = np.zeros((64, 5), np.float32)
    p[:, 0:4] = rng.uniform(-mag, mag, (64, 4))
    p[:, 4] = rng.uniform(-500, 500, 64)
    return jnp.asarray(p)


def main():
    rng = np.random.default_rng(0)
    n, h, w = 4, 480, 848
    yy, xx = np.mgrid[0:h, 0:w]

    flat = jnp.asarray(np.full((n, h, w), 2000, np.uint16))
    blob_np = np.full((n, h, w), 2600, np.uint16)
    for i in range(n):
        m = ((yy - 240) ** 2 + (xx - 400) ** 2) < 150 ** 2
        blob_np[i][m] -= 300
    blob = jnp.asarray(blob_np)
    hand_act = jnp.asarray((blob_np < 2400))

    small = props_with(rng, 2000.0)    # dx ~ 1 px
    mid = props_with(rng, 40000.0)     # dx ~ 20 px
    big = props_with(rng, 1200000.0)   # dx ~ 600 px (e^14, the real range)

    for name, d, p, act in (
        ("flat/small ", flat, small, None),
        ("flat/mid   ", flat, mid, None),
        ("flat/big   ", flat, big, None),
        ("blob/small ", blob, small, None),
        ("blob/big   ", blob, big, None),
        ("blob/big/act", blob, big, hand_act),
    ):
        t = timeit(lambda: train_feature_bits(d, p, act))
        print(f"{name}: {t:8.2f} ms")


if __name__ == "__main__":
    main()
