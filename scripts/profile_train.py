"""On-chip training throughput: XLA feature path vs Pallas bits path."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from beats3d_tpu.train import make_random_features
from beats3d_tpu.train.trainer import _histogram_step, _histogram_step_from_bits
from beats3d_tpu.ops.train_features_pallas import train_feature_bits


def timeit(f, iters=5):
    o = f(); np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    n, h, w = 4, 480, 848
    yy, xx = np.mgrid[0:h, 0:w]
    depth = np.full((n, h, w), 2600, np.uint16)
    for i in range(n):
        blob = ((yy - 240) ** 2 + (xx - 400 - 10 * i) ** 2) < 150 ** 2
        depth[i][blob] -= 300
    labels = np.where(depth < 2400, (yy[None] % 3 + 1), 0).astype(np.uint16)
    nodes = np.where(labels > 0, 0, -1).astype(np.int32)
    props = make_random_features(64, rng)

    d, l, nd, pr = map(jnp.asarray, (depth, labels, nodes, props))
    kw = dict(num_classes=4, w2=1, node_lo=0, chunk=1 << 13, use_matmul=True)

    t_bits = timeit(lambda: train_feature_bits(d, pr))
    print(f"feature bits (pallas): {t_bits:8.2f} ms for {n} imgs x 64 props")

    bits = train_feature_bits(d, pr)
    t_hb = timeit(lambda: _histogram_step_from_bits(
        bits, l, nd, num_props=64, **kw))
    print(f"hist from bits       : {t_hb:8.2f} ms")

    t_x = timeit(lambda: _histogram_step(d, l, nd, pr, **kw), iters=2)
    print(f"hist XLA features    : {t_x:8.2f} ms")
    print(f"speedup: {t_x / (t_bits + t_hb):.1f}x")


if __name__ == "__main__":
    main()
