"""Decompose the fixed per-call floor: dispatch, preamble, empty pallas call.

Loop-then-one-fetch timing (tunnel D2H excluded from amortized numbers).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from __graft_entry__ import _synthetic_layered_model
from beats3d_tpu.runtime.pipeline import FramePipeline
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import forest_eval_pallas as fep


def timeit(f, iters=60, warmup=3):
    for _ in range(warmup):
        out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("platform:", jax.devices()[0].platform)

    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def tiny(x):
        return x + 1.0

    print(f"tiny jit dispatch     : {timeit(lambda: tiny(x)):6.2f} ms")

    big = jnp.zeros((2, 256, 384), jnp.uint16)

    @jax.jit
    def pre(d):
        # replicate _prep_planes-ish work
        r = 2
        h, w = 256, 384
        hl, wl = h // r, w // r
        import beats3d_tpu.ops.forest_eval_pallas as F
        return F._prep_planes(d, r, ((hl + 7) // 8) * 8, ((wl + 127) // 128) * 128)

    print(f"prep_planes only      : {timeit(lambda: pre(big)):6.2f} ms")

    intrin = CameraIntrinsics.d415()
    model = _synthetic_layered_model("/tmp/graft_model")
    pipe = FramePipeline(model, intrin)

    empty = jnp.full((2, 256, 384), 65535, jnp.uint16)

    def ev(d):
        return fep.evaluate_layered_pallas(
            d, pipe._tables, pipe._metas, pipe._cond_packed, pipe._num_cond,
            filter_specs=pipe._filter_specs, labels_reduce=2,
            scale_factor=jnp.float32(1.0))

    print(f"layered eval EMPTY    : {timeit(lambda: ev(empty)):6.2f} ms")

    # single occupied tile
    one = np.full((2, 256, 384), 65535, np.uint16)
    one[:, 120:136, 180:200] = 2500
    onej = jnp.asarray(one)
    print(f"layered eval 1 tile   : {timeit(lambda: ev(onej)):6.2f} ms")

    # a flat coherent blob (constant depth)
    flat = np.full((2, 256, 384), 65535, np.uint16)
    yy, xx = np.mgrid[0:256, 0:384]
    blob = ((yy - 128) ** 2 + (xx - 192) ** 2 / 2) < 100 ** 2
    flat[:, blob] = 2500
    flatj = jnp.asarray(flat)
    print(f"layered eval flatblob : {timeit(lambda: ev(flatj)):6.2f} ms")

    # blob with mild coherent gradient (like a real hand)
    grad = np.full((2, 256, 384), 65535, np.uint16)
    grad[:, blob] = (2300 + yy[blob] * 0.5).astype(np.uint16)
    gradj = jnp.asarray(grad)
    print(f"layered eval gradblob : {timeit(lambda: ev(gradj)):6.2f} ms")

    # sawtooth (profile_r2's HAND): incoherent rows
    saw = np.full((2, 256, 384), 65535, np.uint16)
    saw[:, blob] = 2300 + (yy[blob] % 40).astype(np.uint16)
    sawj = jnp.asarray(saw)
    print(f"layered eval sawblob  : {timeit(lambda: ev(sawj)):6.2f} ms")

    # flagship-depth model (D=16 fine layer, chunked deep levels)
    import gzip
    import os
    import shutil
    import tempfile
    if os.path.exists("models/flagship/model_cfg.json"):
        from beats3d_tpu.models import LayeredDecisionForest
        tmpd = tempfile.mkdtemp()
        for name in ("m0.npy", "model_cfg.json"):
            shutil.copy(os.path.join("models/flagship", name),
                        os.path.join(tmpd, name))
        src = "models/flagship/m1.npy"
        if os.path.exists(src):
            shutil.copy(src, os.path.join(tmpd, "m1.npy"))
        else:
            with gzip.open(src + ".gz", "rb") as f:
                open(os.path.join(tmpd, "m1.npy"), "wb").write(f.read())
        fmodel = LayeredDecisionForest.load(
            os.path.join(tmpd, "model_cfg.json"), labels_reduce=2
        )
        fpipe = FramePipeline(fmodel, intrin)

        def evf(d):
            return fep.evaluate_layered_pallas(
                d, fpipe._tables, fpipe._metas, fpipe._cond_packed,
                fpipe._num_cond, filter_specs=fpipe._filter_specs,
                labels_reduce=2, scale_factor=jnp.float32(1.0))

        print(f"FLAGSHIP eval gradblob: {timeit(lambda: evf(gradj)):6.2f} ms")
        from __graft_entry__ import _synthetic_frame
        fr = jnp.asarray(_synthetic_frame(intrin))
        pm = jnp.asarray(np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
            np.float32))
        print(f"FLAGSHIP full pipeline: {timeit(lambda: fpipe(fr, pm)):6.2f} ms")


if __name__ == "__main__":
    main()
