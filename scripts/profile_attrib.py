"""Attribute flagship eval-kernel time by neutering one stage at a time
(B3D_EVAL_NEUTER) in subprocesses.  Results are numerically WRONG under
neutering — timing attribution only.  Run from repo root on the chip."""
import os
import subprocess
import sys

WORKER = r"""
import gzip, os, shutil, tempfile, time
import numpy as np
import jax
import jax.numpy as jnp
from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.pipeline import FramePipeline
from beats3d_tpu.utils import CameraIntrinsics
from beats3d_tpu.ops import forest_eval_pallas as fep

tmpd = tempfile.mkdtemp()
for name in ("m0.npy", "model_cfg.json"):
    shutil.copy(os.path.join("models/flagship", name), os.path.join(tmpd, name))
with gzip.open("models/flagship/m1.npy.gz", "rb") as f:
    open(os.path.join(tmpd, "m1.npy"), "wb").write(f.read())
intrin = CameraIntrinsics.d415()
model = LayeredDecisionForest.load(os.path.join(tmpd, "model_cfg.json"), labels_reduce=2)
pipe = FramePipeline(model, intrin)

h, w = 256, 384
yy, xx = np.mgrid[0:h, 0:w]
blob = ((yy - 128) ** 2 + (xx - 192) ** 2 / 2) < 100 ** 2
d = np.full((2, h, w), 65535, np.uint16)
d[:, blob] = (2300 + yy[blob] * 0.5).astype(np.uint16)
d = jnp.asarray(d)

def ev():
    return fep.evaluate_layered_pallas(
        d, pipe._tables, pipe._metas, pipe._cond_packed, pipe._num_cond,
        filter_specs=pipe._filter_specs, labels_reduce=2,
        scale_factor=jnp.float32(1.0))

o = ev(); np.asarray(o)
t0 = time.perf_counter()
for _ in range(40):
    o = ev()
np.asarray(o)
print(f"RESULT {(time.perf_counter() - t0) / 40 * 1e3:.2f}")
"""


def main():
    variants = ["", "pdf", "img", "lut0", "img,pdf", "img,lut0,pdf"]
    for v in variants:
        env = dict(os.environ)
        env["B3D_EVAL_NEUTER"] = v
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=580,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        ms = line[0].split()[1] if line else f"FAIL\n{r.stderr[-500:]}"
        print(f"neuter={v or 'none':14s}: {ms} ms")


if __name__ == "__main__":
    main()
