"""Attribute flagship eval-kernel time by neutering one stage at a time
(B3D_EVAL_NEUTER) in subprocesses.  Results are numerically WRONG under
neutering — timing attribution only.  Run from repo root on the chip."""
import os
import subprocess
import sys

WORKER = r"""
import gzip, os, time
import numpy as np
import jax
import jax.numpy as jnp
from beats3d_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from beats3d_tpu.ops import forest_eval_pallas as fep

# the D=16 fine forest ALONE: its labels feed nothing, so neutering a stage
# cannot silently disable downstream layers (the layered-model attribution
# trap: zeroed coarse labels skip the fine layer entirely)
with gzip.open("models/flagship/m1.npy.gz", "rb") as f:
    import io
    flat = np.load(io.BytesIO(f.read())).astype(np.float32)
tables, meta = fep.pack_tables_pallas(flat)
print("LEVELS", meta[3], "leaves", meta[4])

h, w = 256, 384
yy, xx = np.mgrid[0:h, 0:w]
blob = ((yy - 128) ** 2 + (xx - 192) ** 2 / 2) < 100 ** 2
d = np.full((1, h, w), 65535, np.uint16)
d[:, blob] = (2300 + yy[blob] * 0.5).astype(np.uint16)
d = jnp.asarray(d)

def ev():
    return fep.evaluate_forest_pallas(
        d, tables, meta, labels_reduce=2, scale_factor=jnp.float32(1.0))

o = ev(); np.asarray(o)
t0 = time.perf_counter()
for _ in range(40):
    o = ev()
np.asarray(o)
print(f"RESULT {(time.perf_counter() - t0) / 40 * 1e3:.2f}")
"""


def main():
    variants = sys.argv[1:] or [""]
    for v in variants:
        env = dict(os.environ)
        env["B3D_EVAL_NEUTER"] = v
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=1200,
        )
        lines = [l for l in r.stdout.splitlines()
                 if l.startswith(("RESULT", "LEVELS"))]
        ms = lines[-1].split()[1] if lines and lines[-1].startswith(
            "RESULT") else f"FAIL\n{r.stderr[-800:]}"
        extra = lines[0] if len(lines) > 1 else ""
        print(f"neuter={v or 'none':14s}: {ms} ms   {extra}")


if __name__ == "__main__":
    main()
