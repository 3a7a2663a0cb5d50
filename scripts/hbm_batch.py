"""Where does the batched pipeline's HBM go?  Compile (no run) at several
batch sizes and print XLA's memory analysis — peak, temp, args — plus the
guard on/off delta (the XLA-fallback cond branch rides along in the same
program and may reserve the peak).

Usage: python scripts/hbm_batch.py [B ...]  (default 16 24 32)
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from beats3d_tpu.utils import CameraIntrinsics, enable_compilation_cache
enable_compilation_cache()

from bench import _scene_hands, load_flagship
from beats3d_tpu.runtime.pipeline import (
    FramePipeline, PipelineConfig, frame_step_batched,
)


def analyze(pipe, frames, plane_mat):
    fn = jax.jit(
        lambda d, m: pipe.batch(d, m)
    )
    lowered = fn.lower(frames, plane_mat)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    g = 1 << 30
    print(
        f"  peak {ma.peak_memory_in_bytes / g:6.2f} G  "
        f"temp {ma.temp_size_in_bytes / g:6.2f} G  "
        f"args {ma.argument_size_in_bytes / g:6.2f} G  "
        f"out {ma.output_size_in_bytes / g:6.2f} G  "
        f"alias {ma.alias_size_in_bytes / g:6.2f} G"
    )


def main():
    bs = [int(x) for x in sys.argv[1:]] or [16, 24, 32]
    intrin = CameraIntrinsics.d415()
    model = load_flagship()
    plane_mat = jnp.asarray(np.eye(4, dtype=np.float32))

    for guard in (1500, 0):
        cfg = PipelineConfig(preproc_pallas=True, guard_spread=guard)
        pipe = FramePipeline(model, intrin, cfg=cfg)
        for b in bs:
            frames = jnp.asarray(
                np.stack([_scene_hands(intrin, t) for t in range(b)])
            )
            print(f"guard={guard} B={b}:", flush=True)
            try:
                analyze(pipe, frames, plane_mat)
            except Exception as e:
                print(f"  FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
