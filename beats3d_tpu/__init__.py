"""beats3d_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
carsonswope/3d-beats: real-time per-pixel randomized-decision-forest hand tracking on
depth frames, layered forest stacking, mean-shift fingertip mode finding, RANSAC
table-plane calibration, tap-detection MIDI gating, and on-accelerator forest training.

The package is a ground-up TPU-first design (not a port): per-pixel SIMT kernels become
vectorized XLA programs and Pallas kernels; atomics become deterministic one-hot-matmul /
segment reductions; the reference's mid-frame CPU round trip (connected components)
runs on-device; artifact formats (.npy forests, dataset config.json, layered cfg JSON)
stay byte-compatible with the reference so its models and datasets load unchanged.

Reference layer map and component inventory: /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

from . import models, ops, utils  # noqa: F401
