"""Worst-case guard: incoherent frames must trip the spread metric (and fall
back to the XLA path in the pipeline); coherent hand scenes must not.

The kernel-level effect (adversarial frames capped at the XLA path's cost
instead of ~100x Pallas sweep blowup) is verified on hardware by
scripts/drive_e2e.py; here we pin the metric's decision boundary."""

import numpy as np

import jax.numpy as jnp

from beats3d_tpu.runtime.pipeline import PipelineConfig, _incoherent

CFG = PipelineConfig(height=160, width=256)


def _metric(depth):
    return bool(np.asarray(_incoherent(jnp.asarray(depth), 2, CFG)))


def test_coherent_blob_passes():
    d = np.full((2, 160, 256), 65535, np.uint16)
    yy, xx = np.mgrid[0:160, 0:256]
    blob = (yy - 80) ** 2 + (xx - 128) ** 2 < 60 ** 2
    d[:, blob] = (2300 + yy[blob]).astype(np.uint16)  # smooth gradient
    assert not _metric(d)


def test_incoherent_noise_trips():
    rng = np.random.default_rng(0)
    d = rng.integers(1, 60000, (2, 160, 256)).astype(np.uint16)
    assert _metric(d)


def test_empty_frame_passes():
    d = np.full((2, 160, 256), 65535, np.uint16)
    assert not _metric(d)


def test_disabled_guard_never_trips_pipeline_choice():
    # guard_spread <= 0 is the documented kill switch; the pipeline checks it
    # statically, so here we just pin that the config default is enabled.
    assert CFG.guard_spread > 0 and 0 < CFG.guard_tile_frac < 1


def test_per_image_flags():
    """guard_mode="skip" judges each image alone: noise flags, coherent and
    empty images do not (one adversarial frame cannot de-optimize a batch)."""
    from beats3d_tpu.runtime.pipeline import _incoherent_images

    rng = np.random.default_rng(1)
    d = np.full((3, 160, 256), 65535, np.uint16)
    yy, xx = np.mgrid[0:160, 0:256]
    blob = (yy - 80) ** 2 + (xx - 128) ** 2 < 60 ** 2
    d[0, blob] = (2300 + yy[blob]).astype(np.uint16)
    d[1] = rng.integers(1, 60000, (160, 256)).astype(np.uint16)
    flags = np.asarray(_incoherent_images(jnp.asarray(d), 2, CFG))
    assert flags.tolist() == [False, True, False]


def test_guard_defaults():
    cfg = PipelineConfig()
    assert cfg.guard_mode == "skip" and cfg.fallback_budget == 2
