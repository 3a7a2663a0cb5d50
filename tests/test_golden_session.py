"""Golden recorded-session regression test: the committed fixture pins the
full pipeline's per-pixel labels, fingertip heights, and group info for three
frames of a synthetic session.  Any semantic drift in preprocessing, grouping,
forest evaluation, composite, mean shift, or fingertip sampling fails here —
the rebuild's stand-in for the reference's .bag-playback eyeball checks
(SURVEY.md §4)."""

import os

import numpy as np

import jax.numpy as jnp

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.runtime.pipeline import FramePipeline, PipelineConfig
from beats3d_tpu.utils import CameraIntrinsics

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "goldens", "session.npz")
MODEL = os.path.join(HERE, "goldens", "model", "model_cfg.json")


def _pipe(backend):
    intrin = CameraIntrinsics.d415(212, 120)
    model = LayeredDecisionForest.load(MODEL, labels_reduce=2)
    return FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=120, width=212, labels_reduce=2),
        group_min_size=0.02, backend=backend,
    )


def test_golden_session_xla():
    data = np.load(GOLDEN)
    pipe = _pipe("xla")
    for i in range(data["frames"].shape[0]):
        out = pipe(jnp.asarray(data["frames"][i]), jnp.asarray(data["plane"]))
        np.testing.assert_array_equal(
            np.asarray(out["labels"]), data["labels"][i]
        )
        np.testing.assert_allclose(
            np.asarray(out["heights"]), data["heights"][i], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["g_info"]), data["g_info"][i], rtol=1e-5
        )


def test_golden_session_pallas_interpret():
    """The Pallas backend must reproduce the same labels bit-exactly."""
    from beats3d_tpu.ops import forest_eval_pallas as fep

    data = np.load(GOLDEN)
    orig = fep.evaluate_layered_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    from beats3d_tpu.models import layered as layered_mod
    from beats3d_tpu.runtime import pipeline as pipeline_mod

    layered_mod.forest_eval_pallas.evaluate_layered_pallas = interp
    try:
        pipe = _pipe("pallas")
        out = pipe(jnp.asarray(data["frames"][0]), jnp.asarray(data["plane"]))
        np.testing.assert_array_equal(
            np.asarray(out["labels"]), data["labels"][0]
        )
    finally:
        layered_mod.forest_eval_pallas.evaluate_layered_pallas = orig
