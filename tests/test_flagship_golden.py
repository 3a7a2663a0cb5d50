"""Flagship-model golden regression: the committed D=16 T=4 layered model
(trained on-chip from full-res datagen output, models/flagship/RESULTS.json)
must reproduce its committed label images through the XLA path on CPU.

The labels were produced at r=1 by the compiled Pallas kernel on hardware
(and matched the XLA path with 0 mismatches there); r=2 evaluation is an
exact subsample (label[y,x] == label_r1[2y,2x]), so this asserts flagship-
depth semantics at a quarter of the cost."""

import gzip
import os
import shutil

import numpy as np

import jax.numpy as jnp

from beats3d_tpu.models import LayeredDecisionForest

HERE = os.path.dirname(os.path.abspath(__file__))
FLAGSHIP = os.path.join(os.path.dirname(HERE), "models", "flagship")


def _materialize_model(tmp_path):
    for name in ("m0.npy", "model_cfg.json"):
        shutil.copy(os.path.join(FLAGSHIP, name), tmp_path / name)
    src = os.path.join(FLAGSHIP, "m1.npy")
    if os.path.exists(src):
        shutil.copy(src, tmp_path / "m1.npy")
    else:
        with gzip.open(src + ".gz", "rb") as f:
            (tmp_path / "m1.npy").write_bytes(f.read())
    return str(tmp_path / "model_cfg.json")


def test_flagship_golden_labels(tmp_path):
    data = np.load(os.path.join(FLAGSHIP, "golden_eval.npz"))
    model = LayeredDecisionForest.load(
        _materialize_model(tmp_path), labels_reduce=2
    )
    got = np.asarray(model.run(jnp.asarray(data["depth"][:1])))
    want = data["labels"][0][::2, ::2]
    np.testing.assert_array_equal(got[0], want)
