"""Compiled-kernel lane (ADVICE r3 #5, widened per VERDICT r4 #4): the
kernel surface — default + kept A/B sweep modes 0-3, the fused layered
kernel, the fused preproc kernel, and the training feature-bit kernel —
runs through REAL Mosaic compilation, not the interpreter: the class of
bug the CPU suite cannot see (Mosaic lowering, on-chip numerics).
Skipped unless B3D_TESTS_TPU=1 (one process may hold the chip; run
serially):

    B3D_TESTS_TPU=1 python -m pytest tests/test_onchip.py -q

bench.py --check is the heavier end-to-end equivalent (full pipeline +
flagship golden) recorded per round in BENCHCHECK_r{N}.json; this lane's
per-round record is ONCHIP_r{N}.json.
"""
import numpy as np
import pytest

import fixtures
import oracle

from beats3d_tpu.ops import forest_eval_pallas as fep


def _assert_tpu():
    import jax

    assert jax.devices()[0].platform != "cpu", (
        "onchip test collected without a TPU"
    )


@pytest.mark.onchip
def test_compiled_forest_parity_default_modes(rng):
    _assert_tpu()
    depth = fixtures.random_depth_image(rng, 2, 48, 160)
    forest = fixtures.random_forest_flat(rng, 3, 6, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 6, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=False)
    )
    np.testing.assert_array_equal(got, want)


# Kept A/B serving modes (B3D_EVAL_SWEEP=0..3; 4 is the default covered
# above).  Mosaic lowers each mode's loop structure differently, so a kept
# mode can miscompile while the CPU interpreter stays green — this lane
# fails if any kept mode's COMPILED kernel diverges from the oracle.
_MODE_FLAGS = {
    "0": dict(_SWEEP_NEEDED=False, _SWEEP_ROW=False, _SWEEP_ANCHOR=False,
              _SWEEP_BATCH=False),
    "1": dict(_SWEEP_NEEDED=True, _SWEEP_ROW=False, _SWEEP_ANCHOR=False,
              _SWEEP_BATCH=False),
    "2": dict(_SWEEP_NEEDED=True, _SWEEP_ROW=True, _SWEEP_ANCHOR=False,
              _SWEEP_BATCH=False),
    "3": dict(_SWEEP_NEEDED=True, _SWEEP_ROW=False, _SWEEP_ANCHOR=True,
              _SWEEP_BATCH=False),
}


@pytest.mark.onchip
@pytest.mark.parametrize("mode", sorted(_MODE_FLAGS))
def test_compiled_sweep_mode_parity(rng, monkeypatch, mode):
    import jax

    _assert_tpu()
    for k, v in _MODE_FLAGS[mode].items():
        monkeypatch.setattr(fep, k, v)
    jax.clear_caches()  # evaluate_forest_pallas is jitted; globals changed
    depth = fixtures.random_depth_image(rng, 2, 40, 144)
    forest = fixtures.random_forest_flat(rng, 2, 7, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 7, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=False)
    )
    jax.clear_caches()  # don't leak mode-flagged traces to later tests
    np.testing.assert_array_equal(got, want)


@pytest.mark.onchip
def test_compiled_layered_kernel_parity(tmp_path, rng):
    """The fused layered kernel (all layers + composite in one grid pass)
    through real Mosaic compilation, vs the oracle composition."""
    _assert_tpu()
    from beats3d_tpu.models import LayeredDecisionForest

    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    ldf = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    depth = fixtures.random_depth_image(rng, 2, 24, 32)
    got = np.asarray(ldf.run(depth, scale_factor=1.0))

    f0 = np.load(tmp_path / "m0.npy")
    f1 = np.load(tmp_path / "m1.npy")
    l0 = oracle.eval_forest(depth, f0, 4, 3, labels_reduce=2)
    l1 = oracle.eval_forest(
        depth, f1, 4, 4, labels_reduce=2, filter_images=l0, filter_class=1
    )
    conditions = np.array(
        [[1, 2], [0, 1], [0, 2], [0, 3], [0, 4]], dtype=np.int32
    )
    want = np.stack([
        oracle.composite_labels([l0[i], l1[i]], conditions)
        for i in range(depth.shape[0])
    ])
    np.testing.assert_array_equal(got, want)


@pytest.mark.onchip
def test_compiled_preproc_pallas_parity(rng):
    """Fused plane-band + gaussian preproc kernel, compiled, vs the XLA
    chain (same tolerance contract as the CPU interpret-mode test)."""
    _assert_tpu()
    import jax.numpy as jnp

    from beats3d_tpu.ops import points
    from beats3d_tpu.ops.preproc_pallas import plane_band_gauss

    plane_mat = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2600.0], [0, 0, 0, 1]],
        np.float32))
    pp = jnp.asarray([31.0, 17.0])
    d = jnp.asarray(fixtures.random_depth_image(rng, 2, 40, 64))
    got = np.asarray(plane_band_gauss(
        d, plane_mat, pp, 420.0, 120.0, interpret=False
    )).astype(np.int32)

    k = jnp.asarray(points.gaussian_kernel(5, 2.0))

    def one(img):
        d1 = points.plane_band_depth(img, plane_mat, pp, 420.0, 120.0)
        return points.gaussian_depth_filter(d1, k)

    want = np.asarray(
        jnp.stack([one(d[i]) for i in range(d.shape[0])])
    ).astype(np.int32)
    np.testing.assert_array_equal(got == 0, want == 0)
    assert np.abs(got - want).max() <= 1


@pytest.mark.onchip
def test_compiled_train_feature_bits_parity(rng):
    """Compiled training feature-bit kernel vs the XLA feature evaluator."""
    _assert_tpu()
    import jax.numpy as jnp

    from beats3d_tpu.ops.train_features_pallas import train_feature_bits
    from beats3d_tpu.train.trainer import _chunk_features
    from test_train import make_random_features

    depth, _ = fixtures.synthetic_hand_dataset(rng, n=2, h=24, w=40)
    depth[0, 3, 5] = 0
    depth[1, 0, 0] = 65535
    props = make_random_features(40, rng)
    n, h, w = depth.shape
    bits = np.asarray(train_feature_bits(
        jnp.asarray(depth), jnp.asarray(props), interpret=False
    ))
    p = props.shape[0]
    got = np.zeros((n, p, h, w), bool)
    for ppx in range(p):
        got[:, ppx] = (bits[:, ppx // 32] >> (ppx % 32)) & 1

    lin = np.arange(n * h * w, dtype=np.int32)
    f = np.asarray(_chunk_features(
        jnp.asarray(depth.reshape(-1)),
        jnp.asarray(lin // (h * w)),
        jnp.asarray((lin % (h * w)) // w),
        jnp.asarray(lin % w),
        jnp.asarray(depth.reshape(-1)),
        jnp.asarray(props), h, w,
    ))
    want = (
        (f < props[:, 4][:, None]).reshape(p, n, h, w).transpose(1, 0, 2, 3)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.onchip
@pytest.mark.parametrize("knobs", [
    {"_RSPAN": 2}, {"_RSPAN": 4}, {"_RSPAN": 2, "_WSPAN": 2},
    {"_CSPAN": 2},
])
def test_compiled_span_knobs_parity(rng, monkeypatch, knobs):
    """Rectangle/chunk-span serving through REAL Mosaic compilation: the
    round-5 RSPAN first cut was exact in interpret mode yet wrong on chip
    (24-row cyclic roll lowering), so these knobs get a compiled lane."""
    import jax

    _assert_tpu()
    for k, v in knobs.items():
        monkeypatch.setattr(fep, k, v)
    jax.clear_caches()
    depth = fixtures.random_depth_image(rng, 2, 56, 272)
    forest = fixtures.random_forest_flat(rng, 2, 8, 5, leaf_prob=0.25)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 8, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=False)
    )
    jax.clear_caches()
    np.testing.assert_array_equal(got, want)
