"""Compiled-kernel smoke lane (ADVICE r3 #5): the default serving modes run
through REAL Mosaic compilation, not the interpreter — the class of bug the
CPU suite cannot see (Mosaic lowering, on-chip numerics).  Skipped unless
B3D_TESTS_TPU=1 (one process may hold the chip; run serially):

    B3D_TESTS_TPU=1 python -m pytest tests/test_onchip.py -q

bench.py --check is the heavier end-to-end equivalent (full pipeline +
flagship golden) recorded per round in BENCHCHECK_r{N}.json.
"""
import numpy as np
import pytest

import fixtures
import oracle

from beats3d_tpu.ops import forest_eval_pallas as fep


@pytest.mark.onchip
def test_compiled_forest_parity_default_modes(rng):
    import jax

    assert jax.devices()[0].platform != "cpu", (
        "onchip test collected without a TPU"
    )
    depth = fixtures.random_depth_image(rng, 2, 48, 160)
    forest = fixtures.random_forest_flat(rng, 3, 6, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 6, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=False)
    )
    np.testing.assert_array_equal(got, want)
