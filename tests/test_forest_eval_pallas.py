"""Pallas kernel parity vs the oracle (interpret mode on CPU; the same checks
run compiled on TPU hardware in the bench/verify drives)."""

import numpy as np
import pytest

import jax.numpy as jnp

import fixtures
import oracle

from beats3d_tpu.models import LayeredDecisionForest
from beats3d_tpu.ops import forest_eval_pallas as fep


def test_pallas_forest_parity(rng):
    depth = fixtures.random_depth_image(rng, 2, 24, 32)
    forest = fixtures.random_forest_flat(rng, 3, 5, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 5, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_reduce_scale_filter(rng):
    depth = fixtures.random_depth_image(rng, 1, 24, 32)
    forest = fixtures.random_forest_flat(rng, 2, 4, 5)
    tables, meta = fep.pack_tables_pallas(forest)

    want = oracle.eval_forest(depth, forest, 4, 5, labels_reduce=2,
                              scale_factor=0.5)
    got = np.asarray(
        fep.evaluate_forest_pallas(
            depth, tables, meta, labels_reduce=2, scale_factor=0.5,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)

    filt = rng.integers(0, 3, size=(1, 12, 16)).astype(np.uint16)
    want = oracle.eval_forest(
        depth, forest, 4, 5, labels_reduce=2, filter_images=filt,
        filter_class=1,
    )
    got = np.asarray(
        fep.evaluate_forest_pallas(
            depth, tables, meta, labels_reduce=2, filter_images=filt,
            filter_class=1, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_deep_tree_multichunk(rng):
    """Levels 8-9 exercise the multi-chunk / superchunk lookup path."""
    depth = fixtures.random_depth_image(rng, 1, 16, 24)
    deep = fixtures.random_forest_flat(rng, 1, 10, 3, leaf_prob=0.05)
    tables, meta = fep.pack_tables_pallas(deep)
    want = oracle.eval_forest(depth, deep, 10, 3)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_single_tree_semantics(rng):
    depth = fixtures.random_depth_image(rng, 2, 24, 32)
    tree = fixtures.random_tree_flat(rng, 5, 4)
    tables, meta = fep.pack_tables_pallas(tree[None])
    want = oracle.eval_tree(depth, tree, 5, 4)
    got = np.asarray(
        fep.evaluate_forest_pallas(
            depth, tables, meta, write_all_eligible=False, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def test_layered_backends_agree(tmp_path, rng):
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    ldf = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    depth = fixtures.random_depth_image(rng, 1, 24, 32)
    import jax

    with jax.disable_jit(False):
        a = np.asarray(ldf.run(depth, backend="xla"))
    # fused pallas backend in interpret mode via monkeypatched flag
    from beats3d_tpu.models import layered as layered_mod

    orig = fep.evaluate_layered_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    layered_mod.forest_eval_pallas.evaluate_layered_pallas = interp
    try:
        b = np.asarray(ldf.run(depth, backend="pallas"))
    finally:
        layered_mod.forest_eval_pallas.evaluate_layered_pallas = orig
    np.testing.assert_array_equal(a, b)


def test_pallas_deep_sparse_forest_parity(rng):
    """Compact per-level tables at reference-realistic depth (D=14): the
    Pallas traversal must match the dense XLA evaluator bit-for-bit.  Dense
    tables at this depth would not fit VMEM; the compact pack keeps only
    evaluated nodes with explicit child pointers."""
    import jax.numpy as jnp
    from beats3d_tpu.models.forest import PackedForest
    from beats3d_tpu.ops import forest_eval
    from beats3d_tpu.ops import forest_eval_pallas as fep

    d, c, t = 14, 5, 2
    total = (1 << d) - 1
    flat = np.zeros((t, total, 7 + 2 * c), np.float32)
    flat[:, :, 0:4] = rng.uniform(-20000, 20000, (t, total, 4))
    flat[:, :, 4] = rng.uniform(-300, 300, (t, total))
    # sparse: leaf probability grows with depth — full at the top, narrow
    # and deep below (the shape of a trained tree)
    lvl = np.floor(np.log2(np.arange(1, total + 1)))[None, :, None]
    p_leaf = np.where(lvl < 4, 0.0, 0.5)
    leaf = rng.random((t, total, 2)) < p_leaf
    flat[:, :, 5:7] = np.where(leaf, 0.0, -1.0)
    flat[:, (1 << (d - 1)) - 1 :, 5:7] = 0.0
    flat[:, :, 7:] = rng.random((t, total, 2 * c))

    depth = rng.integers(500, 3000, (1, 32, 48)).astype(np.uint16)
    depth[0, 3, 4] = 0
    depth[0, 10, 11] = 65535

    tables, meta = fep.pack_tables_pallas(flat)
    assert meta[1] > 8, "tree too shallow for the deep test"
    got = np.asarray(fep.evaluate_forest_pallas(
        jnp.asarray(depth), tables, meta, interpret=True
    ))
    packed = PackedForest.from_flat(flat)
    want = np.asarray(
        forest_eval.evaluate_forest(jnp.asarray(depth), packed.tables())
    )
    np.testing.assert_array_equal(got, want)


def test_wide_conditions_falls_back_to_xla(tmp_path, rng):
    """A legal model with >128 conditions rows must run (XLA composite), not
    crash the fused kernel's 128-lane conditions walk."""
    import json
    import jax.numpy as jnp
    import fixtures
    from beats3d_tpu.models import LayeredDecisionForest

    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    with open(cfg_path) as f:
        cfg = json.load(f)
    pad_rows = 140 - len(cfg["conditions"])
    cfg["conditions"] = cfg["conditions"] + [[0, 1]] * pad_rows
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    assert not model.pallas_supported()
    depth = rng.integers(500, 3000, (1, 16, 32)).astype(np.uint16)
    out = model.run(jnp.asarray(depth), backend="pallas")  # silently XLA
    assert out.shape == (1, 8, 16)


def test_layered_tile_pairing_agrees(tmp_path, rng, monkeypatch):
    """K=2 tile pairing (B3D_EVAL_TILEK) must be bit-identical to K=1:
    pins the rank%K canvas merge, the padded last step, and the unioned
    multi-tile sweeps.  Odd tile count + multiple frames exercise both the
    padding slot and pairs straddling frame boundaries."""
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    ldf = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    # 3 frames x (16, 384) -> 2x3 label tiles per frame, 9 tiles total (odd)
    depth = fixtures.random_depth_image(rng, 3, 32, 384)

    from beats3d_tpu.models import layered as layered_mod

    orig = fep.evaluate_layered_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    layered_mod.forest_eval_pallas.evaluate_layered_pallas = interp
    try:
        monkeypatch.setenv("B3D_EVAL_TILEK", "1")
        a = np.asarray(ldf.run(depth, backend="pallas"))
        monkeypatch.setenv("B3D_EVAL_TILEK", "2")
        b = np.asarray(ldf.run(depth, backend="pallas"))
    finally:
        layered_mod.forest_eval_pallas.evaluate_layered_pallas = orig
    np.testing.assert_array_equal(a, b)


def test_pallas_sweep_row_mode(rng, monkeypatch):
    """Row-granularity needed-set sweep (B3D_EVAL_SWEEP=2) parity, with the
    fast path disabled so every gather goes through the exact sweep."""
    monkeypatch.setattr(fep, "_SWEEP_ROW", True)
    monkeypatch.setattr(fep, "_NEUTER", ("nofast",))
    depth = fixtures.random_depth_image(rng, 2, 24, 160)
    forest = fixtures.random_forest_flat(rng, 3, 5, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 5, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_deep_pass_knobs(rng, monkeypatch):
    """Per-depth anchored-pass/window knobs must not change results."""
    monkeypatch.setattr(fep, "_DEEP_LVL", 2)
    monkeypatch.setattr(fep, "_FAST_PASSES_DEEP", 2)
    monkeypatch.setattr(fep, "_FAST_ROWS_DEEP", 4)
    monkeypatch.setattr(fep, "_FAST_KC_DEEP", 1)
    depth = fixtures.random_depth_image(rng, 1, 24, 64)
    forest = fixtures.random_forest_flat(rng, 2, 6, 4)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 6, 4)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_anchor_loop_sweep(rng, monkeypatch):
    """Anchored-pass-loop cleanup (B3D_EVAL_SWEEP=3) parity: stragglers are
    served by dynamic re-anchored fast passes with the row sweep as the
    residual backstop.  Random-offset forests maximize stragglers."""
    monkeypatch.setattr(fep, "_SWEEP_ANCHOR", True)
    depth = fixtures.random_depth_image(rng, 2, 24, 160)
    forest = fixtures.random_forest_flat(rng, 3, 6, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 6, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    # tiny anchor budget: the exact backstop must pick up the remainder
    monkeypatch.setattr(fep, "_ANCHOR_MAX", 1)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_paired_probe_bases(rng, monkeypatch):
    """Pair-shared (u, v) probe window bases (B3D_EVAL_PAIR=1) parity: the
    shared window serves whichever probe it covers; the rest must spill to
    the cleanup, never mis-serve."""
    monkeypatch.setattr(fep, "_PAIR", True)
    depth = fixtures.random_depth_image(rng, 2, 24, 160)
    forest = fixtures.random_forest_flat(rng, 3, 6, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 6, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    # pair + anchor loop together
    monkeypatch.setattr(fep, "_SWEEP_ANCHOR", True)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_needed_set_table_sweeps(rng, monkeypatch):
    """Needed-set comps/leaf-pdf chunk sweeps (B3D_EVAL_NEED=1) parity on a
    deep multi-chunk forest (dynamic-bounds path) with the static-chunk
    threshold lowered so mid-width levels take the dynamic path too."""
    monkeypatch.setattr(fep, "_NEED_SWEEP", True)
    monkeypatch.setattr(fep, "_STATIC_CHUNKS", 1)
    depth = fixtures.random_depth_image(rng, 1, 16, 24)
    deep = fixtures.random_forest_flat(rng, 2, 10, 4, leaf_prob=0.05)
    tables, meta = fep.pack_tables_pallas(deep)
    want = oracle.eval_forest(depth, deep, 10, 4)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_batched_sweep_edge_cases(rng):
    """SWEEP=4 (default) edge cases: probes mostly out of bounds (near-empty
    needed sets -> near-zero-trip loops) and bottom-edge window starts at
    the max packed row."""
    # forest with HUGE offsets: most probes OOB
    flat = fixtures.random_forest_flat(rng, 2, 4, 3, off_mag=2.0e6)
    tables, meta = fep.pack_tables_pallas(flat)
    depth = fixtures.random_depth_image(rng, 1, 24, 136)
    want = oracle.eval_forest(depth, flat, 4, 3)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    np.testing.assert_array_equal(got, want)

    # bottom-edge targets: offsets push every probe downward
    flat2 = fixtures.random_forest_flat(rng, 2, 3, 3, off_mag=300.0)
    flat2[:, :, 1] = np.abs(flat2[:, :, 1])   # uy >= 0 -> down
    flat2[:, :, 3] = np.abs(flat2[:, :, 3])
    tables2, meta2 = fep.pack_tables_pallas(flat2)
    depth2 = fixtures.random_depth_image(rng, 1, 16, 128)
    want2 = oracle.eval_forest(depth2, flat2, 3, 3)
    got2 = np.asarray(
        fep.evaluate_forest_pallas(depth2, tables2, meta2, interpret=True)
    )
    np.testing.assert_array_equal(got2, want2)


@pytest.mark.parametrize("span", [2, 4, 8])
def test_pallas_rowspan_serving(rng, monkeypatch, span):
    """Multi-row serving (B3D_EVAL_RSPAN=D): each batched-sweep trip serves
    D consecutive same-chunk rows from one 24-row window load; parity must
    hold for arbitrary divergence (cells NOT in contiguous runs are just
    served by later trips)."""
    import jax

    monkeypatch.setattr(fep, "_RSPAN", span)
    jax.clear_caches()  # evaluate_forest_pallas is jitted on module globals
    depth = fixtures.random_depth_image(rng, 2, 40, 144)
    forest = fixtures.random_forest_flat(rng, 2, 7, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 7, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    jax.clear_caches()
    np.testing.assert_array_equal(got, want)


def test_pallas_rowspan_labels_reduce(rng, monkeypatch):
    """RSPAN under labels_reduce=2 + filter images (the flagship layered
    operating point's per-layer configuration)."""
    import jax

    monkeypatch.setattr(fep, "_RSPAN", 3)
    jax.clear_caches()
    depth = fixtures.random_depth_image(rng, 1, 48, 256)
    forest = fixtures.random_forest_flat(rng, 2, 6, 4)
    tables, meta = fep.pack_tables_pallas(forest)
    filt = (np.asarray(depth)[:, ::2, ::2] > 1000).astype(np.uint16)
    want = oracle.eval_forest(
        depth, forest, 6, 4, labels_reduce=2, filter_images=filt,
        filter_class=1,
    )
    got = np.asarray(fep.evaluate_forest_pallas(
        depth, tables, meta, labels_reduce=2,
        filter_images=jnp.asarray(filt), filter_class=1, interpret=True,
    ))
    jax.clear_caches()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("span,wspan", [(1, 2), (2, 2), (4, 2), (2, 3)])
def test_pallas_rect_serving(rng, monkeypatch, span, wspan):
    """Rectangle serving (B3D_EVAL_RSPAN x B3D_EVAL_WSPAN): parity incl.
    the chunk-wrap gate (ids whose c+g passes the plane edge alias a
    different real cell and must be left to a later trip)."""
    import jax

    monkeypatch.setattr(fep, "_RSPAN", span)
    monkeypatch.setattr(fep, "_WSPAN", wspan)
    jax.clear_caches()
    depth = fixtures.random_depth_image(rng, 2, 40, 272)
    forest = fixtures.random_forest_flat(rng, 2, 7, 5)
    tables, meta = fep.pack_tables_pallas(forest)
    want = oracle.eval_forest(depth, forest, 7, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    jax.clear_caches()
    np.testing.assert_array_equal(got, want)


def test_pallas_cspan_table_sweeps(rng, monkeypatch):
    """Adjacent-chunk table serving (B3D_EVAL_CSPAN=2): the batched
    comps/pdf sweeps serve chunks m..m+1 per trip; needs a deep forest so
    both node and leaf tables span multiple chunks."""
    import jax

    monkeypatch.setattr(fep, "_CSPAN", 2)
    jax.clear_caches()
    depth = fixtures.random_depth_image(rng, 1, 32, 144)
    forest = fixtures.random_forest_flat(rng, 2, 9, 5, leaf_prob=0.2)
    tables, meta = fep.pack_tables_pallas(forest)
    assert meta[4] > 128, "fixture too shallow for a multi-chunk leaf table"
    want = oracle.eval_forest(depth, forest, 9, 5)
    got = np.asarray(
        fep.evaluate_forest_pallas(depth, tables, meta, interpret=True)
    )
    jax.clear_caches()
    np.testing.assert_array_equal(got, want)
