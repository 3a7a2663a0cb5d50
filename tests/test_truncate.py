"""Depth-truncation refit (scripts/truncate_fine.py): the refit walk must
reproduce the REAL trainer's terminal pdfs (same histograms over the same
pixels), and truncated models must stay valid forests."""
import numpy as np
import pytest

from beats3d_tpu.data.dataset import ArrayDataset
from beats3d_tpu.models.forest import PackedForest
from beats3d_tpu.ops.forest_eval import evaluate_forest
from beats3d_tpu.train import train_forest

from scripts.truncate_fine import pdf_check, refit_counts, truncate


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(42)
    n, h, w, c = 6, 24, 32, 4
    depth = rng.integers(600, 2400, (n, h, w)).astype(np.uint16)
    # depth-correlated labels so splits find real structure (and some
    # nodes hit the 99.9% cutoff while others stay mixed)
    labels = ((depth // 500) % (c - 1) + 1).astype(np.uint16)
    labels[depth > 2100] = 0
    ds = ArrayDataset(depth, labels, c, images_per_block=3)
    forest = train_forest(
        ds, ds, num_random_features=16, proposals_per_block=8,
        images_per_block=3, max_tree_depth=6, trees_in_forest=2,
        trees_to_try=2, rng=np.random.default_rng(5), log=lambda *a: None)
    return forest.data, depth, labels.astype(np.int64)


def _acc(flat, depth, labels):
    import jax.numpy as jnp

    tables = PackedForest.from_flat(flat).tables()
    out = np.asarray(evaluate_forest(jnp.asarray(depth), tables))
    m = labels > 0
    return float((out[m] == labels[m]).mean())


def test_refit_reproduces_trainer_pdfs(trained):
    """At level dt-1 the original tree has REAL terminal leaves whose
    stored pdfs the trainer computed from training histograms; the refit
    walk must land the same pixels in the same leaves and reproduce those
    pdfs (proves feature math + traversal + pixel eligibility all match)."""
    flat, depth, labels = trained
    mixed_any = False
    checked_any = False
    for dt in (6, 5, 4, 3):
        _, vcounts = refit_counts(flat, dt, depth, labels, chunk=3)
        chk = pdf_check(flat, dt, vcounts)
        if chk["checked"]:
            checked_any = True
            # cutoff one-hots: trainer rounded a >=99.9% histogram to 1.0
            assert chk["dev_cutoff"] <= 1e-3 + 1e-6, (dt, chk)
            assert chk["bad_leaves"] == 0, (dt, chk)
        if chk["mixed"]:
            mixed_any = True
            assert chk["dev_mixed"] < 1e-6, (dt, chk)
    assert checked_any
    assert mixed_any  # the final level must carry mixed frac leaves


def test_truncate_full_depth_is_identity(trained):
    flat, depth, labels = trained
    dt = 6  # == trained depth: nothing descends past the last level
    counts, _ = refit_counts(flat, dt, depth, labels, chunk=3)
    assert counts.sum() == 0
    trunc, empty = truncate(flat, dt, counts)
    np.testing.assert_array_equal(trunc, flat)
    assert empty == 0


def test_truncated_model_valid_and_close(trained):
    flat, depth, labels = trained
    base = _acc(flat, depth, labels)
    prev = 1.0
    for dt in (5, 4):
        counts, _ = refit_counts(flat, dt, depth, labels, chunk=3)
        trunc, _ = truncate(flat, dt, counts)
        assert trunc.shape[1] == (1 << dt) - 1
        # no descending branches remain at the new last level
        last = trunc[:, (1 << (dt - 1)) - 1 :]
        assert (np.floor(last[:, :, 5:7]) != -1).all()
        # pdfs on the refit leaves are normalized (or all-zero for empty)
        acc = _acc(trunc, depth, labels)
        assert acc <= prev + 1e-9
        assert acc > base - 0.35  # shallow but not broken
        prev = acc
    assert base > 0.6  # the toy problem is learnable at D=6