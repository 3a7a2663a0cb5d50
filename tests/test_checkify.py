"""Sanitizer lane: jax.experimental.checkify over the hot kernels.

SURVEY.md §5.2: the reference has no race detector — CUDA correctness rides on
atomics + __syncthreads.  The TPU build is deterministic by construction, and
this lane adds the promised invariant pass: checkify's automatic index / NaN /
div-by-zero checks instrument every gather, scatter, and float op inside the
jitted kernels, so an out-of-bounds probe offset or a NaN escaping the label
path fails a test instead of silently clamping (XLA's default gather mode).

Reference spec anchors: probe clamping `src/cuda/decision_tree_common.hpp:8-28`
(OOB reads must resolve to the 65535 sentinel, never to a wrapped index),
mean shift divide-by-weight `src/cuda/mean_shift.cu:32-46`.
"""

import numpy as np

import fixtures

import jax
import jax.numpy as jnp
from jax.experimental import checkify

CHECKS = checkify.index_checks | checkify.float_checks


def _assert_clean(err):
    msg = err.get()
    assert msg is None, msg


def test_forest_eval_no_oob_no_nan(rng):
    """Random forest over depth with 0/65535 sentinels: every probe gather
    must stay in bounds and the pdf path must stay finite."""
    from beats3d_tpu.models.forest import DecisionForest
    from beats3d_tpu.ops import forest_eval

    flat = fixtures.random_forest_flat(rng, 3, 5, 4)
    tables = DecisionForest(3, 5, 4, flat).pack().tables()
    depth = jnp.asarray(fixtures.random_depth_image(rng, 1, 32, 48))

    fn = checkify.checkify(
        lambda d: forest_eval.evaluate_forest(d, tables), errors=CHECKS)
    err, labels = jax.jit(fn)(depth)
    _assert_clean(err)
    lab = np.asarray(labels)
    evaluated = lab != 65535
    assert evaluated.any()
    assert lab[evaluated].max() < 4


def test_composite_labels_index_safe(rng):
    """The conditions-table walk is a chain of dependent gathers; checkify
    proves the NEXT_IMG_OFFSET hops stay inside the label-image stack."""
    from beats3d_tpu.ops import forest_eval

    label_images = jnp.asarray(
        rng.integers(0, 4, size=(2, 16, 24)).astype(np.uint16))
    conditions = jnp.asarray(
        np.array([[1, 2], [0, 1], [0, 2], [0, 3]], np.int32))
    fn = checkify.checkify(
        lambda li: forest_eval.composite_labels(li, conditions),
        errors=CHECKS)
    err, out = jax.jit(fn)(label_images)
    _assert_clean(err)
    assert np.asarray(out).shape == (16, 24)


def test_mean_shift_checks(rng):
    """All classes present: no intermediate may divide by zero or go NaN
    (reference mean_shift.cu:40-46 divides by the weight sum)."""
    from beats3d_tpu.ops import meanshift

    labels = np.zeros((40, 64), np.uint16)
    labels[5:15, 5:15] = 1
    labels[20:30, 20:30] = 2
    labels[30:38, 40:60] = 3
    variances = jnp.asarray(np.full((4,), 60.0, np.float32))
    fn = checkify.checkify(
        lambda l: meanshift.mean_shift(l, variances, num_classes=4),
        errors=CHECKS)
    err, out = jax.jit(fn)(jnp.asarray(labels))
    _assert_clean(err)
    out = np.asarray(out)  # row i = class i+1
    assert np.isfinite(out[:3]).all()
    assert np.isnan(out[3]).all()  # absent class keeps the NaN sentinel


def test_plane_calibration_checks(rng):
    from beats3d_tpu.ops import plane, points
    from beats3d_tpu.utils import CameraIntrinsics

    intrin = CameraIntrinsics.d415(106, 60)
    yy, xx = np.mgrid[0:60, 0:106].astype(np.float32)
    depth = (2600.0 - 0.03 * (xx - intrin.ppx) * 8).astype(np.uint16)
    pts = points.deproject_points(
        jnp.asarray(depth), (intrin.ppx, intrin.ppy), intrin.fx)

    def cal(p):
        return plane.calibrate_plane(
            jax.random.PRNGKey(0), p, 40.0, num_candidates=64)

    err, mat = jax.jit(checkify.checkify(cal, errors=CHECKS))(pts)
    _assert_clean(err)
    assert np.isfinite(np.asarray(mat)).all()


def test_components_grouping_checks():
    from beats3d_tpu.ops import components

    depth = jnp.asarray(fixtures.blob_scene())
    fn = checkify.checkify(
        lambda d: components.make_hand_groups(d, 0.02), errors=CHECKS)
    err, out = jax.jit(fn)(depth)
    _assert_clean(err)


def test_full_pipeline_checkified(tmp_path, rng):
    """The whole per-frame dispatch (preproc -> layered eval -> grouping ->
    mean shift -> heights) under index+float sanitizers, XLA backend."""
    from beats3d_tpu.models import LayeredDecisionForest
    from beats3d_tpu.runtime.pipeline import FramePipeline, PipelineConfig
    from beats3d_tpu.utils import CameraIntrinsics

    intrin = CameraIntrinsics.d415(212, 120)
    cfg_path = fixtures.layered_cfg_fixture(str(tmp_path), rng)
    model = LayeredDecisionForest.load(cfg_path, labels_reduce=2)
    pipe = FramePipeline(
        model, intrin,
        cfg=PipelineConfig(height=120, width=212, labels_reduce=2),
        group_min_size=0.02, backend="xla")

    yy, xx = np.mgrid[0:120, 0:212].astype(np.float32)
    n = np.array([0.03, -0.06, 1.0]); n /= np.linalg.norm(n)
    depth = ((2600.0 - n[0] * (xx - intrin.ppx) * 8
              - n[1] * (yy - intrin.ppy) * 8) / n[2])
    r = 34
    for cx in (60, 150):
        depth[(xx - cx) ** 2 + (yy - 60) ** 2 < r * r] -= 300.0
    depth = jnp.asarray(depth.astype(np.uint16))

    from beats3d_tpu.ops import plane as plane_ops
    from beats3d_tpu.ops import points as points_ops
    pts = points_ops.deproject_points(depth, (intrin.ppx, intrin.ppy), intrin.fx)
    mat = plane_ops.CalibratedPlane(6000, 40.0).make(pts)

    fn = checkify.checkify(lambda d, m: pipe(d, m), errors=CHECKS)
    err, out = jax.jit(fn)(depth, mat)
    _assert_clean(err)
    assert np.asarray(out["labels"]).size > 0


def test_checkify_actually_catches():
    """Sanity: the lane is live — a deliberately out-of-bounds dynamic gather
    trips the index check (guards against a silently-disabled errors set)."""
    err, _ = jax.jit(checkify.checkify(
        lambda i: jnp.zeros((4,))[i], errors=CHECKS))(jnp.int32(9))
    assert err.get() is not None


def test_training_histogram_invariants(rng):
    """Training-step sanitizers (VERDICT r3 #6): the reference guards its
    histogram merge with device asserts (tree_train.cu:156,181 — a child
    histogram may never exceed its parent).  Here the same invariants run
    as checkify user checks INSIDE the jitted histogram step, alongside the
    automatic index/NaN instrumentation."""
    from beats3d_tpu.train import make_random_features
    from beats3d_tpu.train.trainer import _histogram_step

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=2, h=16, w=24)
    nodes = np.where(labels > 0, 0, -1).astype(np.int32)
    props = jnp.asarray(make_random_features(8, rng))

    def step(d, l, n, p):
        left, total = _histogram_step(
            d, l, n, p, num_classes=4, w2=1, node_lo=0, chunk=1 << 10,
            use_matmul=True,
        )
        checkify.check(jnp.all(left >= 0), "negative left count")
        checkify.check(
            jnp.all(total[None] - left >= 0),
            "left child exceeds parent: left+right != parent "
            "(tree_train.cu:156,181)",
        )
        return left, total

    fn = checkify.checkify(
        step, errors=CHECKS | checkify.user_checks)
    err, (left, total) = jax.jit(fn)(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes), props)
    _assert_clean(err)
    # cross-check the parent totals against the plain label histogram:
    # bin k counts label k; label 0 (background) is node -1 -> masked out
    want = np.stack([
        0 if k == 0 else np.sum(np.asarray(labels) == k) for k in range(4)
    ])
    np.testing.assert_array_equal(np.asarray(total)[0], want)


def test_training_gini_and_advance_checks(rng):
    """Gain merge + level advance under float/index sanitizers: no NaN
    gains for active nodes, and advanced node ids stay inside the next
    level (tree_train.cu:275-324)."""
    from beats3d_tpu.train import make_random_features
    from beats3d_tpu.train.trainer import (
        _advance_step, _histogram_step, _pick_best_step)

    depth, labels = fixtures.synthetic_hand_dataset(rng, n=2, h=16, w=24)
    nodes = np.where(labels > 0, 0, -1).astype(np.int32)
    props_np = make_random_features(8, rng)
    props = jnp.asarray(props_np)
    left, total = _histogram_step(
        jnp.asarray(depth), jnp.asarray(labels), jnp.asarray(nodes), props,
        num_classes=4, w2=1, node_lo=0, chunk=1 << 10, use_matmul=True)

    active = jnp.asarray(np.array([0], np.int32))
    parent = jnp.asarray(np.asarray(total).astype(np.float32))

    def pick(a, pc, l, t, p):
        g, bp, bl, br = _pick_best_step(
            a, pc, l, t, p,
            jnp.full((1,), -1.0), jnp.zeros((1, 5)), jnp.zeros((1, 4)),
            jnp.zeros((1, 4)), w2=1, parent_lo=0)
        checkify.check(jnp.all(jnp.isfinite(g)), "NaN/inf gain")
        checkify.check(jnp.all(bl + br - pc < 0.5), "left+right != parent")
        return g, bp, bl, br

    fn = checkify.checkify(pick, errors=CHECKS | checkify.user_checks)
    err, (g, bp, bl, br) = jax.jit(fn)(active, parent, left, total, props)
    _assert_clean(err)

    lvl_params = jnp.asarray(np.asarray(bp))
    lvl_status = jnp.asarray(np.full((1, 2), -1, np.int32))

    def adv(d, n, p, s):
        out = _advance_step(d, n, p, s)
        checkify.check(
            jnp.all((out >= -1) & (out < 2)),
            "advanced node id outside the next level",
        )
        return out

    fn2 = checkify.checkify(adv, errors=CHECKS | checkify.user_checks)
    err2, out = jax.jit(fn2)(
        jnp.asarray(depth), jnp.asarray(nodes), lvl_params, lvl_status)
    _assert_clean(err2)
    o = np.asarray(out)
    assert ((o == -1) | (o == 0) | (o == 1)).all()
