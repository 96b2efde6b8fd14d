import numpy as np
import jax

from detectorch_tpu.ops import nms as N
from tests.oracles import np_nms
from tests.test_boxes import random_boxes


def _run_nms(boxes, scores, max_out, thresh, valid=None):
    idx, ok = N.nms(boxes, scores, max_out=max_out, iou_thresh=thresh, valid=valid)
    idx = np.asarray(idx)
    ok = np.asarray(ok)
    return idx[ok]


def test_nms_matches_cython_oracle(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 200, size=200.0)
        scores = rng.uniform(size=200).astype(np.float32)
        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        expected = np_nms(dets, 0.5)
        got = _run_nms(boxes, scores, max_out=200, thresh=0.5)
        np.testing.assert_array_equal(got, expected)


def test_nms_suppress_at_equal_iou():
    # the Cython loop suppresses at IoU >= thresh (pyx:84) — exact equality
    boxes = np.array([[0, 0, 9, 9], [0, 0, 9, 9]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    got = _run_nms(boxes, scores, max_out=2, thresh=1.0)
    np.testing.assert_array_equal(got, [0])


def test_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 50, size=100.0)
    scores = rng.uniform(size=50).astype(np.float32)
    valid = np.zeros(50, bool)
    valid[:10] = True
    got = _run_nms(boxes, scores, max_out=50, thresh=0.5, valid=valid)
    assert set(got.tolist()) <= set(range(10))
    expected = np_nms(
        np.hstack([boxes[:10], scores[:10, None]]).astype(np.float32), 0.5
    )
    np.testing.assert_array_equal(got, expected)


def test_nms_max_out_truncation(rng):
    boxes = random_boxes(rng, 100, size=2000.0)  # spread out, few suppressions
    scores = rng.uniform(size=100).astype(np.float32)
    got_idx, got_ok = N.nms(boxes, scores, max_out=5, iou_thresh=0.5)
    assert got_idx.shape == (5,)
    full = np_nms(np.hstack([boxes, scores[:, None]]).astype(np.float32), 0.5)
    np.testing.assert_array_equal(np.asarray(got_idx)[np.asarray(got_ok)], full[:5])


def test_batched_nms_vmap(rng):
    boxes = np.stack([random_boxes(rng, 40, 150.0) for _ in range(3)])
    scores = rng.uniform(size=(3, 40)).astype(np.float32)
    idx, ok = N.batched_nms(boxes, scores, max_out=40, iou_thresh=0.5)
    for b in range(3):
        expected = np_nms(
            np.hstack([boxes[b], scores[b][:, None]]).astype(np.float32), 0.5
        )
        got = np.asarray(idx[b])[np.asarray(ok[b])]
        np.testing.assert_array_equal(got, expected)


def test_blocked_matches_loop_and_oracle(rng):
    # the blocked formulation must be bit-identical to the sequential greedy
    for n, thresh, size in [(300, 0.5, 150.0), (700, 0.7, 400.0), (130, 0.3, 80.0)]:
        boxes = random_boxes(rng, n, size=size)  # dense overlaps
        scores = rng.uniform(size=n).astype(np.float32)
        expected = np_nms(np.hstack([boxes, scores[:, None]]).astype(np.float32), thresh)
        idx, ok = N.nms_blocked(boxes, scores, max_out=n, iou_thresh=thresh)
        got = np.asarray(idx)[np.asarray(ok)]
        np.testing.assert_array_equal(got, expected, err_msg=f"n={n} t={thresh}")


def test_blocked_with_valid_mask_and_truncation(rng):
    boxes = random_boxes(rng, 500, size=300.0)
    scores = rng.uniform(size=500).astype(np.float32)
    valid = rng.uniform(size=500) > 0.3
    expected = np_nms(
        np.hstack([boxes[valid], scores[valid][:, None]]).astype(np.float32), 0.5
    )
    orig_idx = np.where(valid)[0]
    idx, ok = N.nms_blocked(boxes, scores, max_out=10, iou_thresh=0.5, valid=valid)
    got = np.asarray(idx)[np.asarray(ok)]
    np.testing.assert_array_equal(got, orig_idx[expected][:10])


def test_blocked_max_out_exceeds_n(rng):
    boxes = random_boxes(rng, 40, size=2000.0)
    scores = rng.uniform(size=40).astype(np.float32)
    idx, ok = N.nms_blocked(boxes, scores, max_out=300, iou_thresh=0.5)
    assert idx.shape == (300,)
    expected = np_nms(np.hstack([boxes, scores[:, None]]).astype(np.float32), 0.5)
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(ok)], expected)


def test_blocked_vmaps(rng):
    import jax

    boxes = np.stack([random_boxes(rng, 256, 120.0) for _ in range(4)])
    scores = rng.uniform(size=(4, 256)).astype(np.float32)
    fn = jax.vmap(lambda b, s: N.nms_blocked(b, s, max_out=50, iou_thresh=0.5))
    idx, ok = fn(boxes, scores)
    for i in range(4):
        expected = np_nms(
            np.hstack([boxes[i], scores[i][:, None]]).astype(np.float32), 0.5
        )[:50]
        np.testing.assert_array_equal(np.asarray(idx[i])[np.asarray(ok[i])], expected)


def test_nms_jits(rng):
    boxes = random_boxes(rng, 64, 100.0)
    scores = rng.uniform(size=64).astype(np.float32)
    fn = jax.jit(lambda b, s: N.nms(b, s, max_out=32, iou_thresh=0.5))
    idx, ok = fn(boxes, scores)
    assert idx.shape == (32,)


def test_soft_nms_matches_cython_oracle(rng):
    from tests.oracles import np_soft_nms

    for method_name, method_id in [("linear", 1), ("gaussian", 2), ("hard", 0)]:
        boxes = random_boxes(rng, 60, size=150.0)
        scores = rng.uniform(0.1, 1.0, 60).astype(np.float32)
        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        exp_boxes, exp_inds = np_soft_nms(
            dets, sigma=0.5, Nt=0.3, threshold=0.01, method=method_id
        )
        idx, sc, ok = N.soft_nms(
            boxes, scores, max_out=60, sigma=0.5, overlap_thresh=0.3,
            score_thresh=0.01, method=method_name,
        )
        okm = np.asarray(ok)
        got_inds = np.asarray(idx)[okm]
        got_scores = np.asarray(sc)[okm]
        # oracle output is in pick order too (swap-to-front loop)
        np.testing.assert_array_equal(got_inds, exp_inds, err_msg=method_name)
        np.testing.assert_allclose(
            got_scores, exp_boxes[:, 4], rtol=1e-4, atol=1e-5,
            err_msg=method_name,
        )


def test_soft_nms_linear_decays_scores():
    boxes = np.array(
        [[0, 0, 9, 9], [1, 1, 10, 10], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, s, ok = N.soft_nms(
        boxes, scores, max_out=3, sigma=0.5, overlap_thresh=0.3,
        score_thresh=0.001, method="linear",
    )
    idx, s, ok = np.asarray(idx), np.asarray(s), np.asarray(ok)
    assert ok.all()
    assert idx[0] == 0 and s[0] == np.float32(0.9)
    # distant box keeps its score, overlapped one decays below it
    assert idx[1] == 2 and s[1] == np.float32(0.7)
    assert idx[2] == 1 and s[2] < 0.8


def test_nms_topk_prefilter_exact_and_flag(rng):
    """postprocess_detections with nms_topk_prefilter=M produces IDENTICAL
    detections to the full per-class NMS whenever every class has <= M
    above-threshold candidates (incl. tie order — top_k's (desc score,
    asc idx) ordering puts tied higher-original-indices at higher subset
    positions, exactly where the blocked NMS picks first), and flags
    nms_exact=False when a class overflows M."""
    from detectorch_tpu.config import TestConfig
    from detectorch_tpu.eval.postprocess import postprocess_detections

    n, c = 400, 81
    rois = np.zeros((n, 4), np.float32)
    x1 = rng.uniform(0, 500, n); y1 = rng.uniform(0, 300, n)
    rois[:, 0], rois[:, 1] = x1, y1
    rois[:, 2] = x1 + rng.uniform(8, 120, n)
    rois[:, 3] = y1 + rng.uniform(8, 120, n)
    deltas = (rng.randn(n, 4 * c) * 0.2).astype(np.float32)
    # sparse confident classes + deliberate score TIES
    scores = rng.uniform(0.0, 0.04, (n, c)).astype(np.float32)
    for cls in [3, 17, 42]:
        idx = rng.choice(n, 30, replace=False)
        scores[idx, cls] = rng.uniform(0.06, 0.9, 30).astype(np.float32)
    scores[10, 3] = scores[11, 3] = scores[12, 3] = np.float32(0.5)  # ties
    valid = np.ones(n, bool)

    full = postprocess_detections(
        scores, deltas, rois, valid, 1.0, 300.0, 500.0,
        TestConfig(nms_topk_prefilter=0), c,
    )
    pre = postprocess_detections(
        scores, deltas, rois, valid, 1.0, 300.0, 500.0,
        TestConfig(nms_topk_prefilter=64), c,
    )
    assert bool(pre.nms_exact)
    np.testing.assert_array_equal(np.asarray(full.valid), np.asarray(pre.valid))
    ok = np.asarray(full.valid)
    np.testing.assert_array_equal(np.asarray(full.classes)[ok],
                                  np.asarray(pre.classes)[ok])
    np.testing.assert_array_equal(np.asarray(full.scores)[ok],
                                  np.asarray(pre.scores)[ok])
    np.testing.assert_array_equal(np.asarray(full.boxes)[ok],
                                  np.asarray(pre.boxes)[ok])

    # overflow: one class with MORE above-threshold candidates than M
    scores_of = scores.copy()
    scores_of[:, 7] = rng.uniform(0.06, 0.9, n).astype(np.float32)
    pre_of = postprocess_detections(
        scores_of, deltas, rois, valid, 1.0, 300.0, 500.0,
        TestConfig(nms_topk_prefilter=64), c,
    )
    assert not bool(pre_of.nms_exact)
