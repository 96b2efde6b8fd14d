"""Tie-break fidelity tests (VERDICT r1 item 5).

The reference's orderings on exactly-equal scores:
  * Cython NMS sorts with scores.argsort()[::-1] (cython_nms.pyx:45) —
    under the stable reading, the HIGHER input index comes first on ties
    (numpy's default introsort only guarantees this below its 16-element
    insertion-sort cutoff; our device NMS pins the stable reading).
  * FPN collect sorts with torch.sort(-scores) (collect_and_distribute_
    fpn_rpn_proposals.py:100-104) — stable ascending on CPU, so ties keep
    the LOWER concat index first.
  * The global 100-cap keeps every detection >= the 100th-largest score
    (result_utils.py:160-166) — ties at the threshold all survive, so the
    kept set can exceed 100.
"""

import numpy as np
import jax.numpy as jnp

from detectorch_tpu.config import TestConfig
from detectorch_tpu.eval.postprocess import postprocess_detections
from detectorch_tpu.models import rpn as rpn_mod
from detectorch_tpu.ops import nms as N
from tests.oracles import np_nms
from tests.test_boxes import random_boxes


def _dets(boxes, scores):
    return np.hstack([boxes, scores[:, None]]).astype(np.float32)


def _kept(fn, boxes, scores, max_out, thresh):
    idx, ok = fn(boxes, scores, max_out=max_out, iou_thresh=thresh)
    return np.asarray(idx)[np.asarray(ok)]


def test_nms_tie_order_small_matches_stable_argsort(rng):
    # the reference's literal tie order is numpy-introsort-dependent (NOT
    # stable even at n=12 — measured), i.e. unspecified; both formulations
    # must agree on the pinned stable reading (higher index first)
    for trial in range(20):
        boxes = random_boxes(rng, 12, size=60.0)
        scores = rng.choice([0.2, 0.5, 0.9], size=12).astype(np.float32)
        expected = np_nms(_dets(boxes, scores), 0.5, kind="stable")
        for fn in (N.nms_loop, N.nms_blocked):
            got = _kept(fn, boxes, scores, 12, 0.5)
            np.testing.assert_array_equal(got, expected, err_msg=fn.__name__)


def test_nms_tie_order_large_matches_stable_argsort(rng):
    # heavy quantised ties at N=400: pin to the stable reading of
    # argsort()[::-1] (higher input index first among equal scores)
    boxes = random_boxes(rng, 400, size=250.0)
    scores = rng.choice(np.linspace(0.1, 1.0, 8), size=400).astype(np.float32)
    expected = np_nms(_dets(boxes, scores), 0.5, kind="stable")
    for fn in (N.nms_loop, N.nms_blocked):
        got = _kept(fn, boxes, scores, 400, 0.5)
        np.testing.assert_array_equal(got, expected, err_msg=fn.__name__)


def test_nms_duplicate_boxes_identical_scores(rng):
    # exactly duplicated (box, score) pairs — e.g. padded duplicates: the
    # higher-index copy is picked first and suppresses the lower-index one
    base = random_boxes(rng, 30, size=100.0)
    boxes = np.concatenate([base, base], axis=0)
    scores = np.concatenate([np.full(30, 0.7), np.full(30, 0.7)]).astype(np.float32)
    expected = np_nms(_dets(boxes, scores), 0.5, kind="stable")
    assert (expected >= 30).all()  # sanity: the duplicates (higher idx) win
    for fn in (N.nms_loop, N.nms_blocked):
        got = _kept(fn, boxes, scores, 60, 0.5)
        np.testing.assert_array_equal(got, expected, err_msg=fn.__name__)


def test_collect_tie_order_matches_stable_torch_sort(rng):
    # reference collect: torch.sort(-scores) is stable ascending on CPU, so
    # equal scores keep concat (level-major) order — lower flat index first
    n_lvl, per = 3, 50
    props = []
    all_scores = []
    for lvl in range(n_lvl):
        b = random_boxes(rng, per, size=200.0)
        s = rng.choice([0.25, 0.5, 0.75], size=per).astype(np.float32)
        props.append(
            rpn_mod.Proposals(
                boxes=jnp.asarray(b), scores=jnp.asarray(s),
                valid=jnp.ones(per, bool),
            )
        )
        all_scores.append(s)
    flat = np.concatenate(all_scores)
    top_n = 40
    expected = np.argsort(-flat, kind="stable")[:top_n]
    out = rpn_mod.collect_proposals(props, post_nms_top_n=top_n)
    flat_boxes = np.concatenate([np.asarray(p.boxes) for p in props])
    assert np.asarray(out.valid).all()
    np.testing.assert_array_equal(np.asarray(out.boxes), flat_boxes[expected])
    np.testing.assert_array_equal(np.asarray(out.scores), flat[expected])


def _np_global_cap(scores_by_class, k):
    """reference result_utils.py:160-166: keep all >= the k-th largest."""
    flat = np.concatenate(scores_by_class)
    if len(flat) <= k:
        return sorted(flat, reverse=True)
    thresh = np.sort(flat)[-k]
    return sorted(flat[flat >= thresh], reverse=True)


def test_global_cap_keeps_threshold_ties(rng):
    # craft detections where scores TIE exactly at the k-th position: the
    # kept set must exceed k, matching the reference's >= image_thresh rule
    k, slack, n, c = 4, 4, 12, 3  # 2 foreground classes
    cfg = TestConfig(detections_per_img=k, detections_tie_slack=slack)
    # non-overlapping boxes so per-class NMS keeps everything
    rois = np.array(
        [[i * 50.0, 0.0, i * 50.0 + 20.0, 20.0] for i in range(n)], np.float32
    )
    scores = np.zeros((n, c), np.float32)
    # class 1: 0.9, 0.8 then two ties at 0.5; class 2: 0.7 and two 0.5 ties
    scores[:4, 1] = [0.9, 0.8, 0.5, 0.5]
    scores[6:9, 2] = [0.7, 0.5, 0.5]
    deltas = np.zeros((n, 4 * c), np.float32)
    dets = postprocess_detections(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(rois),
        jnp.ones(n, bool), jnp.float32(1.0), jnp.float32(600.0),
        jnp.float32(600.0), cfg, num_classes=c,
    )
    got = np.sort(np.asarray(dets.scores)[np.asarray(dets.valid)])[::-1]
    expected = _np_global_cap([scores[:4, 1], scores[6:9, 2]], k)
    # 4th largest is 0.5 -> every 0.5 tie survives: 7 detections, not 4
    assert len(expected) == 7
    np.testing.assert_allclose(got, expected)
    assert dets.boxes.shape[0] == k + slack


def test_global_cap_no_ties_exact_topk(rng):
    # distinct scores: plain top-k, padded slots invalid
    k, n, c = 4, 10, 3
    cfg = TestConfig(detections_per_img=k, detections_tie_slack=4)
    rois = np.array(
        [[i * 50.0, 0.0, i * 50.0 + 20.0, 20.0] for i in range(n)], np.float32
    )
    scores = np.zeros((n, c), np.float32)
    scores[:, 1] = np.linspace(0.9, 0.1, n)
    deltas = np.zeros((n, 4 * c), np.float32)
    dets = postprocess_detections(
        jnp.asarray(scores), jnp.asarray(deltas), jnp.asarray(rois),
        jnp.ones(n, bool), jnp.float32(1.0), jnp.float32(600.0),
        jnp.float32(600.0), cfg, num_classes=c,
    )
    valid = np.asarray(dets.valid)
    assert valid.sum() == k
    np.testing.assert_allclose(
        np.asarray(dets.scores)[valid], scores[:k, 1], rtol=1e-6
    )
