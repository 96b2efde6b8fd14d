"""On-device detection postprocessing: per-class NMS + global top-K.

Reference ``lib/utils/result_utils.py:76-168`` does this on the host with
numpy + Cython NMS over variable-length per-class lists. Here it is one
fixed-shape device program:

  * unscale rois by im_scale, decode per-class deltas (weights 10,10,5,5),
    clip to the original image (result_utils.py:83-89);
  * per class j in 1..C-1 (one vmapped NMS over the class axis): mask scores
    <= 0.05, NMS@0.5, keep up to k+slack per class — exact, because the
    global cap below can never admit more than its own k+slack slots from
    one class;
  * global cap across classes: keep everything >= the `detections_per_img`
    (100)-th largest score — ties at the threshold all survive, exactly as
    result_utils.py:160-166 (see the inline comment on the slack).

Output is a padded (K, ...) detection set with a validity mask, which feeds
the mask head *inside the same jit program*.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from detectorch_tpu.config import TestConfig
from detectorch_tpu.ops import boxes as box_ops
from detectorch_tpu.ops import nms as nms_ops


class Detections(NamedTuple):
    boxes: jax.Array    # (K, 4) fp32, original-image coords
    scores: jax.Array   # (K,)
    classes: jax.Array  # (K,) int32 (1..num_classes-1)
    valid: jax.Array    # (K,) bool
    # () bool: False iff the nms_topk_prefilter truncated a class that had
    # MORE above-threshold candidates than the prefilter width — the one
    # case where the result may differ from full per-class NMS. The engine
    # re-runs such images through the exact program (same architecture as
    # the Pallas slab-overflow rerun).
    nms_exact: jax.Array = True


def decode_boxes(rois, bbox_deltas, im_scale, orig_h, orig_w, test_cfg: TestConfig):
    """rois (N,4 scaled coords) + deltas (N,4C) -> per-class boxes (N,C,4)
    in original-image coords, clipped."""
    boxes = rois / im_scale
    pred = box_ops.bbox_transform(boxes, bbox_deltas, test_cfg.bbox_reg_weights)
    pred = box_ops.clip_boxes(pred, orig_h, orig_w)
    n = rois.shape[0]
    return pred.reshape(n, -1, 4)


def postprocess_detections(
    cls_scores,
    bbox_deltas,
    rois,
    roi_valid,
    im_scale,
    orig_h,
    orig_w,
    test_cfg: TestConfig,
    num_classes: int = 81,
) -> Detections:
    """cls_scores (N, C) softmax probs; bbox_deltas (N, 4C); rois (N, 4) in
    network-input (scaled) coords; roi_valid (N,) bool."""
    pred = decode_boxes(rois, bbox_deltas, im_scale, orig_h, orig_w, test_cfg)
    return postprocess_decoded(cls_scores, pred, roi_valid, test_cfg, num_classes)


def postprocess_decoded(
    cls_scores,
    pred,
    roi_valid,
    test_cfg: TestConfig,
    num_classes: int = 81,
) -> Detections:
    """Threshold/NMS/cap over ALREADY-DECODED per-class boxes.

    cls_scores (N, C) softmax probs; pred (N, C, 4) original-image-coordinate
    clipped boxes (decode_boxes output); roi_valid (N,) bool. Split out of
    postprocess_detections so multi-scale inference can union candidates
    decoded at different im_scales and run the reference NMS/cap once over
    the union (Detectron TEST.BBOX_AUG union heuristic; engine
    run_image_multiscale)."""
    k = test_cfg.detections_per_img
    # per-class NMS keeps up to k_pad: the global >=threshold cap below can
    # admit more than k detections from ONE class when scores tie at the
    # threshold, but never more than k_pad (its own slot count)
    k_pad = k + test_cfg.detections_tie_slack

    # drop background class 0; axes become (C-1, N, ...)
    cls_boxes = jnp.transpose(pred[:, 1:, :], (1, 0, 2))
    cls_sc = jnp.transpose(cls_scores[:, 1:], (1, 0))
    # reference threshold is scores > score_thresh (result_utils.py:131)
    valid = roi_valid[None, :] & (cls_sc > test_cfg.score_thresh)

    nms_exact = jnp.bool_(True)
    if test_cfg.soft_nms:
        def one_class(b, s, v):
            idx, sc, ok = nms_ops.soft_nms(
                b, s, max_out=k_pad, sigma=test_cfg.soft_nms_sigma,
                overlap_thresh=test_cfg.nms_thresh, score_thresh=0.0001,
                method=test_cfg.soft_nms_method, valid=v,
            )
            return idx, sc, ok

        keep_idx, keep_scores, keep_ok = jax.vmap(one_class)(cls_boxes, cls_sc, valid)
    elif (test_cfg.nms_topk_prefilter
          and cls_sc.shape[1] > test_cfg.nms_topk_prefilter):
        # Per-class top-M prefilter: with score_thresh 0.05 a trained
        # detector has a handful of candidates per class, so NMS over the
        # top M by score equals NMS over all N — EXACTLY, whenever every
        # class has <= M above-threshold candidates (the full candidate
        # set is then present, and the processing order is unchanged:
        # lax.top_k orders (desc score, asc index), so among ties the
        # higher original index lands at the higher subset position —
        # which is precisely the position the blocked NMS processes first,
        # reproducing the reference's argsort()[::-1] tie order). The
        # nms_exact flag goes False iff some class exceeded M; the engine
        # re-runs those images through the full-NMS program.
        m = test_cfg.nms_topk_prefilter
        sv = jnp.where(valid, cls_sc, -jnp.inf)
        top_s, top_i = jax.lax.top_k(sv, m)                    # (C-1, m)
        top_b = jnp.take_along_axis(cls_boxes, top_i[..., None], axis=1)
        keep_m, keep_ok = nms_ops.batched_nms(
            top_b, top_s, max_out=k_pad, iou_thresh=test_cfg.nms_thresh,
            valid=top_s > -jnp.inf,
        )
        keep_idx = jnp.take_along_axis(top_i, keep_m, axis=1)
        keep_scores = jnp.take_along_axis(cls_sc, keep_idx, axis=1)
        nms_exact = jnp.all(jnp.sum(valid, axis=1) <= m)
    else:
        keep_idx, keep_ok = nms_ops.batched_nms(
            cls_boxes, cls_sc, max_out=k_pad, iou_thresh=test_cfg.nms_thresh, valid=valid
        )
        keep_scores = jnp.take_along_axis(cls_sc, keep_idx, axis=1)

    keep_boxes = jnp.take_along_axis(cls_boxes, keep_idx[..., None], axis=1)

    if test_cfg.do_bbox_vote:
        # refine kept boxes by voting with all above-threshold candidates of
        # the class (reference result_utils.py:152-158 + boxes.py:280-329)
        def vote_one(kb, ks, cb, cs, cv):
            return box_ops.box_voting(
                kb, ks, cb, jnp.where(cv, cs, 0.0), cv,
                test_cfg.bbox_vote_thresh, test_cfg.bbox_vote_method,
            )

        keep_boxes, keep_scores = jax.vmap(vote_one)(
            keep_boxes, keep_scores, cls_boxes, cls_sc, valid
        )

    keep_scores = jnp.where(keep_ok, keep_scores, -jnp.inf)

    # Global cap across classes (result_utils.py:160-166). The reference
    # computes image_thresh = k-th largest score and keeps everything
    # >= image_thresh — score TIES at the threshold all survive, so the
    # result can exceed k. Reproduce that with `detections_tie_slack`
    # extra padded slots: select the top k+slack (lax.top_k ties break to
    # the lower flat index = the reference's class-major concat order),
    # then validate by the >= threshold rule. Only ties deeper than the
    # slack (degenerate score collisions) are truncated.
    flat_scores = keep_scores.reshape(-1)
    flat_boxes = keep_boxes.reshape(-1, 4)
    flat_cls = jnp.broadcast_to(
        jnp.arange(1, num_classes, dtype=jnp.int32)[:, None], keep_scores.shape
    ).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k_pad)
    n_dets = jnp.sum(flat_scores > -jnp.inf)
    image_thresh = top_scores[k - 1]  # finite whenever n_dets > k
    ok = jnp.where(n_dets > k, top_scores >= image_thresh, top_scores > -jnp.inf)
    return Detections(
        boxes=flat_boxes[top_idx],
        scores=jnp.where(ok, top_scores, 0.0),
        classes=jnp.where(ok, flat_cls[top_idx], 0),
        valid=ok,
        nms_exact=nms_exact,
    )
