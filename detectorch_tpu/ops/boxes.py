"""Box arithmetic in jnp, Detectron "+1" convention.

Semantics mirror reference ``lib/utils/boxes.py`` exactly (the +1
width/height convention ``:28-41``, exp clip log(1000/16) ``:73``, the
asymmetric "-1" in the decoded x2/y2 ``:203-206``) but are written as pure
fixed-shape jnp functions that trace under jit and vmap — these run *inside*
the one-program detection graph, not as host numpy between device calls.

All functions accept boxes in (x1, y1, x2, y2) layout, shape (..., 4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from detectorch_tpu.config import BBOX_XFORM_CLIP


def boxes_area(boxes):
    """Area with the +1 convention (reference boxes.py:75-81)."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w * h


def xywh_to_xyxy(xywh):
    """[x y w h] -> [x1 y1 x2 y2] (+1 convention; reference boxes.py:92-107)."""
    xy = xywh[..., 0:2]
    wh = jnp.maximum(0.0, xywh[..., 2:4] - 1.0)
    return jnp.concatenate([xy, xy + wh], axis=-1)


def xyxy_to_xywh(xyxy):
    """[x1 y1 x2 y2] -> [x y w h] (+1 convention; reference boxes.py:110-123)."""
    xy = xyxy[..., 0:2]
    wh = xyxy[..., 2:4] - xy + 1.0
    return jnp.concatenate([xy, wh], axis=-1)


def clip_boxes(boxes, height, width):
    """Clip to [0, w-1] x [0, h-1] (reference boxes.py:134-138).

    Works on (..., 4) and on tiled (..., 4*K) layouts (clip_tiled_boxes,
    reference boxes.py:150-165) because the pattern repeats every 4 columns.
    """
    shape = boxes.shape
    b = boxes.reshape(shape[:-1] + (-1, 4))
    x1 = jnp.clip(b[..., 0], 0.0, width - 1.0)
    y1 = jnp.clip(b[..., 1], 0.0, height - 1.0)
    x2 = jnp.clip(b[..., 2], 0.0, width - 1.0)
    y2 = jnp.clip(b[..., 3], 0.0, height - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


def bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """Decode regression deltas into boxes (reference boxes.py:168-208).

    boxes: (..., N, 4) anchors/proposals; deltas: (..., N, 4*K) per-class
    deltas. Returns (..., N, 4*K) decoded boxes. The "-1" on x2/y2 and the
    exp clip are load-bearing for AP parity.
    """
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    shape = deltas.shape
    d = deltas.reshape(shape[:-1] + (-1, 4))
    wx, wy, ww, wh = weights
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(d[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w - 1.0,
            pred_ctr_y + 0.5 * pred_h - 1.0,
        ],
        axis=-1,
    )
    return out.reshape(shape)


def bbox_transform_inv_np(boxes, gt_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Pure-numpy target encoding for HOST-side data prep (roidb target
    precompute, roi sampler): identical formula to `bbox_transform_inv`
    below, but never touches the device — on a remote/tunneled backend a
    stray jnp call from a loader path costs a full RPC round trip (and can
    hang the loop if the backend wedges)."""
    boxes = np.asarray(boxes, np.float32)
    gt_boxes = np.asarray(gt_boxes, np.float32)
    ex_w = boxes[..., 2] - boxes[..., 0] + 1.0
    ex_h = boxes[..., 3] - boxes[..., 1] + 1.0
    ex_cx = boxes[..., 0] + 0.5 * ex_w
    ex_cy = boxes[..., 1] + 0.5 * ex_h
    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0] + 1.0
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1] + 1.0
    gt_cx = gt_boxes[..., 0] + 0.5 * gt_w
    gt_cy = gt_boxes[..., 1] + 0.5 * gt_h
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * np.log(gt_w / ex_w),
            wh * np.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def bbox_transform_inv(boxes, gt_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode regression targets (reference boxes.py:211-242)."""
    ex_w = boxes[..., 2] - boxes[..., 0] + 1.0
    ex_h = boxes[..., 3] - boxes[..., 1] + 1.0
    ex_cx = boxes[..., 0] + 0.5 * ex_w
    ex_cy = boxes[..., 1] + 0.5 * ex_h

    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0] + 1.0
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1] + 1.0
    gt_cx = gt_boxes[..., 0] + 0.5 * gt_w
    gt_cy = gt_boxes[..., 1] + 0.5 * gt_h

    wx, wy, ww, wh = weights
    return jnp.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * jnp.log(gt_w / ex_w),
            wh * jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def bbox_overlaps(boxes, query_boxes):
    """Dense (N, K) IoU matrix, +1 convention (reference
    lib/utils_cython/cython_bbox.pyx:32-73, vectorized)."""
    area_q = (query_boxes[..., 2] - query_boxes[..., 0] + 1.0) * (
        query_boxes[..., 3] - query_boxes[..., 1] + 1.0
    )
    area_b = (boxes[..., 2] - boxes[..., 0] + 1.0) * (
        boxes[..., 3] - boxes[..., 1] + 1.0
    )
    iw = (
        jnp.minimum(boxes[..., :, None, 2], query_boxes[..., None, :, 2])
        - jnp.maximum(boxes[..., :, None, 0], query_boxes[..., None, :, 0])
        + 1.0
    )
    ih = (
        jnp.minimum(boxes[..., :, None, 3], query_boxes[..., None, :, 3])
        - jnp.maximum(boxes[..., :, None, 1], query_boxes[..., None, :, 1])
        + 1.0
    )
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    union = area_b[..., :, None] + area_q[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_one_to_many(box, boxes):
    """IoU of a single box (4,) against (N, 4) — the inner step of greedy NMS."""
    area1 = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    areas = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    iw = jnp.maximum(
        0.0, jnp.minimum(box[2], boxes[:, 2]) - jnp.maximum(box[0], boxes[:, 0]) + 1.0
    )
    ih = jnp.maximum(
        0.0, jnp.minimum(box[3], boxes[:, 3]) - jnp.maximum(box[1], boxes[:, 1]) + 1.0
    )
    inter = iw * ih
    return inter / (area1 + areas - inter)


def expand_boxes(boxes, scale):
    """Scale boxes about their center (reference boxes.py:245-261).

    Note: this one deliberately does NOT use the +1 convention (matches the
    reference, which feeds it mask pasting ref-boxes).
    """
    w_half = (boxes[..., 2] - boxes[..., 0]) * 0.5 * scale
    h_half = (boxes[..., 3] - boxes[..., 1]) * 0.5 * scale
    x_c = (boxes[..., 2] + boxes[..., 0]) * 0.5
    y_c = (boxes[..., 3] + boxes[..., 1]) * 0.5
    return jnp.stack(
        [x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half], axis=-1
    )


def flip_boxes(boxes, im_width):
    """Horizontal flip (reference boxes.py:264-269)."""
    x1 = im_width - boxes[..., 2] - 1.0
    x2 = im_width - boxes[..., 0] - 1.0
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def box_voting(top_boxes, top_scores, all_boxes, all_scores, all_valid,
               thresh: float, scoring_method: str = "ID", beta: float = 1.0):
    """Box voting (reference boxes.py:280-329) as a fixed-shape device op.

    Each kept box is replaced by the score-weighted average of all candidate
    boxes overlapping it with IoU >= thresh. Scoring methods: ID (keep),
    TEMP_AVG, AVG, IOU_AVG, GENERALIZED_AVG, QUASI_SUM — the full reference
    enumeration.

    top_boxes (K, 4), all_boxes (N, 4) with validity mask. Returns
    (voted_boxes (K, 4), voted_scores (K,)).
    """
    ious = bbox_overlaps(top_boxes, all_boxes)  # (K, N)
    vote = (ious >= thresh) & all_valid[None, :]
    w = jnp.where(vote, all_scores[None, :], 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    voted = jnp.einsum("kn,nc->kc", w, all_boxes) / wsum

    if scoring_method == "ID":
        scores = top_scores
    elif scoring_method == "AVG":
        cnt = jnp.maximum(jnp.sum(vote, axis=1), 1)
        scores = jnp.sum(w, axis=1) / cnt
    elif scoring_method == "IOU_AVG":
        iw = jnp.where(vote, ious, 0.0)
        scores = jnp.sum(iw * all_scores[None, :], axis=1) / jnp.maximum(
            jnp.sum(iw, axis=1), 1e-12
        )
    elif scoring_method == "GENERALIZED_AVG":
        cnt = jnp.maximum(jnp.sum(vote, axis=1), 1)
        p = jnp.where(vote, all_scores[None, :] ** beta, 0.0)
        scores = (jnp.sum(p, axis=1) / cnt) ** (1.0 / beta)
    elif scoring_method == "QUASI_SUM":
        cnt = jnp.maximum(jnp.sum(vote, axis=1), 1)
        scores = jnp.sum(w, axis=1) / cnt.astype(jnp.float32) ** beta
    elif scoring_method == "TEMP_AVG":
        # reference boxes.py:301-312: treat each voter's score as a 2-class
        # distribution [p, 1-p], temperature-smooth it, average P(class).
        # exp(log(p/pmax)/beta) == (p/pmax)**(1/beta), branch-free here.
        p = all_scores[None, :]
        q = 1.0 - p
        pm = jnp.maximum(p, q)
        a = (p / pm) ** (1.0 / beta)
        b = (q / pm) ** (1.0 / beta)
        pt = a / (a + b)
        cnt = jnp.maximum(jnp.sum(vote, axis=1), 1)
        scores = jnp.sum(jnp.where(vote, pt, 0.0), axis=1) / cnt
    else:
        raise NotImplementedError(scoring_method)
    return voted, scores


def filter_boxes_mask(boxes, min_size, scale_factor, im_height, im_width):
    """Validity mask version of proposal min-size/center-inside filtering
    (reference lib/model/generate_proposals.py:151-163). Returns bool (...,N)."""
    min_size = min_size * scale_factor
    ws = boxes[..., 2] - boxes[..., 0] + 1.0
    hs = boxes[..., 3] - boxes[..., 1] + 1.0
    x_ctr = boxes[..., 0] + ws / 2.0
    y_ctr = boxes[..., 1] + hs / 2.0
    return (ws >= min_size) & (hs >= min_size) & (x_ctr < im_width) & (y_ctr < im_height)
