"""RPN head + on-device proposal generation.

Head: 3x3 conv + relu, 1x1 sigmoid objectness (A ch), 1x1 deltas (4A ch) —
reference ``lib/model/detector.py:114-127``. C4 uses 1024ch/A=15 with blobs
``conv_rpn_*``/``rpn_cls_logits_*``/``rpn_bbox_pred_*``; FPN uses 256ch/A=3
shared across levels with the ``*_fpn2`` blobs (reference detector.py:195-209,
328-335).

Proposal generation (reference ``lib/model/generate_proposals.py:31-122``)
is re-designed as a fixed-shape on-device program:

  1. NHWC RPN outputs flatten directly to the (H, W, A) anchor ordering the
     reference builds by permute+reshape (generate_proposals.py:58-73);
  2. top-k via lax.top_k instead of np.argpartition+argsort — same
     descending order with stable lower-index tie-breaks;
  3. delta decode + clip in-graph (ops.boxes.bbox_transform);
  4. min-size/center-inside filtering becomes a validity mask (no removal);
  5. greedy NMS as a masked loop (ops.nms) -> padded post_nms_top_n rois
     with a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from detectorch_tpu.ops import boxes as box_ops
from detectorch_tpu.ops import nms as nms_ops
from detectorch_tpu.ops.anchors import shifted_anchors
from detectorch_tpu.models.resnet import conv


def rpn_head(params, x, prefix: str = "", return_logits: bool = False):
    """x: (N, H, W, C). Returns (cls_prob (N,H,W,A), bbox_pred (N,H,W,4A)).

    prefix '' for C4 blobs, '_fpn2' for the shared FPN head.
    return_logits=True returns the raw objectness logits instead of the
    sigmoid probability (the e2e RPN training loss needs logits).
    """
    h = jax.nn.relu(
        conv(x, params[f"conv_rpn{prefix}_w"], pad=1)
        + params[f"conv_rpn{prefix}_b"].astype(x.dtype)
    )
    logits = (
        conv(h, params[f"rpn_cls_logits{prefix}_w"])
        + params[f"rpn_cls_logits{prefix}_b"].astype(x.dtype)
    ).astype(jnp.float32)
    cls_out = logits if return_logits else jax.nn.sigmoid(logits)
    bbox_pred = (
        conv(h, params[f"rpn_bbox_pred{prefix}_w"])
        + params[f"rpn_bbox_pred{prefix}_b"].astype(x.dtype)
    ).astype(jnp.float32)
    return cls_out, bbox_pred


class Proposals(NamedTuple):
    boxes: jax.Array   # (post_nms_top_n, 4) fp32, image coords
    scores: jax.Array  # (post_nms_top_n,) fp32
    valid: jax.Array   # (post_nms_top_n,) bool


def generate_proposals(
    cls_prob,
    bbox_pred,
    im_height: float,
    im_width: float,
    scaling_factor,
    feat_stride: float,
    anchor_sizes: Tuple[float, ...],
    anchor_aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0),
    pre_nms_top_n: int = 6000,
    post_nms_top_n: int = 1000,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
) -> Proposals:
    """Single-level, single-image proposal decode + NMS, all on device.

    cls_prob: (H, W, A) fp32; bbox_pred: (H, W, 4A) fp32.
    im_height/im_width are the *padded input* dims (static floats);
    scaling_factor may be a traced scalar.
    """
    fh, fw, num_anchors = cls_prob.shape
    anchors = jnp.asarray(
        shifted_anchors(
            int(fh), int(fw), float(feat_stride), tuple(anchor_sizes),
            tuple(anchor_aspect_ratios),
        )
    )  # (H*W*A, 4) — (H, W, A) ordering matches the NHWC flatten below.

    scores = cls_prob.reshape(-1)
    deltas = bbox_pred.reshape(-1, 4)

    k = min(pre_nms_top_n, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_deltas = deltas[top_idx]
    top_anchors = anchors[top_idx]

    proposals = box_ops.bbox_transform(top_anchors, top_deltas)
    proposals = box_ops.clip_boxes(proposals, im_height, im_width)
    keep_mask = box_ops.filter_boxes_mask(
        proposals, min_size, scaling_factor, im_height, im_width
    )

    idx, ok = nms_ops.nms(
        proposals, top_scores, max_out=post_nms_top_n,
        iou_thresh=nms_thresh, valid=keep_mask,
    )
    return Proposals(boxes=proposals[idx], scores=jnp.where(ok, top_scores[idx], 0.0), valid=ok)


def collect_proposals(level_props, post_nms_top_n: int = 1000) -> Proposals:
    """FPN 'collect': concat per-level padded proposals, keep global top-N by
    score (reference collect_and_distribute_fpn_rpn_proposals.py:84-105).
    Invalid padding entries carry score -inf so they sort last."""
    boxes = jnp.concatenate([p.boxes for p in level_props], axis=0)
    scores = jnp.concatenate([p.scores for p in level_props], axis=0)
    valid = jnp.concatenate([p.valid for p in level_props], axis=0)
    sort_key = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(sort_key, post_nms_top_n)
    return Proposals(
        boxes=boxes[top_idx],
        scores=jnp.where(top_scores > -jnp.inf, scores[top_idx], 0.0),
        valid=top_scores > -jnp.inf,
    )


def init_rpn_params(in_channels: int = 1024, num_anchors: int = 15, prefix: str = "", seed: int = 2):
    rng = np.random.RandomState(seed)
    p = {}
    p[f"conv_rpn{prefix}_w"] = (rng.randn(3, 3, in_channels, in_channels) * 0.01).astype(np.float32)
    p[f"conv_rpn{prefix}_b"] = np.zeros(in_channels, np.float32)
    p[f"rpn_cls_logits{prefix}_w"] = (rng.randn(1, 1, in_channels, num_anchors) * 0.01).astype(np.float32)
    p[f"rpn_cls_logits{prefix}_b"] = np.zeros(num_anchors, np.float32)
    p[f"rpn_bbox_pred{prefix}_w"] = (rng.randn(1, 1, in_channels, 4 * num_anchors) * 0.01).astype(np.float32)
    p[f"rpn_bbox_pred{prefix}_b"] = np.zeros(4 * num_anchors, np.float32)
    return p
