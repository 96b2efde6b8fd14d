"""Training losses (reference ``lib/model/loss.py:13-26`` + the cross-entropy
used directly in ``train_fast.py:147``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(
    bbox_pred,
    bbox_targets,
    bbox_inside_weights=1.0,
    bbox_outside_weights=1.0,
    beta: float = 1.0,
):
    """Detectron smooth-L1 with per-element inside/outside weights
    (reference loss.py:13-20): sum over all elements / N rows."""
    diff = bbox_inside_weights * (bbox_pred - bbox_targets)
    abs_diff = jnp.abs(diff)
    flag = (abs_diff < beta).astype(bbox_pred.dtype)
    per_elem = flag * 0.5 * diff * diff / beta + (1.0 - flag) * (abs_diff - 0.5 * beta)
    per_elem = bbox_outside_weights * per_elem
    n = bbox_pred.shape[0]
    return jnp.sum(per_elem) / n


def sigmoid_cross_entropy_with_logits(logits, targets):
    """Numerically-stable element-wise sigmoid BCE in float32:
    max(x, 0) - x*t + log1p(exp(-|x|))."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def softmax_cross_entropy(logits, labels, valid=None):
    """Mean CE over (valid) rows — torch F.cross_entropy semantics with int
    labels (train_fast.py:147)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if valid is None:
        return jnp.mean(nll)
    valid = valid.astype(nll.dtype)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def keypoint_loss(kp_logits, kp_labels, kp_valid):
    """Keypoint heatmap loss: per-keypoint softmax cross-entropy over the
    S*S spatial bins, averaged over valid (labeled, in-roi, fg) keypoints
    (upstream Detectron spatial_softmax_loss for KRCNN, normalized by
    visible keypoints; the reference repo has no keypoint training code).

    kp_logits (R, S, S, P); kp_labels (R, P) flat bin index y*S + x;
    kp_valid (R, P) bool."""
    r, s, _, p = kp_logits.shape
    flat = jnp.transpose(kp_logits, (0, 3, 1, 2)).reshape(r, p, s * s)
    logp = jax.nn.log_softmax(flat.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, kp_labels[..., None], axis=-1)[..., 0]
    w = kp_valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def accuracy(logits, labels, valid=None):
    """reference loss.py:22-26."""
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if valid is None:
        return jnp.mean(correct)
    valid = valid.astype(jnp.float32)
    return jnp.sum(correct * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def mask_loss(mask_logits, mask_targets, labels, mask_valid):
    """Mask branch loss: per-pixel sigmoid cross-entropy on the gt-class
    channel, averaged over the valid foreground rois' pixels (upstream
    Detectron mask_rcnn_heads SigmoidCrossEntropyLoss semantics, which
    averages over non-ignored elements; the reference repo has no mask
    training code).

    mask_logits (Rf, M, M, K); mask_targets (Rf, M, M) in {0,1};
    labels (Rf,) int gt classes of the fg rois; mask_valid (Rf,) bool."""
    cls_logits = jnp.take_along_axis(
        mask_logits, labels[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0].astype(jnp.float32)                       # (Rf, M, M)
    per_pix = sigmoid_cross_entropy_with_logits(cls_logits, mask_targets)
    w = mask_valid.astype(jnp.float32)[:, None, None]
    denom = jnp.maximum(
        jnp.sum(w) * mask_targets.shape[1] * mask_targets.shape[2], 1.0)
    return jnp.sum(per_pix * w) / denom
