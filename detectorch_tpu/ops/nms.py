"""Fixed-shape greedy NMS on device.

The reference suppresses with a host-side O(N²) Cython loop over
variable-length arrays (``lib/utils_cython/cython_nms.pyx:37-87``), forcing a
GPU→CPU→GPU bounce mid-graph. Here NMS is a fixed-trip-count masked
``lax.fori_loop``: every iteration picks the argmax of the live scores,
records it, and kills every box with IoU >= thresh against it (note the
Cython loop's ``>=`` at pyx:84 — not ``>``). Invalid/padded inputs carry
score -inf and can never be picked. The +1 area convention (pyx:44) is kept.

Shapes are static: (N,) in, (max_out,) out with a validity mask, so the whole
thing traces into the single jit program and vmaps over classes / FPN levels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from detectorch_tpu.ops.boxes import iou_one_to_many

NEG_INF = jnp.float32(-jnp.inf)


def nms(boxes, scores, max_out: int, iou_thresh: float, valid=None):
    """Greedy NMS with Detectron semantics.

    Args:
      boxes: (N, 4) float32 xyxy.
      scores: (N,) float32. Already in the order-defining score space.
      max_out: static number of outputs (pad count).
      iou_thresh: suppression threshold (suppress when IoU >= thresh).
      valid: optional (N,) bool; False entries can never be selected.

    Returns:
      keep_idx: (max_out,) int32 indices into the input (0 for padded slots).
      keep_valid: (max_out,) bool.
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores).astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    def body(i, state):
        live_scores, keep_idx, keep_valid = state
        best = jnp.argmax(live_scores)
        best_ok = live_scores[best] > NEG_INF
        ious = iou_one_to_many(boxes[best], boxes)
        suppress = best_ok & (ious >= iou_thresh)
        live_scores = jnp.where(suppress, NEG_INF, live_scores)
        live_scores = live_scores.at[best].set(NEG_INF)
        keep_idx = keep_idx.at[i].set(jnp.where(best_ok, best, 0).astype(jnp.int32))
        keep_valid = keep_valid.at[i].set(best_ok)
        return live_scores, keep_idx, keep_valid

    init = (
        scores,
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), jnp.bool_),
    )
    _, keep_idx, keep_valid = jax.lax.fori_loop(0, max_out, body, init)
    return keep_idx, keep_valid


def batched_nms(boxes, scores, max_out: int, iou_thresh: float, valid=None):
    """vmap of `nms` over a leading batch axis (per-class or per-level).

    boxes: (B, N, 4); scores: (B, N); valid: (B, N) or None.
    """
    fn = functools.partial(nms, max_out=max_out, iou_thresh=iou_thresh)
    if valid is None:
        return jax.vmap(lambda b, s: fn(b, s))(boxes, scores)
    return jax.vmap(lambda b, s, v: fn(b, s, valid=v))(boxes, scores, valid)


def soft_nms(
    boxes,
    scores,
    max_out: int,
    sigma: float = 0.5,
    overlap_thresh: float = 0.3,
    score_thresh: float = 0.001,
    method: str = "linear",
    valid=None,
):
    """Soft-NMS (reference lib/utils_cython/cython_nms.pyx:98-202) as a
    fixed-shape device loop.

    Each step picks the current argmax, emits it with its (possibly decayed)
    score, then decays the scores of overlapping boxes: linear (1 - iou) for
    iou > overlap_thresh, or gaussian exp(-iou²/sigma). Boxes whose decayed
    score drops below score_thresh are dropped (score -> -inf).

    Returns (keep_idx, keep_scores, keep_valid), each (max_out,).
    """
    assert method in ("linear", "gaussian", "hard")
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores).astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    def body(i, state):
        live, keep_idx, keep_scores, keep_valid = state
        best = jnp.argmax(live)
        best_score = live[best]
        best_ok = best_score > NEG_INF
        ious = iou_one_to_many(boxes[best], boxes)
        if method == "linear":
            weight = jnp.where(ious > overlap_thresh, 1.0 - ious, 1.0)
        elif method == "gaussian":
            weight = jnp.exp(-(ious * ious) / sigma)
        else:  # hard == classic NMS decay
            weight = jnp.where(ious >= overlap_thresh, 0.0, 1.0)
        decayed = live * weight
        decayed = jnp.where(decayed < score_thresh, NEG_INF, decayed)
        live = jnp.where(best_ok, decayed, live)
        live = live.at[best].set(NEG_INF)
        keep_idx = keep_idx.at[i].set(jnp.where(best_ok, best, 0).astype(jnp.int32))
        keep_scores = keep_scores.at[i].set(jnp.where(best_ok, best_score, 0.0))
        keep_valid = keep_valid.at[i].set(best_ok)
        return live, keep_idx, keep_scores, keep_valid

    init = (
        scores,
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), jnp.float32),
        jnp.zeros((max_out,), jnp.bool_),
    )
    _, keep_idx, keep_scores, keep_valid = jax.lax.fori_loop(0, max_out, body, init)
    return keep_idx, keep_scores, keep_valid
