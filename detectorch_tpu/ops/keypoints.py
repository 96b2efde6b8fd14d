"""Keypoint heatmap decoding.

TPU-native re-design of upstream Detectron's
``keypoint_utils.heatmaps_to_keypoints`` (the reference repo carries the
keypoint evaluator — ``lib/data/json_dataset.py:268-314``,
``lib/utils/json_dataset_evaluator.py:349-432`` — but no keypoint model or
decoder). Detectron cv2-resizes each 56x56 heatmap to the roi's ceil pixel
size with INTER_CUBIC and takes the argmax there; those are data-dependent
shapes, which do not compile. Here the argmax runs on the native heatmap
grid and the same half-bin center rule maps it into the box:

    x = x1 + (x_int + 0.5) * max(x2 - x1, 1) / heatmap_size

The cubic resize only sub-bin-refines the argmax (it cannot move it by more
than a bin); at heatmap_size 56 the quantization is width/112 — well inside
the COCO OKS falloff sigmas. The whole decode is one fixed-shape program
that runs inside the detector jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def heatmaps_to_keypoints(heatmaps, boxes):
    """heatmaps (K, H, W, P) fp32 logits; boxes (K, 4) xyxy original-image
    coords. Returns (K, P, 4) fp32: [x, y, logit, prob] per keypoint —
    the same payload rows as Detectron's xy_preds (keypoint_utils.py),
    transposed to keypoint-major."""
    k, h, w, p = heatmaps.shape
    x1, y1 = boxes[:, 0], boxes[:, 1]
    widths = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    heights = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)

    flat = heatmaps.reshape(k, h * w, p)
    idx = jnp.argmax(flat, axis=1)                       # (K, P)
    x_int = (idx % w).astype(jnp.float32)
    y_int = (idx // w).astype(jnp.float32)

    x = x1[:, None] + (x_int + 0.5) * widths[:, None] / w
    y = y1[:, None] + (y_int + 0.5) * heights[:, None] / h

    logit = jnp.max(flat, axis=1)                        # (K, P)
    # spatial-softmax probability at the argmax: exp(max - max) = 1 on top
    prob = 1.0 / jnp.sum(jnp.exp(flat - logit[:, None, :]), axis=1)
    return jnp.stack([x, y, logit, prob], axis=-1)       # (K, P, 4)
