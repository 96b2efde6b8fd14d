"""Stage-level timing of the Mask R-CNN R-50-FPN pipeline on the live device.

Times each pipeline stage as its own jit program (boundaries force
materialisation, so sums exceed the fused end-to-end time — use for
relative cost attribution only).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from detectorch_tpu.config import PRESETS, TestConfig
from detectorch_tpu.eval.postprocess import postprocess_detections
from detectorch_tpu.models import fpn as fpn_mod
from detectorch_tpu.models import heads as heads_mod
from detectorch_tpu.models import resnet as resnet_mod
from detectorch_tpu.models.detector import _fpn_level_proposals, init_params
from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels
from detectorch_tpu.ops.roi_align import multilevel_roi_align


def timeit(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:28s} {(time.time()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"]
    tcfg = TestConfig()
    params = jax.device_put(init_params(cfg, seed=0))  # transfer once
    rng = np.random.RandomState(0)
    h, w = 832, 1344
    image = (rng.randn(h, w, 3) * 50).astype(np.float32)
    dt = jnp.dtype(cfg.compute_dtype)

    body = jax.jit(lambda p, x: resnet_mod.multilevel_body(p, x, cfg.arch))
    feats = timeit("backbone (c2..c5)", body, params, image[None].astype(dt))

    neck = jax.jit(lambda p, f: fpn_mod.fpn_neck(p, f, cfg.arch))
    pyramid = timeit("fpn neck", neck, params, feats)

    prop = jax.jit(
        lambda p, pyr: _fpn_level_proposals(p, cfg, pyr, float(h), float(w), 1.66)
    )
    props = timeit("rpn + proposals (5 lvls)", prop, params, pyramid)

    def align(pyr, rois):
        lv = map_rois_to_fpn_levels(rois) - 2
        return multilevel_roi_align(
            [x[0] for x in pyr], rois, lv, cfg.fpn_spatial_scales, 7, 7, 2
        )

    align_j = jax.jit(align)
    roi_feats = timeit("roi_align (1000x7x7x256)", align_j, pyramid, props.boxes)

    head = jax.jit(
        lambda p, rf: heads_mod.box_predictors(p, heads_mod.mlp_box_head(p, rf))
    )
    cls_scores, bbox_deltas = timeit("box head (fc6/fc7+preds)", head, params, roi_feats)

    post = jax.jit(
        lambda s, d, r, v: postprocess_detections(
            s, d, r, v, 1.66, 500.0, 808.0, tcfg, cfg.num_classes
        )
    )
    dets = timeit("postprocess (80-cls NMS)", post, cls_scores, bbox_deltas,
                  props.boxes, props.valid)

    def mask_branch(pyr, boxes, classes):
        rois = boxes * 1.66
        lv = map_rois_to_fpn_levels(rois) - 2
        mf = multilevel_roi_align(
            [x[0] for x in pyr], rois, lv, cfg.fpn_spatial_scales, 14, 14, 2
        ).astype(dt)
        mp = heads_mod.mask_head(params, mf, cfg.mask.head_type, cfg.arch)
        return jnp.take_along_axis(mp, classes[:, None, None, None], axis=-1)

    mask_j = jax.jit(mask_branch)
    timeit("mask branch (100 dets)", mask_j, pyramid, dets.boxes, dets.classes)


if __name__ == "__main__":
    main()
