"""Cumulative fused-program bisection: time programs that run the pipeline
up to stage k; differences attribute in-context cost. Params device-resident.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_cumulative.py
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

cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"]
tcfg = TestConfig()
H, W = 832, 1344
DT = jnp.dtype(cfg.compute_dtype)


def stage_fn(upto):
    def fn(params, image):
        x = image[None].astype(DT)
        feats = resnet_mod.multilevel_body(params, x, cfg.arch)
        pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
        if upto == 1:
            return pyramid
        props = _fpn_level_proposals(params, cfg, pyramid, float(H), float(W), 1.66)
        if upto == 2:
            return props
        levels = map_rois_to_fpn_levels(props.boxes) - 2
        lf = [p[0] for p in pyramid]
        roi_feats = multilevel_roi_align(
            lf, props.boxes, levels, cfg.fpn_spatial_scales, 7, 7, 2
        )
        if upto == 3:
            return roi_feats
        box_feats = heads_mod.mlp_box_head(params, roi_feats)
        cls_scores, bbox_deltas = heads_mod.box_predictors(params, box_feats)
        if upto == 4:
            return cls_scores, bbox_deltas
        dets = postprocess_detections(
            cls_scores, bbox_deltas, props.boxes, props.valid,
            1.66, 500.0, 808.0, tcfg, cfg.num_classes,
        )
        if upto == 5:
            return dets
        rois = dets.boxes * 1.66
        lv = map_rois_to_fpn_levels(rois) - 2
        mf = multilevel_roi_align(
            lf, rois, lv, cfg.fpn_spatial_scales, 14, 14, 2
        ).astype(DT)
        mp = heads_mod.mask_head(params, mf, cfg.mask.head_type, cfg.arch)
        masks = jnp.take_along_axis(mp, dets.classes[:, None, None, None], axis=-1)
        return dets, masks

    return jax.jit(fn)


def main():
    print("devices:", jax.devices(), flush=True)
    params = jax.device_put(init_params(cfg, seed=0))
    rng = np.random.RandomState(0)
    image = jax.device_put((rng.randn(H, W, 3) * 50).astype(np.float32))

    def sync(out):
        # axon: block_until_ready does not truly wait; fetch one element
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    names = ["backbone+neck", "+rpn/proposals", "+roi_align", "+box head",
             "+postprocess", "+mask (full)"]
    prev = 0.0
    for k, name in enumerate(names, start=1):
        fn = stage_fn(k)
        sync(fn(params, image))
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            sync(fn(params, image))
        t = (time.time() - t0) / iters * 1000
        print(f"upto {name:18s} {t:8.2f} ms  (delta {t - prev:+7.2f})", flush=True)
        prev = t

    # raw fc6 matmul floor
    x = jax.device_put(rng.randn(1000, 12544).astype(np.float32))
    w = jax.device_put(rng.randn(1024, 12544).astype(np.float32))
    mm = jax.jit(lambda a, b: (a @ b.T))
    np.asarray(mm(x, w)[0, 0])
    t0 = time.time()
    for _ in range(20):
        np.asarray(mm(x, w)[0, 0])
    print(f"raw fc6 matmul fp32: {(time.time()-t0)/20*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
