"""Flagship (Mask R-CNN R-50-FPN) cumulative bisection at the BENCHMARK
batch size — unlike profile_cumulative.py (single image, dominated by the
~35-40 ms relay RPC floor), this times vmapped programs over a batch with
pipelined dispatch, so deltas attribute the real in-context cost of each
stage at production load.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_fpn_batched.py [--batch 16]
"""

import argparse
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
from detectorch_tpu.models.detector import (
    _fpn_level_proposals,
    _fpn_roi_align,
    init_params,
)
from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=16)
args = p.parse_args()

cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"]
tcfg = TestConfig()
H, W = 832, 1344
DT = jnp.dtype(cfg.compute_dtype)
B = args.batch

STAGES = ["backbone+neck", "+rpn+nms", "+roi_align(pallas)", "+box head",
          "+postprocess", "+mask branch"]


def stage_fn(upto):
    def single(params, image):
        x = image[None].astype(DT)
        feats = resnet_mod.multilevel_body(params, x, cfg.arch)
        pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
        if upto == 0:
            return pyramid[0][0].astype(jnp.float32).mean()
        props = _fpn_level_proposals(params, cfg, pyramid, float(H), float(W), 1.66)
        if upto == 1:
            return props.boxes.mean()
        levels = map_rois_to_fpn_levels(props.boxes) - 2
        lf = [pp[0] for pp in pyramid]
        roi_feats, _ = _fpn_roi_align(cfg, lf, props.boxes, levels, cfg.roi_size)
        if upto == 2:
            return roi_feats.astype(jnp.float32).mean()
        box_feats = heads_mod.mlp_box_head(params, roi_feats, DT)
        cls_scores, bbox_deltas = heads_mod.box_predictors(params, box_feats, dtype=DT)
        if upto == 3:
            return cls_scores.mean()
        dets = postprocess_detections(
            cls_scores, bbox_deltas, props.boxes, props.valid,
            1.66, 500.0, 800.0, tcfg, cfg.num_classes,
        )
        if upto == 4:
            return dets.scores.mean()
        mask_rois = dets.boxes * 1.66
        mask_levels = map_rois_to_fpn_levels(mask_rois) - 2
        mask_feats, _ = _fpn_roi_align(
            cfg, lf, mask_rois, mask_levels, cfg.mask.roi_size
        )
        mp = heads_mod.mask_head(params, mask_feats.astype(DT),
                                 cfg.mask.head_type, cfg.arch)
        return mp.astype(jnp.float32).mean() + dets.scores.mean()

    def fn(params, images):
        return jax.vmap(lambda im: single(params, im))(images).mean()

    return jax.jit(fn)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = jax.tree.map(jnp.asarray, init_params(cfg, seed=0))
    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.randn(B, H, W, 3) * 50).astype(np.float32))

    prev = 0.0
    for upto, name in enumerate(STAGES):
        fn = stage_fn(upto)
        float(fn(params, images))
        float(fn(params, images))
        iters = 8
        t0 = time.time()
        pending = fn(params, images)
        for _ in range(iters - 1):
            nxt = fn(params, images)
            float(pending)
            pending = nxt
        float(pending)
        ms = (time.time() - t0) / iters * 1000
        print(f"{name:20s}: {ms:8.1f} ms/batch{B}  (+{ms - prev:7.1f} ms)",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
