"""C4 pipeline bisection: time cumulative programs (backbone -> +RPN/NMS ->
+RoIAlign -> +res5 head -> +postprocess) to attribute in-context cost.
Batched like the benchmark; params device-resident; pipelined timing
(fetch one small field per iteration, two dispatches deep).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_c4.py
  [--batch 8] [--precision highest|high|bf16] [--chunk 64]
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
from detectorch_tpu.models import heads as heads_mod
from detectorch_tpu.models import resnet as resnet_mod
from detectorch_tpu.models import rpn as rpn_mod
from detectorch_tpu.models.detector import init_params
from detectorch_tpu.ops.roi_align import roi_align_matmul

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=8)
p.add_argument("--precision", default=None)
p.add_argument("--chunk", type=int, default=64)
args = p.parse_args()

cfg = PRESETS["e2e_faster_rcnn_R-50-C4_2x"]
if args.precision:
    cfg = cfg.replace(roi_align_precision=args.precision)
tcfg = TestConfig()
H, W = 832, 1344
DT = jnp.dtype(cfg.compute_dtype)
B = args.batch

STAGES = ["backbone_c4", "+rpn+nms", "+roi_align", "+res5_head", "+postprocess"]


def stage_fn(upto):
    def single(params, image):
        x = image[None].astype(DT)
        c4 = resnet_mod.c4_body(params, x, cfg.arch)
        if upto == 0:
            return c4.astype(jnp.float32).mean()
        cls_prob, bbox_pred = rpn_mod.rpn_head(params, c4, prefix="")
        props = rpn_mod.generate_proposals(
            cls_prob[0], bbox_pred[0], float(H), float(W), 1.66,
            feat_stride=1.0 / cfg.spatial_scale,
            anchor_sizes=cfg.anchors.sizes,
            anchor_aspect_ratios=cfg.anchors.aspect_ratios,
            pre_nms_top_n=cfg.rpn.pre_nms_top_n,
            post_nms_top_n=cfg.rpn.post_nms_top_n,
            nms_thresh=cfg.rpn.nms_thresh,
            min_size=cfg.rpn.min_size,
        )
        if upto == 1:
            return props.boxes.mean()
        roi_feats = roi_align_matmul(
            c4[0], props.boxes, cfg.roi_size, cfg.roi_size,
            cfg.spatial_scale, cfg.roi_sampling_ratio,
            precision=cfg.roi_align_precision, roi_chunk=args.chunk,
        ).astype(DT)
        if upto == 2:
            return roi_feats.astype(jnp.float32).mean()
        box_feats = heads_mod.res5_box_head(params, roi_feats, cfg.arch)
        if upto == 3:
            return box_feats.mean()
        cls_scores, bbox_deltas = heads_mod.box_predictors(
            params, box_feats, dtype=DT
        )
        dets = postprocess_detections(
            cls_scores, bbox_deltas, props.boxes, props.valid,
            1.66, 500.0, 800.0, tcfg, cfg.num_classes,
        )
        return dets.scores.mean()

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
        float(fn(params, images))  # compile + warm
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
        print(f"{name:14s}: {ms:8.1f} ms/batch{B}  (+{ms - prev:7.1f} ms)",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
