"""Detector assembly: image -> padded detections (+ masks), one jit program.

Reference orchestration: ``lib/model/detector.py:233-286`` (forward) plus the
notebook-driven postprocess/mask calls (``eval_mask*.ipynb`` cell 10,
``lib/utils/result_utils.py``). The reference bounces to numpy for proposal
top-k/NMS, FPN level routing and all postprocessing; here every stage is a
fixed-shape on-device op, so the entire pipeline — backbone, RPN, proposal
NMS, RoIAlign, box head, per-class NMS, mask head — compiles into a single
XLA program with no host round-trips.

The public entry points are builder functions that close over static config
(model preset, padded input shape) and return functions ready for jax.jit /
jax.vmap / sharding.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from detectorch_tpu.config import ModelConfig, TestConfig
from detectorch_tpu.eval.postprocess import Detections, postprocess_detections
from detectorch_tpu.models import fpn as fpn_mod
from detectorch_tpu.models import heads as heads_mod
from detectorch_tpu.models import resnet as resnet_mod
from detectorch_tpu.models import rpn as rpn_mod
from detectorch_tpu.ops import boxes as box_ops
from detectorch_tpu.ops import nms as nms_ops
from detectorch_tpu.ops.anchors import shifted_anchors
from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels
from detectorch_tpu.ops.roi_align import (
    multilevel_roi_align,
    roi_align_matmul,
)
from detectorch_tpu.ops import keypoints as kp_ops
from detectorch_tpu.ops.pallas.roi_align_kernel import multilevel_roi_align_pallas


def _fpn_roi_align(cfg: ModelConfig, level_feats, rois, levels, size: int):
    """FPN RoIAlign: Pallas DMA+MXU kernel (fast path) or exact gather.

    Returns (feats, all_exact). The Pallas kernel is exact for every roi
    whose sampling footprint fits its slab — which FPN level assignment
    guarantees for all but extreme-aspect boxes. Rather than paying a
    dual-execution fallback inside the program (lax.cond dualises under
    vmap), the program reports `all_exact`; the inference engine re-runs
    the rare flagged image through the exact-gather variant
    (eval/engine.py), so results are exact end-to-end and the fast path
    stays pure.
    """
    if not cfg.use_pallas_roi_align:
        out = multilevel_roi_align(
            level_feats, rois, levels, cfg.fpn_spatial_scales,
            size, size, cfg.roi_sampling_ratio,
        )
        return out, jnp.bool_(True)
    fast, fits = multilevel_roi_align_pallas(
        level_feats, rois, levels, cfg.fpn_spatial_scales,
        size, size, cfg.roi_sampling_ratio,
        fwd_precision=cfg.roi_align_fwd_precision,
    )
    return fast, jnp.all(fits)


class ModelOutputs(NamedTuple):
    detections: Detections          # (K,) padded final detections
    masks: Optional[jax.Array]      # (K, M, M) class-gathered probs, or None
    rois: jax.Array                 # (N, 4) box-branch rois (scaled coords)
    roi_valid: jax.Array            # (N,) bool
    cls_scores: jax.Array           # (N, C)
    bbox_deltas: jax.Array          # (N, 4C)
    roi_align_exact: jax.Array = True  # () bool: False if any roi overflowed
                                       # the Pallas slab (engine re-runs exact)
    keypoints: Optional[jax.Array] = None  # (K, P, 4) [x, y, logit, prob]
                                           # decoded keypoints, or None
    all_exact: jax.Array = False  # () bool: roi_align_exact AND
                                  # detections.nms_exact — ONE fetchable
                                  # scalar for whole-result exactness
                                  # (each fetch is a full RPC on a tunnel).
                                  # Default is CONSERVATIVE: a construction
                                  # site that forgets to set it triggers the
                                  # engine's exact rerun instead of silently
                                  # reporting exactness.


def _fpn_level_proposals(params, cfg: ModelConfig, pyramid, im_h, im_w, im_scale):
    """Shared-head RPN on P2..P6; per-level decode, then ONE vmapped NMS over
    levels, then global collect (reference detector.py:244-256)."""
    rpn_cfg = cfg.rpn
    fcfg = cfg.fpn
    min_lvl = fcfg.roi_min_level  # 2
    levels = list(range(min_lvl, fcfg.roi_max_level + 1))  # RoI levels 2..5
    rpn_feats = list(pyramid)
    if fcfg.extra_level:
        rpn_feats.append(fpn_mod.subsample2x(pyramid[-1]))
        rpn_levels = levels + [fcfg.roi_max_level + 1]  # RPN on 2..6
    else:
        rpn_levels = levels

    cand_boxes, cand_scores, cand_valid = [], [], []
    for feat, lvl in zip(rpn_feats, rpn_levels):
        stride = float(2 ** lvl)
        cls_prob, bbox_pred = rpn_mod.rpn_head(params, feat, prefix="_fpn2")
        cls_prob, bbox_pred = cls_prob[0], bbox_pred[0]
        fh, fw, a = cls_prob.shape
        anchors = jnp.asarray(
            shifted_anchors(
                int(fh), int(fw), stride, (32.0 * 2 ** (lvl - 2),),
                tuple(cfg.anchors.aspect_ratios),
            )
        )
        scores = cls_prob.reshape(-1)
        deltas = bbox_pred.reshape(-1, 4)
        k = min(rpn_cfg.pre_nms_top_n, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        props = box_ops.bbox_transform(anchors[top_idx], deltas[top_idx])
        props = box_ops.clip_boxes(props, im_h, im_w)
        ok = box_ops.filter_boxes_mask(props, rpn_cfg.min_size, im_scale, im_h, im_w)
        pad = rpn_cfg.pre_nms_top_n - k
        if pad:
            props = jnp.pad(props, ((0, pad), (0, 0)))
            top_scores = jnp.pad(top_scores, (0, pad))
            ok = jnp.pad(ok, (0, pad))
        cand_boxes.append(props)
        cand_scores.append(top_scores)
        cand_valid.append(ok)

    boxes = jnp.stack(cand_boxes)    # (L, pre, 4)
    scores = jnp.stack(cand_scores)  # (L, pre)
    valid = jnp.stack(cand_valid)
    idx, ok = nms_ops.batched_nms(
        boxes, scores, max_out=rpn_cfg.post_nms_top_n,
        iou_thresh=rpn_cfg.nms_thresh, valid=valid,
    )
    lvl_props = [
        rpn_mod.Proposals(
            boxes=boxes[l][idx[l]],
            scores=jnp.where(ok[l], scores[l][idx[l]], 0.0),
            valid=ok[l],
        )
        for l in range(len(rpn_feats))
    ]
    return rpn_mod.collect_proposals(lvl_props, rpn_cfg.post_nms_top_n)


def make_inference_fn(
    cfg: ModelConfig,
    test_cfg: TestConfig,
    num_proposals: Optional[int] = None,
):
    """Build the single-image inference program for `cfg`.

    Returns fn(params, image, im_scale, orig_h, orig_w[, proposals,
    proposals_valid]) -> ModelOutputs, where:
      image: (H, W, 3) float32, RGB, mean-subtracted, resized+padded
             (H, W static; divisible by 32 for FPN);
      im_scale: () scale factor applied to the original image;
      orig_h/orig_w: () original image dims (traced fp32 scalars);
      proposals: (P, 4) scaled-coordinate rois (Fast R-CNN mode, cfg.use_rpn
                 False), with validity mask.
    """
    n_props = num_proposals or test_cfg.max_proposals

    def forward(params, image, im_scale, orig_h, orig_w,
                proposals=None, proposals_valid=None):
        x = image[None].astype(jnp.dtype(cfg.compute_dtype))

        # proposal clip/filter bounds: the reference uses the blob dims —
        # the ACTUAL resized image (C4) or its ceil-to-stride-32 padding
        # (FPN, blob.py:39-42) — NOT our static shape bucket. Recover the
        # cv2-resized dims from orig size x scale as traced scalars (static
        # shapes are untouched); anchors over the bucket's extra padding
        # then get filtered exactly like the reference never having them.
        im_h = jnp.minimum(jnp.round(orig_h * im_scale), image.shape[0])
        im_w = jnp.minimum(jnp.round(orig_w * im_scale), image.shape[1])
        if cfg.use_fpn:
            stride = float(cfg.fpn.coarsest_stride)
            im_h = jnp.minimum(jnp.ceil(im_h / stride) * stride, image.shape[0])
            im_w = jnp.minimum(jnp.ceil(im_w / stride) * stride, image.shape[1])

        if cfg.use_fpn:
            feats = resnet_mod.multilevel_body(params, x, cfg.arch,
                                               s2d=cfg.s2d_stem)
            pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)  # P2..P5
        else:
            c4 = resnet_mod.c4_body(params, x, cfg.arch, s2d=cfg.s2d_stem)

        # --- proposals ---------------------------------------------------
        if cfg.use_rpn:
            if cfg.use_fpn:
                props = _fpn_level_proposals(
                    params, cfg, pyramid, im_h, im_w, im_scale
                )
            else:
                cls_prob, bbox_pred = rpn_mod.rpn_head(params, c4, prefix="")
                props = rpn_mod.generate_proposals(
                    cls_prob[0], bbox_pred[0], im_h, im_w, im_scale,
                    feat_stride=1.0 / cfg.spatial_scale,
                    anchor_sizes=cfg.anchors.sizes,
                    anchor_aspect_ratios=cfg.anchors.aspect_ratios,
                    pre_nms_top_n=cfg.rpn.pre_nms_top_n,
                    post_nms_top_n=cfg.rpn.post_nms_top_n,
                    nms_thresh=cfg.rpn.nms_thresh,
                    min_size=cfg.rpn.min_size,
                )
            rois, roi_valid = props.boxes, props.valid
        else:
            assert proposals is not None, "Fast R-CNN mode needs proposals"
            rois = proposals.astype(jnp.float32)
            roi_valid = (
                proposals_valid
                if proposals_valid is not None
                else jnp.ones(rois.shape[0], jnp.bool_)
            )

        # --- box branch ---------------------------------------------------
        align_exact = jnp.bool_(True)
        if cfg.use_fpn:
            roi_levels = map_rois_to_fpn_levels(
                rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level,
                cfg.fpn.roi_canonical_scale, cfg.fpn.roi_canonical_level,
            ) - cfg.fpn.roi_min_level
            level_feats = [p[0] for p in pyramid]
            roi_feats, box_exact = _fpn_roi_align(
                cfg, level_feats, rois, roi_levels, cfg.roi_size
            )
            align_exact = align_exact & box_exact
            box_feats = heads_mod.mlp_box_head(
                params, roi_feats, jnp.dtype(cfg.compute_dtype)
            )
        else:
            # roi_chunk=64 bounds the separable-matmul intermediate at
            # batch*64*14*W*1024 fp32 (~2.4 GB at batch 8) instead of the
            # unchunked ~4.8 GB/image that capped C4 models at batch 2
            roi_feats = roi_align_matmul(
                c4[0], rois, cfg.roi_size, cfg.roi_size,
                cfg.spatial_scale, cfg.roi_sampling_ratio,
                precision=cfg.roi_align_precision, roi_chunk=64,
            ).astype(jnp.dtype(cfg.compute_dtype))
            box_feats = heads_mod.res5_box_head(params, roi_feats, cfg.arch)

        cls_scores, bbox_deltas = heads_mod.box_predictors(
            params, box_feats, dtype=jnp.dtype(cfg.compute_dtype)
        )

        dets = postprocess_detections(
            cls_scores, bbox_deltas, rois, roi_valid,
            im_scale, orig_h, orig_w, test_cfg, cfg.num_classes,
        )
        # roi_align_exact stays RoIAlign-only; the NMS top-k prefilter
        # overflow travels separately as detections.nms_exact so consumers
        # that redo NMS themselves (the multi-scale union merge) can skip
        # a needless full rerun. Engines needing whole-result exactness
        # check `roi_align_exact & detections.nms_exact`.

        # --- mask branch (on final detections, reference demo flow) ------
        masks = None
        if cfg.use_mask:
            mask_rois = dets.boxes * im_scale
            msize = cfg.mask.roi_size
            if cfg.use_fpn:
                mask_levels = map_rois_to_fpn_levels(
                    mask_rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level,
                    cfg.fpn.roi_canonical_scale, cfg.fpn.roi_canonical_level,
                ) - cfg.fpn.roi_min_level
                mask_feats, mask_exact = _fpn_roi_align(
                    cfg, level_feats, mask_rois, mask_levels, msize
                )
                align_exact = align_exact & mask_exact
            else:
                mask_feats = roi_align_matmul(
                    c4[0], mask_rois, msize, msize,
                    cfg.spatial_scale, cfg.roi_sampling_ratio,
                    precision=cfg.roi_align_precision, roi_chunk=64,
                )
            mask_feats = mask_feats.astype(jnp.dtype(cfg.compute_dtype))
            mask_probs = heads_mod.mask_head(
                params, mask_feats, cfg.mask.head_type, cfg.arch
            )  # (K, M, M, C)
            # class-specific mask channel (result_utils.py:199)
            masks = jnp.take_along_axis(
                mask_probs, dets.classes[:, None, None, None], axis=-1
            )[..., 0]

        # --- keypoint branch (on final detections, Detectron KRCNN flow) --
        keypoints = None
        if cfg.keypoint is not None:
            kcfg = cfg.keypoint
            kp_rois = dets.boxes * im_scale
            if cfg.use_fpn:
                kp_levels = map_rois_to_fpn_levels(
                    kp_rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level,
                    cfg.fpn.roi_canonical_scale, cfg.fpn.roi_canonical_level,
                ) - cfg.fpn.roi_min_level
                kp_feats, kp_exact = _fpn_roi_align(
                    cfg, level_feats, kp_rois, kp_levels, kcfg.roi_size
                )
                align_exact = align_exact & kp_exact
            else:
                kp_feats = roi_align_matmul(
                    c4[0], kp_rois, kcfg.roi_size, kcfg.roi_size,
                    cfg.spatial_scale, cfg.roi_sampling_ratio,
                    precision=cfg.roi_align_precision, roi_chunk=64,
                )
            kp_feats = kp_feats.astype(jnp.dtype(cfg.compute_dtype))
            heatmaps = heads_mod.keypoint_head(
                params, kp_feats, kcfg.num_convs
            )  # (K, 56, 56, P) fp32 logits
            keypoints = kp_ops.heatmaps_to_keypoints(heatmaps, dets.boxes)

        return ModelOutputs(
            detections=dets,
            masks=masks,
            rois=rois,
            roi_valid=roi_valid,
            cls_scores=cls_scores,
            bbox_deltas=bbox_deltas,
            roi_align_exact=align_exact,
            keypoints=keypoints,
            all_exact=align_exact & dets.nms_exact,
        )

    return forward


def make_mask_fn(cfg: ModelConfig):
    """Mask-only program: final detection boxes -> class-gathered mask probs.

    fn(params, image, im_scale, orig_h, orig_w, boxes, classes)
      -> (masks (K, M, M), align_exact ()) with boxes (K, 4) in
    ORIGINAL-image coords and classes (K,) int32. orig_h/orig_w are unused
    but keep the argument layout identical to make_inference_fn so the
    engine's device-preprocess wrapper applies unchanged.

    Recomputes the backbone at the given scale. Used by the engine's
    multi-scale path (run_image_multiscale): merged detections come from
    several per-scale programs, and the mask branch then runs once on the
    merged set at the canonical scale — the Detectron test-aug flow
    (im_detect_mask on final boxes at TEST.SCALE after BBOX_AUG merging).
    """
    assert cfg.use_mask, "make_mask_fn requires a mask-bearing config"

    def forward(params, image, im_scale, orig_h, orig_w, boxes, classes):
        del orig_h, orig_w
        x = image[None].astype(jnp.dtype(cfg.compute_dtype))
        align_exact = jnp.bool_(True)
        mask_rois = boxes.astype(jnp.float32) * im_scale
        msize = cfg.mask.roi_size
        if cfg.use_fpn:
            feats = resnet_mod.multilevel_body(params, x, cfg.arch,
                                               s2d=cfg.s2d_stem)
            pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
            level_feats = [p[0] for p in pyramid]
            mask_levels = map_rois_to_fpn_levels(
                mask_rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level,
                cfg.fpn.roi_canonical_scale, cfg.fpn.roi_canonical_level,
            ) - cfg.fpn.roi_min_level
            mask_feats, mask_exact = _fpn_roi_align(
                cfg, level_feats, mask_rois, mask_levels, msize
            )
            align_exact = align_exact & mask_exact
        else:
            c4 = resnet_mod.c4_body(params, x, cfg.arch, s2d=cfg.s2d_stem)
            mask_feats = roi_align_matmul(
                c4[0], mask_rois, msize, msize,
                cfg.spatial_scale, cfg.roi_sampling_ratio,
                precision=cfg.roi_align_precision, roi_chunk=64,
            )
        mask_feats = mask_feats.astype(jnp.dtype(cfg.compute_dtype))
        mask_probs = heads_mod.mask_head(
            params, mask_feats, cfg.mask.head_type, cfg.arch
        )
        masks = jnp.take_along_axis(
            mask_probs, classes[:, None, None, None], axis=-1
        )[..., 0]
        return masks, align_exact

    return forward


def make_keypoint_fn(cfg: ModelConfig):
    """Keypoint-only program: final detection boxes -> decoded keypoints.

    fn(params, image, im_scale, orig_h, orig_w, boxes) ->
      (keypoints (K, P, 4), align_exact ()) with boxes (K, 4) in
    ORIGINAL-image coords. Same role as make_mask_fn for the engine's
    multi-scale path: the keypoint branch runs once on the merged
    detections at the canonical scale."""
    assert cfg.keypoint is not None, "make_keypoint_fn needs a keypoint config"

    def forward(params, image, im_scale, orig_h, orig_w, boxes):
        del orig_h, orig_w
        x = image[None].astype(jnp.dtype(cfg.compute_dtype))
        align_exact = jnp.bool_(True)
        kcfg = cfg.keypoint
        kp_rois = boxes.astype(jnp.float32) * im_scale
        if cfg.use_fpn:
            feats = resnet_mod.multilevel_body(params, x, cfg.arch,
                                               s2d=cfg.s2d_stem)
            pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
            level_feats = [p[0] for p in pyramid]
            kp_levels = map_rois_to_fpn_levels(
                kp_rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level,
                cfg.fpn.roi_canonical_scale, cfg.fpn.roi_canonical_level,
            ) - cfg.fpn.roi_min_level
            kp_feats, kp_exact = _fpn_roi_align(
                cfg, level_feats, kp_rois, kp_levels, kcfg.roi_size
            )
            align_exact = align_exact & kp_exact
        else:
            c4 = resnet_mod.c4_body(params, x, cfg.arch, s2d=cfg.s2d_stem)
            kp_feats = roi_align_matmul(
                c4[0], kp_rois, kcfg.roi_size, kcfg.roi_size,
                cfg.spatial_scale, cfg.roi_sampling_ratio,
                precision=cfg.roi_align_precision, roi_chunk=64,
            )
        kp_feats = kp_feats.astype(jnp.dtype(cfg.compute_dtype))
        heatmaps = heads_mod.keypoint_head(params, kp_feats, kcfg.num_convs)
        return kp_ops.heatmaps_to_keypoints(heatmaps, boxes), align_exact

    return forward


def init_params(cfg: ModelConfig, seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Random parameters with the same blob names the caffe2 importer emits —
    lets every code path (and benchmarks) run without real weights."""
    p = {}
    p.update(resnet_mod.init_resnet_params(cfg.arch, include_c5=True, seed=seed))
    if cfg.use_fpn:
        p.update(fpn_mod.init_fpn_params(cfg.arch, cfg.fpn.channels, seed=seed + 1))
        if cfg.use_rpn:
            p.update(
                rpn_mod.init_rpn_params(
                    cfg.fpn.channels, len(cfg.anchors.aspect_ratios),
                    prefix="_fpn2", seed=seed + 2,
                )
            )
    elif cfg.use_rpn:
        p.update(
            rpn_mod.init_rpn_params(1024, cfg.anchors.num_anchors, prefix="", seed=seed + 2)
        )
    p.update(
        heads_mod.init_box_head_params(
            cfg.box_head, cfg.roi_feature_channels, cfg.num_classes, seed=seed + 3
        )
    )
    if cfg.use_mask:
        p.update(
            heads_mod.init_mask_head_params(cfg.mask.head_type, cfg.num_classes, seed=seed + 4)
        )
    if cfg.keypoint is not None:
        p.update(
            heads_mod.init_keypoint_head_params(
                cfg.keypoint.num_keypoints, cfg.keypoint.num_convs,
                cfg.keypoint.conv_dim,
                cfg.fpn.channels if cfg.use_fpn else 1024, seed=seed + 5,
            )
        )
    return p
