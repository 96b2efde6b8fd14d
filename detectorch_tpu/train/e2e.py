"""End-to-end Faster R-CNN training: RPN + box head, jointly, in ONE jit.

The reference trains only Fast R-CNN from precomputed proposals
(``train_fast.py``); its e2e presets are inference-only. This module adds
upstream-Detectron e2e training semantics — anchor target assignment
(Detectron ``roi_data/rpn.py``), RPN sigmoid-CE + smooth-L1(beta=1/9)
losses (``modeling/rpn_heads.py``), and on-the-fly roi sampling from the
RPN's own proposals (``roi_data/fast_rcnn.py``) — redesigned TPU-first:

  * everything from anchor labeling through roi subsampling runs INSIDE the
    jitted step on padded static shapes; the host uploads only the image and
    the padded gt boxes/classes (a few KB) — there is no host round trip
    between the RPN and the box head;
  * random subsampling uses the jax PRNG: rank-by-uniform-priority under a
    mask, keeping the first k — a fixed-shape equivalent of
    ``npr.choice(..., replace=False)``;
  * "keep at most k, foreground first" becomes a stable argsort over a
    (fg=0, bg=1, dropped=2) priority vector, so downstream fixed-capacity
    branches can statically slice foreground rows (same contract as
    ``train/sampler.sample_rois``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from detectorch_tpu.config import ModelConfig, SamplerConfig
from detectorch_tpu.models import rpn as rpn_mod
from detectorch_tpu.ops import boxes as box_ops
from detectorch_tpu.ops.anchors import shifted_anchors
from detectorch_tpu.train import losses


def random_keep_mask(mask, k, key, max_keep=None):
    """Keep at most `k` (traced or static) True entries of `mask`, chosen
    uniformly without replacement (Detectron's npr.choice subsampling,
    fixed-shape): keep the k smallest uniform priorities among the masked
    entries.

    max_keep: static upper bound on k. When given, selection runs as
    `lax.top_k(max_keep)` + a max_keep-row scatter instead of a full
    argsort — on the 270k-anchor RPN target assignment this replaces two
    full 270k sorts per call with 256-element top-ks (measured −7.9 ms
    per e2e step, bit-identical losses; PERF.md round 4). Selection set
    is identical: the k smallest of iid uniforms over the masked set is
    a uniform k-subset either way.
    """
    u = jnp.where(mask, jax.random.uniform(key, mask.shape), jnp.inf)
    n = mask.shape[0]
    kmax = n if max_keep is None else int(min(max_keep, n))
    _, sel = jax.lax.top_k(-u, kmax)
    keep_sel = jnp.arange(kmax) < k
    keep = jnp.zeros((n,), bool).at[sel].set(keep_sel)
    return mask & keep


def rpn_targets(
    anchors,
    gt_boxes,
    gt_valid,
    im_h,
    im_w,
    key,
    batch_size: int = 256,
    fg_fraction: float = 0.5,
    positive_overlap: float = 0.7,
    negative_overlap: float = 0.3,
):
    """Anchor labels + regression targets (Detectron roi_data/rpn.py
    _get_rpn_blobs, straddle_thresh=0 semantics), on device.

    anchors (A, 4); gt_boxes (G, 4) padded; gt_valid (G,) bool.
    Returns (labels (A,) int32 in {-1, 0, 1}, targets (A, 4) fp32):
      - only anchors fully inside the image participate;
      - positive: IoU >= 0.7 with any gt, PLUS every anchor tying the
        per-gt max overlap (so each gt keeps at least one anchor);
      - negative: max IoU < 0.3;
      - subsampled to `batch_size` with at most fg_fraction positives,
        uniformly at random (excess disabled to -1);
      - targets: anchor -> assigned gt transform, weights (1,1,1,1).
    """
    gvalid = gt_valid.astype(jnp.float32)
    inside = (
        (anchors[:, 0] >= 0.0)
        & (anchors[:, 1] >= 0.0)
        & (anchors[:, 2] < im_w)
        & (anchors[:, 3] < im_h)
    )
    ov = box_ops.bbox_overlaps(anchors, gt_boxes) * gvalid[None, :]
    ov = jnp.where(inside[:, None], ov, 0.0)
    anchor_max = ov.max(axis=1)
    anchor_argmax = ov.argmax(axis=1)
    gt_max = ov.max(axis=0)  # (G,)
    ties_gt_max = (ov == gt_max[None, :]) & (gt_max > 0.0)[None, :]
    pos = inside & ((anchor_max >= positive_overlap) | ties_gt_max.any(axis=1))
    neg = inside & (anchor_max < negative_overlap) & ~pos

    k1, k2 = jax.random.split(key)
    num_fg = int(fg_fraction * batch_size)
    keep_pos = random_keep_mask(pos, num_fg, k1, max_keep=num_fg)
    n_neg = batch_size - keep_pos.sum()
    keep_neg = random_keep_mask(neg, n_neg, k2, max_keep=batch_size)

    labels = jnp.where(keep_pos, 1, jnp.where(keep_neg, 0, -1)).astype(jnp.int32)
    targets = box_ops.bbox_transform_inv(
        anchors, gt_boxes[anchor_argmax], (1.0, 1.0, 1.0, 1.0)
    ).astype(jnp.float32)
    return labels, targets


def rpn_losses(cls_logits, bbox_pred, labels, targets,
               batch_size: int = 256, beta: float = 1.0 / 9.0):
    """RPN losses over the sampled anchors (Detectron rpn_heads semantics):
    sigmoid CE averaged over the `batch_size` sampled anchors; smooth-L1
    (beta 1/9) on positive anchors, sum normalised by `batch_size`.

    cls_logits (A,); bbox_pred (A, 4); labels (A,) {-1,0,1}; targets (A, 4).
    """
    sampled = labels >= 0
    per = losses.sigmoid_cross_entropy_with_logits(
        cls_logits, (labels == 1).astype(jnp.float32))
    n = jnp.maximum(sampled.sum().astype(jnp.float32), 1.0)
    loss_cls = jnp.sum(jnp.where(sampled, per, 0.0)) / n

    d = bbox_pred.astype(jnp.float32) - targets
    ad = jnp.abs(d)
    flag = (ad < beta).astype(jnp.float32)
    sl1 = flag * 0.5 * d * d / beta + (1.0 - flag) * (ad - 0.5 * beta)
    w = (labels == 1).astype(jnp.float32)[:, None]
    loss_bbox = jnp.sum(sl1 * w) / float(batch_size)
    return loss_cls, loss_bbox


class SampledRois(NamedTuple):
    rois: jax.Array      # (R, 4) input-image coords, fg rows first
    labels: jax.Array    # (R,) int32 (0 = bg)
    targets: jax.Array   # (R, 5) compact [cls, tx, ty, tw, th]
    valid: jax.Array     # (R,) bool
    gt_inds: jax.Array   # (R,) int32 assigned-gt row (argmax IoU; junk on
                         # bg/padded rows — consumers gate on labels > 0)


def sample_rois_device(
    prop_boxes,
    prop_valid,
    gt_boxes,
    gt_classes,
    gt_valid,
    key,
    cfg: SamplerConfig = SamplerConfig(),
):
    """Fast R-CNN roi sampling from live RPN proposals, on device (Detectron
    roi_data/fast_rcnn.py:_sample_rois; gt boxes are appended to the
    candidate pool exactly as Detectron's add_proposals does during e2e
    training). Output rows: sampled fg first, then bg, padded with
    valid=False — the same contract as the host sampler, so the existing
    box-branch loss consumes it unchanged."""
    rois = jnp.concatenate([prop_boxes, gt_boxes], axis=0)
    cand = jnp.concatenate([prop_valid, gt_valid], axis=0)
    gvalid = gt_valid.astype(jnp.float32)
    ov = box_ops.bbox_overlaps(rois, gt_boxes) * gvalid[None, :]
    max_ov = ov.max(axis=1)
    amax = ov.argmax(axis=1)

    fg = cand & (max_ov >= cfg.fg_thresh)
    bg = cand & (max_ov < cfg.bg_thresh_hi) & (max_ov >= cfg.bg_thresh_lo)

    r = cfg.rois_per_image
    fg_cap = int(round(cfg.fg_fraction * r))
    k1, k2, k3 = jax.random.split(key, 3)
    keep_fg = random_keep_mask(fg, fg_cap, k1, max_keep=fg_cap)
    n_bg = r - keep_fg.sum()
    keep_bg = random_keep_mask(bg, n_bg, k2, max_keep=r)

    # fg rows first, then bg, then everything else; random tiebreak inside
    # each class mirrors npr.choice's unordered draw
    pri = jnp.where(keep_fg, 0.0, jnp.where(keep_bg, 1.0, 2.0))
    pri = pri + jax.random.uniform(k3, pri.shape, maxval=0.5)
    order = jnp.argsort(pri)[:r]

    sel_rois = rois[order]
    sel_fg = keep_fg[order]
    sel_valid = (keep_fg | keep_bg)[order]
    sel_labels = jnp.where(sel_fg, gt_classes[amax[order]], 0).astype(jnp.int32)
    deltas = box_ops.bbox_transform_inv(
        sel_rois, gt_boxes[amax[order]], (10.0, 10.0, 5.0, 5.0)
    )
    deltas = jnp.where(sel_fg[:, None], deltas, 0.0)
    compact = jnp.concatenate(
        [sel_labels[:, None].astype(jnp.float32), deltas], axis=1
    )
    return SampledRois(sel_rois, sel_labels, compact, sel_valid,
                       amax[order].astype(jnp.int32))


# Per-gt raster resolution for device-side mask targets and the matching
# binarization threshold. Calibrated against the host oracle
# (train/sampler.polys_to_mask_wrt_box on the sampled roi, upstream
# Detectron's exact transform) over jittered fg rois on random polygons:
# 56/0.15 maximises target IoU for both head resolutions (M=28: mean 0.963
# / min 0.895; M=14: mean 0.918 / min 0.814 — the coarse M=14 grid itself
# dominates there). Higher raster resolutions score WORSE at thr=0.5
# because the pycocotools rasterizer dilates boundaries by ~half a pixel
# AT ITS OWN resolution — the low threshold restores that dilation.
# tests/test_e2e_train.py::test_mask_targets_device_match_host pins this.
GT_RASTER_RES = 56
GT_RASTER_THRESH = 0.15


def mask_targets_device(gt_rasters, gt_boxes, gt_inds, rois,
                        resolution: int,
                        thresh: float = GT_RASTER_THRESH):
    """Mask training targets for rois chosen INSIDE the jit.

    The TPU-first replacement for upstream Detectron's host-side
    ``polys_to_mask_wrt_box`` per sampled roi (roi_data/mask_rcnn.py): the
    host rasterises each gt's polygons ONCE wrt its own gt box at
    ``GT_RASTER_RES`` (a few KB per image, uploaded with the batch), and
    the device crop-resizes the assigned gt's raster into each sampled
    roi's frame — so roi sampling and target construction both live in the
    jitted step with no host round trip.

    gt_rasters (G, Mg, Mg) uint8/float {0,1} — polys_to_mask_wrt_box(
    segm, gt_box, Mg) host-side; gt_boxes (G, 4) SAME coordinate frame as
    rois; gt_inds (R,) int32 assigned gt per roi; rois (R, 4).
    Returns (R, M, M) float32 {0,1}.

    Formulation: bilinear interpolation is separable, so the crop is two
    small matmuls per roi — vals = Wv @ raster @ Wu^T with weight rows
    max(0, 1 - |coord - k|) (exactly the two-tap bilinear weights, with
    coords outside [-1, Mg] getting all-zero rows = the constant-0
    out-of-box padding; the gt box is the polygon's tight bounding box,
    so the mask is identically 0 there). This runs on the MXU; the
    equivalent per-element map_coordinates gather form measured 36 ms of
    VPU address-generation per e2e Mask train step (batch 8, PERF.md).
    """
    mg = gt_rasters.shape[-1]
    rast = gt_rasters[gt_inds].astype(jnp.float32)          # (R, Mg, Mg)
    gb = gt_boxes[gt_inds]
    gw = jnp.maximum(gb[:, 2] - gb[:, 0], 1.0)
    gh = jnp.maximum(gb[:, 3] - gb[:, 1], 1.0)
    rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    # raster pixel j covers polygon coordinate ~[j, j+1) at its resolution
    # (pycocotools rounds up-scaled coords), so index = normalised coord *
    # Mg with NO half-pixel shift — the empirically-best convention (see
    # calibration note above)
    j = jnp.arange(resolution, dtype=jnp.float32) / resolution
    xs = rois[:, 0:1] + j[None, :] * rw[:, None]            # (R, M)
    ys = rois[:, 1:2] + j[None, :] * rh[:, None]
    u = (xs - gb[:, 0:1]) * mg / gw[:, None]
    v = (ys - gb[:, 1:2]) * mg / gh[:, None]

    k = jnp.arange(mg, dtype=jnp.float32)
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] - k))  # (R, M, Mg)
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(v[:, :, None] - k))
    vals = jnp.einsum("rim,rmn,rjn->rij", wv, rast, wu,
                      precision=jax.lax.Precision.HIGHEST)
    return (vals >= thresh).astype(jnp.float32)


def keypoint_labels_device(kps, rois, heatmap_size: int):
    """Heatmap bin labels for rois chosen inside the jit — jnp mirror of
    train/sampler.keypoints_to_heatmap_labels (upstream Detectron
    keypoint_utils semantics) in fp32 instead of the host's float64.

    kps (R, P, 3) [x, y, v] assigned-gt keypoints per roi, SAME coordinate
    frame as rois; rois (R, 4). Returns (labels (R, P) int32 flat y*S + x,
    valid (R, P) bool). Only a keypoint exactly ON the right/bottom roi
    edge clamps into the last bin; strictly-outside and unlabeled (v == 0)
    keypoints are invalid."""
    s = float(heatmap_size)
    off_x, off_y = rois[:, 0:1], rois[:, 1:2]
    scale_x = s / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-6)
    scale_y = s / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-6)
    x_edge = kps[:, :, 0] == rois[:, 2:3]
    y_edge = kps[:, :, 1] == rois[:, 3:4]
    x = jnp.floor((kps[:, :, 0] - off_x) * scale_x)
    y = jnp.floor((kps[:, :, 1] - off_y) * scale_y)
    x = jnp.where(x_edge, s - 1.0, x)
    y = jnp.where(y_edge, s - 1.0, y)
    valid_loc = (x >= 0) & (y >= 0) & (x < s) & (y < s)
    valid = valid_loc & (kps[:, :, 2] > 0)
    labels = (y * s + x).astype(jnp.int32)
    return jnp.where(valid, labels, 0), valid


def _level_anchors(cfg: ModelConfig, shapes):
    """Static anchor tables for the given RPN feature shapes.

    FPN: one (fh, fw) per RPN level 2..6, stride 2**lvl, single size
    32 * 2**(lvl-2) (same table make_inference_fn builds,
    models/detector.py:98-104); C4: one level, cfg.anchors sizes."""
    out = []
    if cfg.use_fpn:
        for i, (fh, fw) in enumerate(shapes):
            lvl = cfg.fpn.roi_min_level + i  # RPN levels 2..6
            out.append(shifted_anchors(
                int(fh), int(fw), float(2 ** lvl), (32.0 * 2 ** (lvl - 2),),
                tuple(cfg.anchors.aspect_ratios),
            ))
    else:
        (fh, fw), = shapes
        out.append(shifted_anchors(
            int(fh), int(fw), 1.0 / cfg.spatial_scale,
            tuple(cfg.anchors.sizes), tuple(cfg.anchors.aspect_ratios),
        ))
    return out


def e2e_losses(params, cfg: ModelConfig, sampler_cfg: SamplerConfig,
               image, gt_boxes, gt_classes, gt_valid, info, key,
               rpn_batch_size: int = 256,
               train_pre_nms: int = 12000, train_post_nms: int = 2000,
               extras=None, fused_roi_align=None):
    """Single-image joint RPN + box-head loss; backbone runs ONCE.

    info: (3,) [resized_h, resized_w, im_scale] (traced; the static padded
    dims come from image.shape). gt_boxes are in input-image coords.
    Train-time proposal counts follow the reference's train branch
    (generate_proposals.py / detector.py: pre 12000, post 2000).

    extras (optional dict) turns on the e2e mask / keypoint branches — the
    full e2e_mask_rcnn / e2e_keypoint_rcnn training families the reference
    lists but cannot train (README.md:30-32; its train_fast.py is box-only):
      gt_masks (G, Mg, Mg) uint8 per-gt rasters wrt their own gt boxes
        (train/sampler.polys_to_mask_wrt_box(segm, gt_box, GT_RASTER_RES)),
      gt_mask_valid (G,) bool (False for gts without polygon segms),
      gt_keypoints (G, P, 3) [x, y, v] in input-image coords.
    The branches run on the FIRST fg-capacity sampled rows (the sampler
    places fg first) with targets computed on device (mask_targets_device /
    keypoint_labels_device) — nothing about the rois ever leaves the jit.
    """
    from detectorch_tpu.models import fpn as fpn_mod
    from detectorch_tpu.models import heads as heads_mod
    from detectorch_tpu.models import resnet as resnet_mod
    from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels
    from detectorch_tpu.ops.roi_align import multilevel_roi_align, roi_align_matmul
    from detectorch_tpu.train.train_step import expand_bbox_targets_device

    im_h, im_w, im_scale = info[0], info[1], info[2]
    x = image[None].astype(jnp.dtype(cfg.compute_dtype))

    # ---- backbone + RPN head over all levels -----------------------------
    if cfg.use_fpn:
        feats = resnet_mod.multilevel_body(params, x, cfg.arch,
                                               s2d=cfg.s2d_stem)
        pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
        rpn_feats = list(pyramid)
        if cfg.fpn.extra_level:
            rpn_feats.append(fpn_mod.subsample2x(pyramid[-1]))
        prefix = "_fpn2"
    else:
        c4 = resnet_mod.c4_body(params, x, cfg.arch, s2d=cfg.s2d_stem)
        rpn_feats = [c4]
        prefix = ""

    lvl_logits, lvl_deltas = [], []
    for feat in rpn_feats:
        lg, dl = rpn_mod.rpn_head(params, feat, prefix=prefix,
                                  return_logits=True)
        lvl_logits.append(lg[0])
        lvl_deltas.append(dl[0])

    anchors = _level_anchors(
        cfg, [l.shape[:2] for l in lvl_logits]
    )
    all_anchors = jnp.concatenate([jnp.asarray(a) for a in anchors], axis=0)
    all_logits = jnp.concatenate([l.reshape(-1) for l in lvl_logits])
    all_deltas = jnp.concatenate([d.reshape(-1, 4) for d in lvl_deltas])

    # ---- RPN losses ------------------------------------------------------
    k_anchor, k_roi = jax.random.split(key)
    labels, targets = rpn_targets(
        all_anchors, gt_boxes, gt_valid, im_h, im_w, k_anchor,
        batch_size=rpn_batch_size,
    )
    loss_rpn_cls, loss_rpn_bbox = rpn_losses(
        all_logits, all_deltas, labels, targets, batch_size=rpn_batch_size
    )

    # ---- proposals at train counts (no gradient flows through them,
    # exactly like the reference's numpy-side proposal generation) --------
    lvl_props = []
    for feat_logits, feat_deltas, (fh, fw) in zip(
        lvl_logits, lvl_deltas, [l.shape[:2] for l in lvl_logits]
    ):
        prob = jax.nn.sigmoid(jax.lax.stop_gradient(feat_logits))
        dl = jax.lax.stop_gradient(feat_deltas)
        if cfg.use_fpn:
            lvl = cfg.fpn.roi_min_level + len(lvl_props)
            p = rpn_mod.generate_proposals(
                prob, dl, im_h, im_w, im_scale,
                feat_stride=float(2 ** lvl),
                anchor_sizes=(32.0 * 2 ** (lvl - 2),),
                anchor_aspect_ratios=tuple(cfg.anchors.aspect_ratios),
                pre_nms_top_n=min(
                    train_pre_nms,
                    fh * fw * len(cfg.anchors.aspect_ratios)),
                post_nms_top_n=train_post_nms,
                nms_thresh=cfg.rpn.nms_thresh,
                min_size=cfg.rpn.min_size,
            )
        else:
            p = rpn_mod.generate_proposals(
                prob, dl, im_h, im_w, im_scale,
                feat_stride=1.0 / cfg.spatial_scale,
                anchor_sizes=tuple(cfg.anchors.sizes),
                anchor_aspect_ratios=tuple(cfg.anchors.aspect_ratios),
                pre_nms_top_n=min(
                    train_pre_nms,
                    fh * fw * len(cfg.anchors.sizes)
                    * len(cfg.anchors.aspect_ratios)),
                post_nms_top_n=train_post_nms,
                nms_thresh=cfg.rpn.nms_thresh,
                min_size=cfg.rpn.min_size,
            )
        lvl_props.append(p)
    props = (rpn_mod.collect_proposals(lvl_props, train_post_nms)
             if cfg.use_fpn else lvl_props[0])

    # ---- roi sampling + box branch --------------------------------------
    sampled = sample_rois_device(
        props.boxes, props.valid, gt_boxes, gt_classes, gt_valid, k_roi,
        sampler_cfg,
    )
    rois, roi_labels, roi_valid = sampled.rois, sampled.labels, sampled.valid
    if cfg.use_fpn:
        levels = map_rois_to_fpn_levels(
            rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level
        ) - cfg.fpn.roi_min_level
        if fused_roi_align is not None:
            # Pallas slab forward + gather VJP (measured 19% faster train
            # step; ops/roi_align.make_multilevel_roi_align_fused)
            roi_feats = fused_roi_align[cfg.roi_size](
                [p[0] for p in pyramid], rois, levels)
        else:
            roi_feats = multilevel_roi_align(
                [p[0] for p in pyramid], rois, levels, cfg.fpn_spatial_scales,
                cfg.roi_size, cfg.roi_size, cfg.roi_sampling_ratio,
            )
        box_feats = heads_mod.mlp_box_head(
            params, roi_feats, jnp.dtype(cfg.compute_dtype)
        )
    else:
        roi_feats = roi_align_matmul(
            c4[0], rois, cfg.roi_size, cfg.roi_size,
            cfg.spatial_scale, cfg.roi_sampling_ratio,
            precision=cfg.roi_align_precision,
        ).astype(jnp.dtype(cfg.compute_dtype))
        box_feats = heads_mod.res5_box_head(params, roi_feats, cfg.arch)

    cls_logits, bbox_pred = heads_mod.box_predictors(
        params, box_feats, output_prob=False,
        dtype=jnp.dtype(cfg.compute_dtype),
    )
    t, iw = expand_bbox_targets_device(sampled.targets, cfg.num_classes)
    ow = (iw > 0).astype(iw.dtype)
    n_valid = jnp.maximum(roi_valid.sum().astype(jnp.float32), 1.0)
    loss_cls = losses.softmax_cross_entropy(cls_logits, roi_labels, roi_valid)
    vmask = roi_valid.astype(jnp.float32)[:, None]
    loss_bbox = losses.smooth_l1(
        bbox_pred, t, iw * vmask, ow * vmask
    ) * bbox_pred.shape[0] / n_valid
    acc = losses.accuracy(cls_logits, roi_labels, roi_valid)

    total = loss_cls + loss_bbox + loss_rpn_cls + loss_rpn_bbox
    metrics = {
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "loss_rpn_cls": loss_rpn_cls,
        "loss_rpn_bbox": loss_rpn_bbox,
        "accuracy": acc,
    }

    if fused_roi_align is not None:
        # slab-overflow observability (see train_step.box_branch_loss): the
        # fraction of sampled rois whose footprint exceeds the Pallas
        # 64-slab and got crop-clamped features. Evaluated at the LARGEST
        # pooled size any enabled branch uses — conservative for all of
        # them (slab_fits docstring).
        from detectorch_tpu.ops.pallas.roi_align_kernel import slab_fits

        max_pooled = max(
            [cfg.roi_size]
            + ([cfg.mask.roi_size] if cfg.use_mask and extras
               and "gt_masks" in extras else [])
            + ([cfg.keypoint.roi_size] if cfg.keypoint is not None and extras
               and "gt_keypoints" in extras else [])
        )
        fits = slab_fits(
            rois, levels, [p.shape[1:3] for p in pyramid],
            cfg.fpn_spatial_scales, max_pooled, max_pooled,
            cfg.roi_sampling_ratio,
        )
        metrics["frac_rois_overflowed"] = (
            jnp.sum(jnp.where(roi_valid, (~fits).astype(jnp.float32), 0.0))
            / n_valid)

    extras = extras or {}
    fg_rows = int(round(sampler_cfg.fg_fraction * sampler_cfg.rois_per_image))
    fg_mask = (roi_labels[:fg_rows] > 0) & roi_valid[:fg_rows]

    def _branch_feats(branch_rois, size):
        if cfg.use_fpn:
            blevels = map_rois_to_fpn_levels(
                branch_rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level
            ) - cfg.fpn.roi_min_level
            if fused_roi_align is not None and size in fused_roi_align:
                return fused_roi_align[size](
                    [p[0] for p in pyramid], branch_rois, blevels)
            return multilevel_roi_align(
                [p[0] for p in pyramid], branch_rois, blevels,
                cfg.fpn_spatial_scales, size, size, cfg.roi_sampling_ratio,
            )
        return roi_align_matmul(
            c4[0], branch_rois, size, size,
            cfg.spatial_scale, cfg.roi_sampling_ratio,
            precision=cfg.roi_align_precision,
        )

    if cfg.use_mask and "gt_masks" in extras:
        mrois = rois[:fg_rows]
        mask_feats = _branch_feats(mrois, cfg.mask.roi_size)
        mask_logits = heads_mod.mask_head(
            params, mask_feats.astype(jnp.dtype(cfg.compute_dtype)),
            cfg.mask.head_type, cfg.arch, output_prob=False,
        )  # (Rf, M, M, K)
        mt = mask_targets_device(
            extras["gt_masks"], gt_boxes, sampled.gt_inds[:fg_rows], mrois,
            cfg.mask.resolution,
        )
        mvalid = fg_mask & extras["gt_mask_valid"][sampled.gt_inds[:fg_rows]]
        loss_mask = losses.mask_loss(
            mask_logits, mt, roi_labels[:fg_rows], mvalid
        )
        total = total + loss_mask
        metrics["loss_mask"] = loss_mask

    if cfg.keypoint is not None and "gt_keypoints" in extras:
        kcfg = cfg.keypoint
        krois = rois[:fg_rows]
        kp_feats = _branch_feats(krois, kcfg.roi_size)
        heatmaps = heads_mod.keypoint_head(
            params, kp_feats.astype(jnp.dtype(cfg.compute_dtype)),
            kcfg.num_convs,
        )
        kp = extras["gt_keypoints"][sampled.gt_inds[:fg_rows]]
        kp_labels, kp_valid = keypoint_labels_device(
            kp, krois, kcfg.heatmap_size
        )
        kp_valid = kp_valid & fg_mask[:, None]
        loss_kps = losses.keypoint_loss(heatmaps, kp_labels, kp_valid)
        total = total + loss_kps
        metrics["loss_kps"] = loss_kps

    return total, metrics


def make_e2e_train_step(cfg: ModelConfig, solver_cfg=None,
                        sampler_cfg: SamplerConfig = SamplerConfig(),
                        seed: int = 0,
                        train_pre_nms: int = 12000,
                        train_post_nms: int = 2000,
                        train_mask: bool = False,
                        train_keypoints: bool = False,
                        device_input: bool = False,
                        blob_hw: Tuple[int, int] = (1344, 1344),
                        roi_align_impl: str = "gather",
                        bwd_precision: str = "bf16"):
    """(init_state, make_step) for e2e training (RPN + box head, plus the
    mask / keypoint branches when enabled — the e2e_mask_rcnn /
    e2e_keypoint_rcnn families).

    Batch schema (leading batch axis): image (B,H,W,3) fp32 padded blobs,
    gt_boxes (B,G,4) input-scaled, gt_classes (B,G) int32, gt_valid (B,G)
    bool, info (B,3) [resized_h, resized_w, im_scale]. With
    device_input=True the fp32 image is replaced by the uint8 schema
    raw (B,RH,RW,3) + tables (B,4,L) + meta (B,7) (data/device_input
    packing, ~10x less H2D per iteration) and info is derived from meta.
    train_mask adds gt_masks (B,G,Mg,Mg) uint8 + gt_mask_valid (B,G);
    train_keypoints adds gt_keypoints (B,G,P,3) input-scaled. The per-image
    subsampling PRNG is derived from `seed` and the optimizer step, so runs
    are reproducible and resume-stable."""
    import optax

    from detectorch_tpu.config import SolverConfig
    from detectorch_tpu.train import solver as solver_mod
    from detectorch_tpu.train.train_step import TrainState

    solver_cfg = solver_cfg or SolverConfig()
    if train_mask:
        assert cfg.use_mask, "train_mask=True needs a mask preset"
    if train_keypoints:
        assert cfg.keypoint is not None, (
            "train_keypoints=True needs the keypoint preset")
    from detectorch_tpu.train.train_step import ROI_ALIGN_IMPLS

    if roi_align_impl not in ROI_ALIGN_IMPLS:
        raise ValueError(
            f"unknown roi_align_impl {roi_align_impl!r}; "
            f"expected one of {ROI_ALIGN_IMPLS}")
    fused = None
    if roi_align_impl.startswith("pallas"):
        # see train_step.make_train_step: 'pallas' | 'pallas-mm' | 'pallas-zero';
        # bwd_precision selects the matmul-VJP tier (BWD_PRECISIONS)
        assert cfg.use_fpn, "the Pallas slab kernel is the FPN path"
        from detectorch_tpu.ops.roi_align import make_multilevel_roi_align_fused

        bwd = {"pallas": "gather", "pallas-mm": "matmul",
               "pallas-slab": "slab", "pallas-zero": "none"}[roi_align_impl]
        sizes = {cfg.roi_size}
        if train_mask:
            sizes.add(cfg.mask.roi_size)
        if train_keypoints:
            sizes.add(cfg.keypoint.roi_size)
        fused = {
            s: make_multilevel_roi_align_fused(
                cfg.fpn_spatial_scales, s, s, cfg.roi_sampling_ratio, bwd=bwd,
                bwd_precision=bwd_precision,
                fwd_precision=cfg.roi_align_fwd_precision)
            for s in sizes
        }

    def _extras(batch):
        extra = {}
        if train_mask:
            extra["gt_masks"] = batch["gt_masks"]
            extra["gt_mask_valid"] = batch["gt_mask_valid"]
        if train_keypoints:
            extra["gt_keypoints"] = batch["gt_keypoints"]
        return extra

    def batched_loss(params, batch, step):
        base = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        nb = (batch["raw"] if device_input else batch["image"]).shape[0]
        keys = jax.random.split(base, nb)

        def one(image, gt_boxes, gt_classes, gt_valid, info, key, extra):
            return e2e_losses(
                params, cfg, sampler_cfg, image, gt_boxes, gt_classes,
                gt_valid, info, key, train_pre_nms=train_pre_nms,
                train_post_nms=train_post_nms, extras=extra,
                fused_roi_align=fused,
            )

        if device_input:
            from detectorch_tpu.data.device_input import device_preprocess

            def one_raw(raw, tables, meta, gt_boxes, gt_classes, gt_valid,
                        key, extra):
                out_h, out_w = blob_hw  # static: the fixed training bucket
                image = device_preprocess(
                    raw,
                    tables[0, :out_h].astype(jnp.int32), tables[1, :out_h],
                    tables[2, :out_w].astype(jnp.int32), tables[3, :out_w],
                    meta[0].astype(jnp.int32), meta[1].astype(jnp.int32),
                    meta[2].astype(jnp.int32), meta[3].astype(jnp.int32),
                )
                info = meta[2:5]  # [rsz_h, rsz_w, scale]
                return one(image, gt_boxes, gt_classes, gt_valid, info,
                           key, extra)

            total, metrics = jax.vmap(one_raw)(
                batch["raw"], batch["tables"], batch["meta"],
                batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
                keys, _extras(batch),
            )
            return jnp.mean(total), jax.tree.map(jnp.mean, metrics)

        total, metrics = jax.vmap(one)(
            batch["image"], batch["gt_boxes"], batch["gt_classes"],
            batch["gt_valid"], batch["info"], keys, _extras(batch),
        )
        return jnp.mean(total), jax.tree.map(jnp.mean, metrics)

    def init_state(params):
        mask = solver_mod.frozen_mask(params)
        tx = solver_mod.make_optimizer(solver_cfg, mask)
        params = {k: jnp.asarray(v) for k, v in params.items()}
        return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params)), tx

    def make_step_fn(tx):
        def step_fn(state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                batched_loss, has_aux=True
            )(state.params, batch, state.step)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics, loss=loss,
                           lr=solver_mod.get_lr_at_iter(state.step, solver_cfg))
            return TrainState(state.step + 1, params, opt_state), metrics

        return step_fn

    return init_state, make_step_fn
