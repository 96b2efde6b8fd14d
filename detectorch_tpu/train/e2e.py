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


def random_keep_mask(mask, k, key):
    """Keep at most `k` (traced or static) True entries of `mask`, chosen
    uniformly without replacement (Detectron's npr.choice subsampling,
    fixed-shape): rank masked entries by uniform priority, keep rank < k."""
    u = jnp.where(mask, jax.random.uniform(key, mask.shape), jnp.inf)
    rank = jnp.argsort(jnp.argsort(u))
    return mask & (rank < k)


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
    keep_pos = random_keep_mask(pos, num_fg, k1)
    n_neg = batch_size - keep_pos.sum()
    keep_neg = random_keep_mask(neg, n_neg, k2)

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
    keep_fg = random_keep_mask(fg, fg_cap, k1)
    n_bg = r - keep_fg.sum()
    keep_bg = random_keep_mask(bg, n_bg, k2)

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
    return SampledRois(sel_rois, sel_labels, compact, sel_valid)


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
               train_pre_nms: int = 12000, train_post_nms: int = 2000):
    """Single-image joint RPN + box-head loss; backbone runs ONCE.

    info: (3,) [resized_h, resized_w, im_scale] (traced; the static padded
    dims come from image.shape). gt_boxes are in input-image coords.
    Train-time proposal counts follow the reference's train branch
    (generate_proposals.py / detector.py: pre 12000, post 2000).
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
        feats = resnet_mod.multilevel_body(params, x, cfg.arch)
        pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
        rpn_feats = list(pyramid)
        if cfg.fpn.extra_level:
            rpn_feats.append(fpn_mod.subsample2x(pyramid[-1]))
        prefix = "_fpn2"
    else:
        c4 = resnet_mod.c4_body(params, x, cfg.arch)
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
    return total, metrics


def make_e2e_train_step(cfg: ModelConfig, solver_cfg=None,
                        sampler_cfg: SamplerConfig = SamplerConfig(),
                        seed: int = 0,
                        train_pre_nms: int = 12000,
                        train_post_nms: int = 2000):
    """(init_state, make_step) for e2e Faster R-CNN training.

    Batch schema (leading batch axis): image (B,H,W,3) fp32 padded blobs,
    gt_boxes (B,G,4) input-scaled, gt_classes (B,G) int32, gt_valid (B,G)
    bool, info (B,3) [resized_h, resized_w, im_scale]. The per-image
    subsampling PRNG is derived from `seed` and the optimizer step, so runs
    are reproducible and resume-stable."""
    import optax

    from detectorch_tpu.config import SolverConfig
    from detectorch_tpu.train import solver as solver_mod
    from detectorch_tpu.train.train_step import TrainState

    solver_cfg = solver_cfg or SolverConfig()

    def batched_loss(params, batch, step):
        base = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        keys = jax.random.split(base, batch["image"].shape[0])

        def one(image, gt_boxes, gt_classes, gt_valid, info, key):
            return e2e_losses(
                params, cfg, sampler_cfg, image, gt_boxes, gt_classes,
                gt_valid, info, key, train_pre_nms=train_pre_nms,
                train_post_nms=train_post_nms,
            )

        total, metrics = jax.vmap(one)(
            batch["image"], batch["gt_boxes"], batch["gt_classes"],
            batch["gt_valid"], batch["info"], keys,
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
