"""Jitted Fast R-CNN training step + state management.

Reference training loop: ``train_fast.py:115-194`` (forward, CE + smooth-L1,
grad clip 35, SGD momentum, per-iter LR). The TPU version compiles the whole
step — forward, loss, backward, clip, update — into one XLA program; the
batch axis shards over the mesh 'data' axis and XLA inserts the gradient
all-reduce (replacing the reference's torch DataParallel scatter/gather,
``lib/utils/data_parallel.py``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from detectorch_tpu.config import ModelConfig, SolverConfig
from detectorch_tpu.models import heads as heads_mod
from detectorch_tpu.models import resnet as resnet_mod
from detectorch_tpu.models import fpn as fpn_mod
from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels
from detectorch_tpu.ops.roi_align import multilevel_roi_align, roi_align_matmul
from detectorch_tpu.train import losses
from detectorch_tpu.train import solver as solver_mod


class TrainState(NamedTuple):
    step: jax.Array
    params: Dict
    opt_state: optax.OptState


def box_branch_loss(params, cfg: ModelConfig, image, rois, labels,
                    bbox_targets, bbox_inside_weights, bbox_outside_weights,
                    valid, kp_labels=None, kp_valid=None,
                    mask_targets=None, mask_valid=None,
                    fused_roi_align=None):
    """Single-image Fast R-CNN loss (reference train_fast.py:141-155).

    When ``cfg.keypoint`` is set and kp_labels/kp_valid (Rk, P) are given,
    the KRCNN keypoint branch also runs on the FIRST Rk rois (the sampler
    places foreground rows first, so a static slice of fg-capacity rows
    covers every possible fg roi; padded/bg rows carry kp_valid=False) and
    its spatial-softmax loss is added (upstream Detectron keypoint_rcnn
    training; the reference repo has no keypoint training code).

    Likewise, when ``cfg.use_mask`` and mask_targets/mask_valid (Rm, M, M)/
    (Rm,) are given, the mask branch runs on the FIRST Rm rois and adds the
    per-pixel sigmoid CE on each fg roi's gt-class channel (upstream
    Detectron mask training; absent from the reference repo)."""
    x = image[None].astype(jnp.dtype(cfg.compute_dtype))
    pyramid = c4 = None
    if cfg.use_fpn:
        feats = resnet_mod.multilevel_body(params, x, cfg.arch,
                                               s2d=cfg.s2d_stem)
        pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
        levels = map_rois_to_fpn_levels(
            rois, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level
        ) - cfg.fpn.roi_min_level
        if fused_roi_align is not None:
            # Pallas slab forward + gather-form VJP (ops/roi_align.
            # make_multilevel_roi_align_fused)
            roi_feats = fused_roi_align(
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
        c4 = resnet_mod.c4_body(params, x, cfg.arch, s2d=cfg.s2d_stem)
        roi_feats = roi_align_matmul(
            c4[0], rois, cfg.roi_size, cfg.roi_size,
            cfg.spatial_scale, cfg.roi_sampling_ratio,
            precision=cfg.roi_align_precision,
        ).astype(jnp.dtype(cfg.compute_dtype))
        box_feats = heads_mod.res5_box_head(params, roi_feats, cfg.arch)

    cls_logits, bbox_pred = heads_mod.box_predictors(
        params, box_feats, output_prob=False, dtype=jnp.dtype(cfg.compute_dtype)
    )
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss_cls = losses.softmax_cross_entropy(cls_logits, labels, valid)
    # smooth_l1 divides by row count; padded rows carry zero weights, so we
    # renormalise to the valid count to match the reference exactly.
    vmask = valid.astype(jnp.float32)[:, None]
    loss_bbox = losses.smooth_l1(
        bbox_pred, bbox_targets,
        bbox_inside_weights * vmask, bbox_outside_weights * vmask,
    ) * bbox_pred.shape[0] / n_valid
    acc = losses.accuracy(cls_logits, labels, valid)
    total = loss_cls + loss_bbox
    metrics = {"loss_cls": loss_cls, "loss_bbox": loss_bbox, "accuracy": acc}

    if fused_roi_align is not None:
        # slab-overflow observability: the Pallas training path accepts
        # crop-clamped values on rois whose footprint exceeds the 64-slab
        # (extreme aspect ratios; ops/roi_align.make_multilevel_roi_align_
        # fused caveat). Inference re-runs such images exactly
        # (eval/engine.py); training surfaces the fraction as a metric so
        # a user training on extreme-aspect data sees it instead of
        # silently eating clamped roi features.
        from detectorch_tpu.ops.pallas.roi_align_kernel import slab_fits

        fits = slab_fits(
            rois, levels, [p.shape[1:3] for p in pyramid],
            cfg.fpn_spatial_scales, cfg.roi_size, cfg.roi_size,
            cfg.roi_sampling_ratio,
        )
        nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        metrics["frac_rois_overflowed"] = (
            jnp.sum(jnp.where(valid, (~fits).astype(jnp.float32), 0.0)) / nv)

    if cfg.keypoint is not None and kp_labels is not None:
        kcfg = cfg.keypoint
        krois = rois[: kp_labels.shape[0]]
        if cfg.use_fpn:
            # same level routing as the box branch: slice its levels so the
            # two branches are provably identical per roi
            klevels = levels[: kp_labels.shape[0]]
            kp_feats = multilevel_roi_align(
                [p[0] for p in pyramid], krois, klevels,
                cfg.fpn_spatial_scales, kcfg.roi_size, kcfg.roi_size,
                cfg.roi_sampling_ratio,
            )
        else:
            kp_feats = roi_align_matmul(
                c4[0], krois, kcfg.roi_size, kcfg.roi_size,
                cfg.spatial_scale, cfg.roi_sampling_ratio,
                precision=cfg.roi_align_precision,
            )
        heatmaps = heads_mod.keypoint_head(
            params, kp_feats.astype(jnp.dtype(cfg.compute_dtype)),
            kcfg.num_convs,
        )
        loss_kps = losses.keypoint_loss(heatmaps, kp_labels, kp_valid)
        total = total + loss_kps
        metrics["loss_kps"] = loss_kps

    if cfg.use_mask and mask_targets is not None:
        rm = mask_targets.shape[0]
        mrois = rois[:rm]
        msize = cfg.mask.roi_size
        if cfg.use_fpn:
            mlevels = levels[:rm]
            mask_feats = multilevel_roi_align(
                [p[0] for p in pyramid], mrois, mlevels,
                cfg.fpn_spatial_scales, msize, msize, cfg.roi_sampling_ratio,
            )
        else:
            mask_feats = roi_align_matmul(
                c4[0], mrois, msize, msize,
                cfg.spatial_scale, cfg.roi_sampling_ratio,
                precision=cfg.roi_align_precision,
            )
        mask_logits = heads_mod.mask_head(
            params, mask_feats.astype(jnp.dtype(cfg.compute_dtype)),
            cfg.mask.head_type, cfg.arch, output_prob=False,
        )  # (Rm, M, M, K)
        loss_mask = losses.mask_loss(
            mask_logits, mask_targets, labels[:rm], mask_valid
        )
        total = total + loss_mask
        metrics["loss_mask"] = loss_mask

    return total, metrics


def expand_bbox_targets_device(compact, num_classes: int):
    """Device-side 4-of-4K expansion (reference fast_rcnn_sample_rois.py:
    139-163 / our train/sampler.expand_bbox_targets, moved into the jitted
    step so the host uploads the COMPACT (R, 5) form — the (R, 4K) fp32
    expansion plus its two weight tensors is ~8 MB per 4-image batch of
    pure zero-padding traffic).

    compact (R, 5) [cls, tx, ty, tw, th] -> (targets (R, 4K), inside (R, 4K)).
    """
    cls = compact[:, 0].astype(jnp.int32)
    onehot = (
        (cls[:, None] == jnp.arange(num_classes, dtype=jnp.int32)[None, :])
        & (cls > 0)[:, None]
    ).astype(compact.dtype)                       # (R, K)
    targets = (onehot[:, :, None] * compact[:, None, 1:5]).reshape(
        compact.shape[0], 4 * num_classes
    )
    inside = jnp.repeat(onehot, 4, axis=1)
    return targets, inside


ROI_ALIGN_IMPLS = ("gather", "pallas", "pallas-mm", "pallas-slab",
                   "pallas-zero")


def make_train_step(cfg: ModelConfig, solver_cfg: SolverConfig = SolverConfig(),
                    device_input: bool = False,
                    blob_hw: Tuple[int, int] = (1344, 1344),
                    train_mask: bool = False,
                    roi_align_impl: str = "gather",
                    bwd_precision: str = "bf16"):
    """Returns (init_state, step_fn) for batched Fast R-CNN training.

    step_fn(state, batch) -> (state, metrics); batch is a dict of arrays with
    leading batch axis.

    device_input=False (host-blob schema): image (B,H,W,3) fp32, rois
    (B,R,4), labels (B,R), bbox_targets (B,R,4K), bbox_inside_weights,
    bbox_outside_weights, valid (B,R).

    device_input=True (uint8 schema, ~10x less H2D per iter): raw
    (B,RH,RW,3) uint8, tables (B,4,L) fp32, meta (B,7) fp32 (the
    data/device_input.prepare_raw packing; horizontal flips are applied to
    the uint8 pixels host-side, exactly like the reference flips before
    resizing — coco_dataset.py:52-53), rois, labels, valid as above, and
    bbox_targets_compact (B,R,5) which the step expands to the 4K form +
    weight tensors on device.
    """
    has_kp = cfg.keypoint is not None
    if train_mask:
        assert cfg.use_mask, "train_mask=True needs a mask preset"
    if roi_align_impl not in ROI_ALIGN_IMPLS:
        raise ValueError(
            f"unknown roi_align_impl {roi_align_impl!r}; "
            f"expected one of {ROI_ALIGN_IMPLS}")
    fused = None
    if roi_align_impl.startswith("pallas"):
        # 'pallas' = Pallas fwd + gather-form VJP; 'pallas-mm' = Pallas fwd
        # + separable-matmul VJP (MXU instead of scatter, measured faster;
        # bwd_precision picks its BWD_PRECISIONS tier — 'bf16' fast,
        # 'high'/'highest' fp32 operands for reference-grade gradients);
        # 'pallas-slab' = Pallas fwd + slab-domain Pallas backward
        # (fp32/HIGHEST, exact for in-slab rois, ~20x fewer FLOPs than the
        # dense matmul VJP); 'pallas-zero' = zero VJP (profiling only).
        assert cfg.use_fpn, "the Pallas slab kernel is the FPN path"
        from detectorch_tpu.ops.roi_align import make_multilevel_roi_align_fused

        bwd = {"pallas": "gather", "pallas-mm": "matmul",
               "pallas-slab": "slab", "pallas-zero": "none"}[roi_align_impl]
        fused = make_multilevel_roi_align_fused(
            cfg.fpn_spatial_scales, cfg.roi_size, cfg.roi_size,
            cfg.roi_sampling_ratio, bwd=bwd, bwd_precision=bwd_precision,
            fwd_precision=cfg.roi_align_fwd_precision,
        )

    def _extras(batch):
        # optional per-image branch blobs, carried as one dict pytree so the
        # branches compose: keypoint presets add kp_labels (B, Rk, P) heatmap
        # bin indices + kp_valid (B, Rk, P); mask training adds mask_targets
        # (B, Rm, M, M) {0,1} + mask_valid (B, Rm) — both over the first
        # fg-capacity roi rows (train/sampler.sample_rois places fg first)
        extra = {}
        if has_kp:
            extra["kp_labels"] = batch["kp_labels"]
            extra["kp_valid"] = batch["kp_valid"]
        if train_mask:
            extra["mask_targets"] = batch["mask_targets"]
            extra["mask_valid"] = batch["mask_valid"]
        return extra

    def batched_loss(params, batch):
        def one(image, rois, labels, t, iw, ow, valid, extra):
            return box_branch_loss(
                params, cfg, image, rois, labels, t, iw, ow, valid,
                fused_roi_align=fused, **extra
            )

        if device_input:
            from detectorch_tpu.data.device_input import device_preprocess

            def one_raw(raw, tables, meta, rois, labels, compact, valid,
                        extra):
                out_h, out_w = blob_hw  # static: the fixed training bucket
                image = device_preprocess(
                    raw,
                    tables[0, :out_h].astype(jnp.int32), tables[1, :out_h],
                    tables[2, :out_w].astype(jnp.int32), tables[3, :out_w],
                    meta[0].astype(jnp.int32), meta[1].astype(jnp.int32),
                    meta[2].astype(jnp.int32), meta[3].astype(jnp.int32),
                )
                t, iw = expand_bbox_targets_device(compact, cfg.num_classes)
                ow = (iw > 0).astype(iw.dtype)
                return one(image, rois, labels, t, iw, ow, valid, extra)

            total, metrics = jax.vmap(one_raw)(
                batch["raw"], batch["tables"], batch["meta"], batch["rois"],
                batch["labels"], batch["bbox_targets_compact"],
                batch["valid"], _extras(batch),
            )
            return jnp.mean(total), jax.tree.map(jnp.mean, metrics)

        total, metrics = jax.vmap(one)(
            batch["image"], batch["rois"], batch["labels"],
            batch["bbox_targets"], batch["bbox_inside_weights"],
            batch["bbox_outside_weights"], batch["valid"], _extras(batch),
        )
        return jnp.mean(total), jax.tree.map(jnp.mean, metrics)

    def init_state(params) -> Tuple[TrainState, optax.GradientTransformation]:
        mask = solver_mod.frozen_mask(params)
        tx = solver_mod.make_optimizer(solver_cfg, mask)
        params = {k: jnp.asarray(v) for k, v in params.items()}
        return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params)), tx

    def make_step_fn(tx):
        def step_fn(state: TrainState, batch):
            (loss, metrics), grads = jax.value_and_grad(batched_loss, has_aux=True)(
                state.params, batch
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics, loss=loss,
                           lr=solver_mod.get_lr_at_iter(state.step, solver_cfg))
            return TrainState(state.step + 1, params, opt_state), metrics

        return step_fn

    return init_state, make_step_fn
