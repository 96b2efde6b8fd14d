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
                    valid):
    """Single-image Fast R-CNN loss (reference train_fast.py:141-155)."""
    x = image[None].astype(jnp.dtype(cfg.compute_dtype))
    if cfg.use_fpn:
        feats = resnet_mod.multilevel_body(params, x, cfg.arch)
        pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
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
        c4 = resnet_mod.c4_body(params, x, cfg.arch)
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
    return loss_cls + loss_bbox, {
        "loss_cls": loss_cls, "loss_bbox": loss_bbox, "accuracy": acc,
    }


def make_train_step(cfg: ModelConfig, solver_cfg: SolverConfig = SolverConfig()):
    """Returns (init_state, step_fn) for batched Fast R-CNN training.

    step_fn(state, batch) -> (state, metrics); batch is a dict of arrays with
    leading batch axis: image (B,H,W,3), rois (B,R,4), labels (B,R),
    bbox_targets (B,R,4K), bbox_inside_weights, bbox_outside_weights,
    valid (B,R).
    """
    def batched_loss(params, batch):
        def one(image, rois, labels, t, iw, ow, valid):
            return box_branch_loss(
                params, cfg, image, rois, labels, t, iw, ow, valid
            )

        total, metrics = jax.vmap(one)(
            batch["image"], batch["rois"], batch["labels"],
            batch["bbox_targets"], batch["bbox_inside_weights"],
            batch["bbox_outside_weights"], batch["valid"],
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
