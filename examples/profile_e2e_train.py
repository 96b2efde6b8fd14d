#!/usr/bin/env python
"""E2E training-step timing on real TPU (round-4: e2e had no measured TPU
step time). Faster R-CNN R-50-FPN e2e step — RPN losses, train-count
proposal generation (12000 pre / 2000 post), device roi sampling, box
head — at the production bucket, synthetic batch pinned on device.

PROFILE_E2E_BATCH (default 8), PROFILE_E2E_MASKS=1 adds the mask branch
(e2e Mask R-CNN step). Methodology as profile_train.py (pipelined steps,
one scalar fetch).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_e2e_train.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the cost/timing programs here are the same
    # HLO the round's earlier runs compiled, so warm repeats skip the
    # multi-minute relay compile (shared .jax_cache, guarded for jax
    # builds without the knobs — same helper bench.py/CLIs use).
    from detectorch_tpu.utils.io import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from detectorch_tpu.config import PRESETS, SamplerConfig, SolverConfig
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.train.e2e import GT_RASTER_RES, make_e2e_train_step

    b = int(os.environ.get("PROFILE_E2E_BATCH", "8"))
    masks = os.environ.get("PROFILE_E2E_MASKS", "") == "1"
    kps = os.environ.get("PROFILE_E2E_KEYPOINTS", "") == "1"
    h, w = 832, 1344
    g = 64  # padded gt capacity
    preset = ("e2e_keypoint_rcnn_R-50-FPN_1x" if kps
              else "e2e_mask_rcnn_R-50-FPN_2x" if masks
              else "e2e_faster_rcnn_R-50-FPN_2x")
    cfg = PRESETS[preset]
    if os.environ.get("PROFILE_E2E_S2D_STEM"):
        cfg = cfg.replace(s2d_stem=True)
    fwd = os.environ.get("PROFILE_E2E_ROIALIGN_FWD")
    if fwd:
        cfg = cfg.replace(roi_align_fwd_precision=fwd)
    print(f"devices: {jax.devices()}  batch={b} blob={h}x{w} "
          f"masks={masks} keypoints={kps}", flush=True)

    impl = os.environ.get("PROFILE_E2E_ROIALIGN", "gather")
    # PROFILE_E2E_MASK_TARGETS=const replaces the device-side crop-resize
    # target computation (mask_targets_device) with a constant so XLA
    # dead-code-eliminates it — bisects the mask branch's step cost into
    # target-computation vs head(+RoIAlign) fwd/bwd.
    if masks and os.environ.get("PROFILE_E2E_MASK_TARGETS", "") == "const":
        from detectorch_tpu.train import e2e as _e2e

        def _const_targets(gt_rasters, gt_boxes, gt_inds, rois, resolution):
            return jnp.zeros((rois.shape[0], resolution, resolution),
                             jnp.float32)

        _e2e.mask_targets_device = _const_targets
        print("mask targets: CONST (crop-resize DCE'd)", flush=True)
    # Mask-branch RoIAlign bisection (PROFILE_E2E_MASK_STAGE=const-roialign):
    # replace the mask branch's 14^2 RoIAlign (the fused kernel built for
    # cfg.mask.roi_size) with constants so XLA DCEs its fwd AND bwd — the
    # mask head still runs on the constant features, so (full - this) is
    # the mask-branch RoIAlign cost inside the step.
    if masks and os.environ.get("PROFILE_E2E_MASK_STAGE", "") == "const-roialign":
        from detectorch_tpu.ops import roi_align as _ra

        _orig_fused = _ra.make_multilevel_roi_align_fused

        def _fused_or_const(scales, ph, pw, sampling_ratio, **kw):
            if ph == cfg.mask.roi_size:
                def _const(feats, rois, levels):
                    return jnp.zeros(
                        (rois.shape[0], ph, pw, feats[0].shape[-1]),
                        feats[0].dtype)
                return _const
            return _orig_fused(scales, ph, pw, sampling_ratio, **kw)

        _ra.make_multilevel_roi_align_fused = _fused_or_const
        print("mask-branch roialign: CONST (fwd+bwd DCE'd)", flush=True)
    # Keypoint-branch bisection (PROFILE_E2E_KP_STAGE):
    #   const-labels — replace keypoint_labels_device with constants so XLA
    #     DCEs the on-device heatmap binning (isolates label-computation);
    #   no-loss — replace the spatial-softmax loss with a mean over the
    #     heatmap logits (isolates softmax-CE fwd/bwd; the trunk still runs);
    #   short-trunk — run the head with 2 convs instead of 8 (6 conv layers'
    #     fwd+bwd cost = (full - this) * 8/6 per-layer estimate).
    kp_stage = os.environ.get("PROFILE_E2E_KP_STAGE", "")
    if kps and kp_stage == "const-labels":
        from detectorch_tpu.train import e2e as _e2e

        def _const_labels(kp, krois, heatmap_size):
            n, p = kp.shape[0], kp.shape[1]
            return (jnp.zeros((n, p), jnp.int32), jnp.ones((n, p), bool))

        _e2e.keypoint_labels_device = _const_labels
        print("kp labels: CONST (device binning DCE'd)", flush=True)
    if kps and kp_stage == "no-loss":
        from detectorch_tpu.train import losses as _losses

        def _mean_loss(heatmaps, labels, valid, loss_weight=1.0):
            return jnp.mean(heatmaps.astype(jnp.float32))

        _losses.keypoint_loss = _mean_loss
        print("kp loss: MEAN (spatial softmax removed)", flush=True)
    if kps and kp_stage == "short-trunk":
        from detectorch_tpu.models import heads as _heads

        _orig_kp_head = _heads.keypoint_head

        def _short_head(params, roi_feats, num_convs=8):
            return _orig_kp_head(params, roi_feats, num_convs=2)

        _heads.keypoint_head = _short_head
        print("kp trunk: 2 convs instead of 8", flush=True)
    # RPN-path bisection (PROFILE_E2E_RPN_STAGE):
    #   const-proposals — replace train-count proposal generation (per-level
    #     sigmoid + top-k 12000 + decode + NMS + collect) with a fixed box
    #     grid so XLA DCEs it (the RPN losses and anchor targets still run);
    #   const-rpn-targets — replace anchor target assignment (IoU of ~270k
    #     anchors x 64 gts + subsampling) with constants (proposal
    #     generation and the RPN losses still run).
    rpn_stage = os.environ.get("PROFILE_E2E_RPN_STAGE", "")
    if rpn_stage == "const-proposals":
        from detectorch_tpu.models import rpn as _rpn

        def _const_props(prob, dl, im_h, im_w, im_scale, *, post_nms_top_n,
                         **kw):
            n = post_nms_top_n
            xy = (jnp.arange(n, dtype=jnp.float32)[:, None] % 37.0) * 8.0
            boxes = jnp.concatenate([xy, xy, xy + 64.0, xy + 48.0], axis=1)
            return _rpn.Proposals(
                boxes, jnp.linspace(1.0, 0.0, n), jnp.ones((n,), bool))

        _rpn.generate_proposals = _const_props
        _rpn.collect_proposals = (
            lambda lvl_props, post_nms_top_n=1000: _const_props(
                None, None, None, None, None, post_nms_top_n=post_nms_top_n))
        print("proposals: CONST (generation DCE'd)", flush=True)
    if rpn_stage == "const-rpn-targets":
        from detectorch_tpu.train import e2e as _e2e

        def _const_rpn_targets(anchors, gt_boxes, gt_valid, im_h, im_w, key,
                               **kw):
            a = anchors.shape[0]
            labels = jnp.where(jnp.arange(a) < 128, 1,
                               jnp.where(jnp.arange(a) < 256, 0, -1))
            return labels.astype(jnp.int32), jnp.zeros((a, 4), jnp.float32)

        _e2e.rpn_targets = _const_rpn_targets
        print("rpn targets: CONST (anchor assignment DCE'd)", flush=True)
    params = init_params(cfg, seed=0)
    init_state, make_step = make_e2e_train_step(
        cfg, SolverConfig(), SamplerConfig(), seed=0, train_mask=masks,
        train_keypoints=kps, roi_align_impl=impl,
    )
    state, tx = init_state(params)
    step = jax.jit(make_step(tx))

    # PROFILE_E2E_COST=1: print XLA's own cost analysis of the compiled
    # step (FLOPs/step) instead of timing — the MFU numerator. Same
    # methodology as examples/profile_mfu.py (no hand counting).
    cost_mode = os.environ.get("PROFILE_E2E_COST", "") == "1"

    rng = np.random.RandomState(0)
    gt = np.zeros((b, g, 4), np.float32)
    gt[:, :, 0] = rng.uniform(0, w / 2, (b, g))
    gt[:, :, 1] = rng.uniform(0, h / 2, (b, g))
    gt[:, :, 2] = gt[:, :, 0] + rng.uniform(32, w / 2 - 1, (b, g))
    gt[:, :, 3] = gt[:, :, 1] + rng.uniform(32, h / 2 - 1, (b, g))
    batch = {
        "image": (rng.randn(b, h, w, 3) * 40).astype(np.float32),
        "gt_boxes": gt,
        "gt_classes": rng.randint(1, cfg.num_classes, (b, g)).astype(np.int32),
        "gt_valid": np.ones((b, g), bool),
        "info": np.tile(np.asarray([h, w, 1.66], np.float32), (b, 1)),
    }
    if kps:
        pnum = cfg.keypoint.num_keypoints
        gk = np.zeros((b, g, pnum, 3), np.float32)
        gk[:, :, :, 0] = gt[:, :, 0:1] + rng.rand(b, g, pnum) * (
            gt[:, :, 2:3] - gt[:, :, 0:1])
        gk[:, :, :, 1] = gt[:, :, 1:2] + rng.rand(b, g, pnum) * (
            gt[:, :, 3:4] - gt[:, :, 1:2])
        gk[:, :, :, 2] = 2.0
        batch["gt_keypoints"] = gk
        batch["gt_classes"] = np.ones((b, g), np.int32)  # person-only preset
    if masks:
        batch["gt_masks"] = (
            rng.rand(b, g, GT_RASTER_RES, GT_RASTER_RES) > 0.5
        ).astype(np.uint8)
        batch["gt_mask_valid"] = np.ones((b, g), bool)
    batch = {kk: jax.device_put(jnp.asarray(v)) for kk, v in batch.items()}

    if cost_mode:
        t0 = time.time()
        cost = step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        print(f"XLA cost analysis: {flops / 1e12:.3f} TFLOP/step "
              f"(batch {b}, {flops / b / 1e9:.1f} GFLOP/img; "
              f"compile {time.time() - t0:.1f}s)", flush=True)
        return

    t0 = time.time()
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    print(f"compile+first: {time.time() - t0:.1f}s loss={loss:.4f}",
          flush=True)

    n = int(os.environ.get("PROFILE_E2E_ITERS", "8"))
    t0 = time.time()
    for _ in range(n):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / n
    print(f"steady: {dt * 1e3:.1f} ms/step -> {b / dt:.1f} img/s "
          f"(batch {b}, loss={loss:.4f})", flush=True)


if __name__ == "__main__":
    main()
