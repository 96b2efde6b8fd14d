#!/usr/bin/env python
"""Fast R-CNN training CLI (TPU-native rebuild of reference train_fast.py).

Trains the Fast R-CNN box branch from precomputed proposals with the
Detectron 2x schedule: SGD momentum 0.9, wd 1e-4, step-decay LR with linear
warmup, grad clip 35, conv1+res2 frozen (reference train_fast.py:25-198).
Unlike the reference (whose --resume flag was never implemented), resume
actually works via orbax checkpoints.

Usage:
  python tools/train_fast.py --ann instances_train2014.json --imdir train2014 \
      --proposals proposals.pkl --base-cnn R-50.pkl --out runs/fast_rcnn
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ann", required=True, help="COCO annotation json")
    p.add_argument("--imdir", required=True, help="image directory")
    p.add_argument("--proposals", default=None,
                   help="proposal .pkl file; omitted -> train on gt boxes "
                        "only (the usual choice for --keypoints)")
    p.add_argument("--base-cnn", default=None, help="ImageNet base CNN .pkl")
    p.add_argument("--arch", default="resnet50", choices=["resnet50", "resnet101"])
    p.add_argument("--fpn", action="store_true")
    p.add_argument("--out", default="runs/fast_rcnn")
    p.add_argument("--batch-size", type=int, default=None,
                   help="default: number of devices")
    p.add_argument("--max-iter", type=int, default=360000)
    p.add_argument("--base-lr", type=float, default=0.01)
    p.add_argument("--checkpoint-period", type=int, default=20000)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--log-period", type=int, default=20)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--device-preprocess", action="store_true",
                   help="upload raw uint8 and resize/normalise on device "
                        "(~10x less H2D per iteration; flips applied to "
                        "the uint8 pixels host-side)")
    p.add_argument("--target-size", type=int, default=800,
                   help="resize shorter side to this (reference 800)")
    p.add_argument("--max-size", type=int, default=1333,
                   help="cap longer side at this (reference 1333)")
    p.add_argument("--blob", type=int, nargs=2, default=(1344, 1344),
                   metavar=("H", "W"),
                   help="fixed training blob bucket (one compiled program)")
    p.add_argument("--rois-per-image", type=int, default=512)
    p.add_argument("--prefetch", type=int, default=0,
                   help="N > 0: build batches in a producer thread behind "
                        "an N-deep bounded queue, overlapping host input "
                        "prep (decode/resize/roi sampling) with device "
                        "compute; 0 = synchronous (default). Same rng "
                        "draw order either way (single producer)")
    p.add_argument("--roi-align",
                   choices=["auto", "gather", "pallas", "pallas-mm",
                            "pallas-slab"],
                   default="auto",
                   help="training RoIAlign formulation (FPN only): "
                        "'pallas' = slab-DMA forward + gather-form VJP "
                        "(fp32 scatter backward); 'pallas-mm' = slab-DMA "
                        "forward + separable-MATMUL VJP (bf16 MXU backward, "
                        "measured -30%% step time vs 'pallas' on TPU, "
                        "PERF.md round 4); 'pallas-slab' = slab-DMA forward "
                        "+ slab-domain Pallas backward — the fastest EXACT-"
                        "gradient tier (e2e Mask 296 vs 381 ms for the "
                        "scatter, PERF.md round 5); 'auto' picks pallas-mm "
                        "on TPU FPN, gather elsewhere")
    p.add_argument("--roi-align-bwd-precision",
                   choices=["bf16", "high", "highest"], default="bf16",
                   help="precision tier of the 'pallas-mm' separable-matmul "
                        "RoIAlign backward: 'bf16' (fastest, bf16-rounded "
                        "hat weights + intermediate; update cosine > 0.999 "
                        "vs exact, test-pinned), 'high' (fp32 operands, "
                        "bf16_3x MXU passes), 'highest' (fp32 throughout — "
                        "parity with the reference's fp32 scatter backward, "
                        "roi_align_backward_cuda.cu). Ignored unless the "
                        "resolved --roi-align is pallas-mm")
    p.add_argument("--roi-align-fwd-precision",
                   choices=["exact", "bf16x3", "bf16"], default="exact",
                   help="forward contraction tier of the Pallas RoIAlign "
                        "kernel (cfg.roi_align_fwd_precision): 'exact' "
                        "fp32/HIGHEST (default — the AP-parity tier), "
                        "'bf16x3' exact products in half the MXU passes "
                        "for bf16 features, 'bf16' single-pass fast bound. "
                        "Ignored on the gather path")
    p.add_argument("--keypoints", action="store_true",
                   help="train the Keypoint R-CNN preset (box branch + "
                        "KRCNN keypoint head) from a person-keypoints "
                        "dataset; --fpn is implied")
    p.add_argument("--masks", action="store_true",
                   help="train the full Mask R-CNN preset: box branch + "
                        "mask head with polys_to_mask_wrt_box targets "
                        "(upstream Detectron mask training; the reference "
                        "repo trains boxes only)")
    p.add_argument("--e2e", action="store_true",
                   help="END-TO-END training: RPN + box head jointly, "
                        "anchor targets and roi sampling computed inside "
                        "the jitted step from the gt boxes alone (no "
                        "proposal file; upstream Detectron e2e semantics — "
                        "the reference cannot train its e2e presets at "
                        "all). Composes with --masks (e2e Mask R-CNN: "
                        "device-side crop-resize mask targets) and "
                        "--keypoints (e2e Keypoint R-CNN)")
    args = p.parse_args()
    if args.masks and args.keypoints:
        p.error("--masks and --keypoints are mutually exclusive")
    if (not args.keypoints and not args.masks and not args.e2e
            and not args.proposals):
        # Fast R-CNN needs hard negatives from precomputed proposals;
        # gt-only training is a keypoint/mask-mode choice, not a silent
        # default for the plain box preset
        p.error("--proposals is required unless --keypoints/--masks is given")
    return args


def main():
    if os.environ.get("DETECTORCH_CPU"):
        # this jax build ignores the JAX_PLATFORMS env var (the TPU plugin
        # is pinned via sitecustomize); force CPU through the config
        import jax

        jax.config.update("jax_platforms", "cpu")
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from detectorch_tpu.utils.io import enable_persistent_compile_cache

    enable_persistent_compile_cache()  # repeat runs skip the minutes-long
    # full-step compile (.jax_cache at the repo root, shared with bench.py)

    from detectorch_tpu.config import PRESETS, SamplerConfig, SolverConfig, TestConfig
    from detectorch_tpu.checkpoint import caffe2_import as c2
    from detectorch_tpu.checkpoint import store
    from detectorch_tpu.data import transforms as T
    from detectorch_tpu.data.coco import roidb_for_training
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.parallel.mesh import make_mesh
    from detectorch_tpu.train.e2e import GT_RASTER_RES
    from detectorch_tpu.train.sampler import polys_to_mask_wrt_box, sample_rois
    from detectorch_tpu.train.train_step import make_train_step
    from detectorch_tpu.utils.stats import TrainingStats

    if args.keypoints:
        preset = "e2e_keypoint_rcnn_R-50-FPN_1x"
    elif args.masks:
        preset = ("e2e_mask_rcnn_R-50-FPN_2x" if args.fpn
                  else "e2e_mask_rcnn_R-50-C4_2x")
    elif args.e2e:
        preset = ("e2e_faster_rcnn_R-50-FPN_2x" if args.fpn
                  else "e2e_faster_rcnn_R-50-C4_2x")
    else:
        preset = "fast_rcnn_R-50-FPN_2x" if args.fpn else "fast_rcnn_R-50-C4_2x"
    cfg = PRESETS[preset].replace(
        arch=args.arch,
        roi_align_fwd_precision=args.roi_align_fwd_precision)
    solver = SolverConfig(
        base_lr=args.base_lr, max_iter=args.max_iter,
        checkpoint_period=args.checkpoint_period,
    )
    sampler_cfg = SamplerConfig(rois_per_image=args.rois_per_image)
    test_cfg = TestConfig(target_size=args.target_size, max_size=args.max_size)

    print("loading roidb...", flush=True)
    ds, roidb = roidb_for_training(args.ann, args.imdir, args.proposals,
                                   require_keypoints=args.keypoints)
    print(f"roidb: {len(roidb)} entries", flush=True)
    # static fg-capacity row count for the keypoint/mask branches (the
    # sampler places fg rows first, so slicing the first fg_rows rows
    # covers every possible foreground roi)
    fg_rows = int(np.round(sampler_cfg.fg_fraction * sampler_cfg.rois_per_image))
    mask_res = cfg.mask.resolution if args.masks else 0

    params = init_params(cfg, seed=args.seed)
    if args.base_cnn:
        blobs = c2.load_caffe2_pkl(args.base_cnn)
        params.update(c2.import_base_cnn(blobs, cfg.arch))
        print("loaded base CNN weights", flush=True)

    blob_hw = tuple(args.blob)  # one fixed training bucket -> one program
    roi_align_impl = args.roi_align
    if roi_align_impl == "auto":
        # Pallas slab forward + matmul VJP (178.8 -> 124.2 ms/step batch 8,
        # PERF.md round 4) on TPU FPN; gather elsewhere (interpret-mode
        # Pallas on CPU is slow)
        roi_align_impl = ("pallas-mm" if cfg.use_fpn
                          and jax.default_backend() == "tpu" else "gather")
    if args.e2e:
        from detectorch_tpu.train.e2e import make_e2e_train_step

        init_state, make_step = make_e2e_train_step(
            cfg, solver, sampler_cfg, seed=args.seed,
            train_mask=args.masks, train_keypoints=args.keypoints,
            device_input=args.device_preprocess, blob_hw=blob_hw,
            roi_align_impl=roi_align_impl,
            bwd_precision=args.roi_align_bwd_precision,
        )
    else:
        init_state, make_step = make_train_step(
            cfg, solver, device_input=args.device_preprocess, blob_hw=blob_hw,
            train_mask=args.masks, roi_align_impl=roi_align_impl,
            bwd_precision=args.roi_align_bwd_precision,
        )
    state, tx = init_state(params)
    step_fn = jax.jit(make_step(tx))

    start_iter = 0
    if args.resume:
        latest = store.latest_checkpoint(args.out)
        if latest:
            # full training state incl. optimizer momentum (the reference
            # saved optimizer state too, train_fast.py:177-183)
            tree = {"step": np.int32(0), "params": state.params,
                    "opt_state": state.opt_state}
            restored = store.restore_checkpoint(latest, tree)
            start_iter = int(restored["step"])
            state = state._replace(
                step=jnp.asarray(start_iter, jnp.int32),
                params=jax.tree.map(jnp.asarray, restored["params"]),
                opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
            )
            print(f"resumed from {latest} at iter {start_iter}", flush=True)

    mesh = make_mesh()
    batch_size = args.batch_size or mesh.shape["data"]
    data_sharding = NamedSharding(mesh, P("data"))
    rng = np.random.RandomState(args.seed)
    stats = TrainingStats(args.max_iter, args.log_period)

    if args.device_preprocess:
        from detectorch_tpu.data.device_input import (
            RAW_STRIDE, pack_tables_meta, prepare_raw)

        # one fixed raw bucket (padded original dims) keeps a single program
        raw_h = max(-(-e.height // RAW_STRIDE) * RAW_STRIDE for e in roidb)
        raw_w = max(-(-e.width // RAW_STRIDE) * RAW_STRIDE for e in roidb)
        print(f"raw bucket: {raw_h}x{raw_w} uint8 "
              f"({batch_size * raw_h * raw_w * 3 / 1e6:.1f} MB/iter vs "
              f"{batch_size * blob_hw[0] * blob_hw[1] * 3 * 4 / 1e6:.1f} MB "
              "fp32 blobs)", flush=True)

    # one fixed gt capacity -> one compiled program (COCO max ~93/img)
    gt_pad = 128

    def make_batch_e2e_np():
        keys = (["raw", "tables", "meta"] if args.device_preprocess
                else ["image", "info"])
        keys += ["gt_boxes", "gt_classes", "gt_valid"]
        if args.masks:
            keys += ["gt_masks", "gt_mask_valid"]
        if args.keypoints:
            keys += ["gt_keypoints"]
        batch = {k: [] for k in keys}
        for _ in range(batch_size):
            e = roidb[rng.randint(len(roidb))]
            im = T.load_image_rgb(e.file_path)
            if e.flipped:
                # flip the uint8 pixels BEFORE resize, like the reference
                # (coco_dataset.py:52-53); the gt boxes/segms/keypoints in
                # the flipped roidb entry are already flipped
                im = np.ascontiguousarray(im[:, ::-1])
            if args.device_preprocess:
                raw, m = prepare_raw(
                    im.astype(np.uint8), test_cfg.target_size,
                    test_cfg.max_size, buckets=(blob_hw,),
                )
                rawp = np.zeros((raw_h, raw_w, 3), np.uint8)
                rawp[: raw.shape[0], : raw.shape[1]] = raw
                tables, meta = pack_tables_meta(m)
                scale = m["scale"]
                batch["raw"].append(rawp)
                batch["tables"].append(tables)
                batch["meta"].append(meta)
            else:
                image, scale, _ = T.preprocess_image(
                    im, test_cfg.target_size, test_cfg.max_size,
                    buckets=(blob_hw,),
                )
                batch["image"].append(image)
                batch["info"].append(np.asarray(
                    [round(e.height * scale), round(e.width * scale), scale],
                    np.float32))
            # crowd regions are never positive targets (upstream Detectron
            # roi_data/rpn.py uses (gt_classes > 0) & (is_crowd == 0))
            gi = np.where((e.gt_classes > 0) & (e.is_crowd == 0))[0][:gt_pad]
            gb = np.zeros((gt_pad, 4), np.float32)
            gc = np.zeros(gt_pad, np.int32)
            gv = np.zeros(gt_pad, bool)
            gb[: len(gi)] = e.boxes[gi] * scale
            gc[: len(gi)] = e.gt_classes[gi]
            gv[: len(gi)] = True
            batch["gt_boxes"].append(gb)
            batch["gt_classes"].append(gc)
            batch["gt_valid"].append(gv)
            if args.masks:
                # one raster per gt wrt its OWN box — frame-free (the crop
                # mapping on device uses the scaled boxes), a few KB/image
                gm = np.zeros((gt_pad, GT_RASTER_RES, GT_RASTER_RES),
                              np.uint8)
                gmv = np.zeros(gt_pad, bool)
                for i, ind in enumerate(gi):
                    segm = e.segms[ind] if ind < len(e.segms) else None
                    if isinstance(segm, list) and segm:
                        gm[i] = polys_to_mask_wrt_box(
                            segm, e.boxes[ind], GT_RASTER_RES)
                        gmv[i] = True
                batch["gt_masks"].append(gm)
                batch["gt_mask_valid"].append(gmv)
            if args.keypoints:
                p_kp = e.gt_keypoints.shape[1] if e.gt_keypoints is not None \
                    else (cfg.keypoint.num_keypoints if cfg.keypoint else 17)
                gk = np.zeros((gt_pad, p_kp, 3), np.float32)
                if e.gt_keypoints is not None and len(e.gt_keypoints):
                    g_of = np.maximum(e.box_to_gt_ind_map[gi], 0)
                    kk = e.gt_keypoints[g_of]
                    gk[: len(gi), :, :2] = kk[:, :, :2] * scale
                    gk[: len(gi), :, 2] = kk[:, :, 2]
                batch["gt_keypoints"].append(gk)
        return {k: np.stack(v) for k, v in batch.items()}

    def make_batch_np():
        if args.e2e:
            return make_batch_e2e_np()
        if args.device_preprocess:
            batch = {k: [] for k in ["raw", "tables", "meta", "rois",
                                     "labels", "bbox_targets_compact",
                                     "valid"]
                     + (["kp_labels", "kp_valid"] if args.keypoints else [])
                     + (["mask_targets", "mask_valid"] if args.masks else [])}
            for _ in range(batch_size):
                e = roidb[rng.randint(len(roidb))]
                im = T.load_image_rgb(e.file_path)
                if e.flipped:
                    # flip the uint8 pixels BEFORE resize, exactly like the
                    # reference (coco_dataset.py:52-53) — 3x cheaper than
                    # flipping the fp32 blob, and the sampled rois already
                    # come from the flipped roidb entry
                    im = np.ascontiguousarray(im[:, ::-1])
                raw, m = prepare_raw(
                    im.astype(np.uint8), test_cfg.target_size,
                    test_cfg.max_size, buckets=(blob_hw,),
                )
                rawp = np.zeros((raw_h, raw_w, 3), np.uint8)
                rawp[: raw.shape[0], : raw.shape[1]] = raw
                tables, meta = pack_tables_meta(m)
                blobs = sample_rois(
                    e, m["scale"], rng, sampler_cfg, cfg.num_classes,
                    compact_targets=True,
                    keypoint_heatmap_size=(
                        cfg.keypoint.heatmap_size if cfg.keypoint else 56
                    ),
                    mask_resolution=mask_res,
                )
                batch["raw"].append(rawp)
                batch["tables"].append(tables)
                batch["meta"].append(meta)
                batch["rois"].append(blobs["rois"])
                batch["labels"].append(blobs["labels"])
                batch["bbox_targets_compact"].append(
                    blobs["bbox_targets_compact"])
                batch["valid"].append(blobs["valid"])
                if args.keypoints:
                    batch["kp_labels"].append(blobs["kp_labels"][:fg_rows])
                    batch["kp_valid"].append(blobs["kp_valid"][:fg_rows])
                if args.masks:
                    batch["mask_targets"].append(
                        blobs["mask_targets"][:fg_rows])
                    batch["mask_valid"].append(blobs["mask_valid"][:fg_rows])
            return {k: np.stack(v) for k, v in batch.items()}
        keys = ["image", "rois", "labels", "bbox_targets",
                "bbox_inside_weights", "bbox_outside_weights", "valid"]
        batch = {k: [] for k in keys}
        # one fixed training bucket keeps a single compiled program
        for _ in range(batch_size):
            e = roidb[rng.randint(len(roidb))]
            im = T.load_image_rgb(e.file_path)
            if e.flipped:
                im = im[:, ::-1]
            image, scale, _ = T.preprocess_image(
                im, test_cfg.target_size, test_cfg.max_size,
                buckets=(blob_hw,),
            )
            blobs = sample_rois(
                e, scale, rng, sampler_cfg, cfg.num_classes,
                keypoint_heatmap_size=(
                    cfg.keypoint.heatmap_size if cfg.keypoint else 56
                ),
                mask_resolution=mask_res,
            )
            batch["image"].append(image)
            for k in keys[1:]:
                batch[k].append(blobs[k if k != "valid" else "valid"])
            if args.keypoints:
                batch.setdefault("kp_labels", []).append(
                    blobs["kp_labels"][:fg_rows])
                batch.setdefault("kp_valid", []).append(
                    blobs["kp_valid"][:fg_rows])
            if args.masks:
                batch.setdefault("mask_targets", []).append(
                    blobs["mask_targets"][:fg_rows])
                batch.setdefault("mask_valid", []).append(
                    blobs["mask_valid"][:fg_rows])
        return {k: np.stack(v) for k, v in batch.items()}

    def put_batch(np_batch):
        # device_put stays on the MAIN thread: on the axon relay every
        # device op from a second thread contends for the same RPC channel
        return {k: jax.device_put(v, data_sharding)
                for k, v in np_batch.items()}

    if args.prefetch > 0:
        # producer-thread input overlap: the round-2 rejection of this was
        # measured at the 86 MB/iter fp32-blob schema; at the uint8
        # device-preprocess schema (~1.2 MB/iter) host batch build is the
        # overlap-able cost, so it runs behind a bounded queue while the
        # device crunches the previous step. Single producer keeps the rng
        # draw order identical to the synchronous path.
        import queue as _queue
        import threading as _threading

        _q: "_queue.Queue" = _queue.Queue(maxsize=args.prefetch)

        def _producer():
            while True:
                _q.put(make_batch_np())

        _threading.Thread(target=_producer, daemon=True).start()

        def next_batch():
            return put_batch(_q.get())
    else:
        def next_batch():
            return put_batch(make_batch_np())

    for it in range(start_iter, args.max_iter):
        stats.iter_tic()
        batch = next_batch()
        state, metrics = step_fn(state, batch)
        stats.iter_toc()
        loss_keys = ("loss", "loss_cls", "loss_bbox") + (
            ("loss_kps",) if args.keypoints else ()
        ) + (("loss_mask",) if args.masks else ()) + (
            ("loss_rpn_cls", "loss_rpn_bbox") if args.e2e else ()
        )
        extra_metrics = {"accuracy": metrics["accuracy"]}
        if "frac_rois_overflowed" in metrics:
            # Pallas slab-overflow observability: fraction of sampled rois
            # whose footprint exceeded the kernel's VMEM slab and got
            # crop-clamped features (0.0 on standard buckets; rises on
            # extreme-aspect data instead of degrading silently)
            extra_metrics["frac_rois_overflowed"] = (
                metrics["frac_rois_overflowed"])
        stats.update_iter_stats(
            it,
            {k: metrics[k] for k in loss_keys},
            extra_metrics,
        )
        stats.log_iter_stats(it, float(metrics["lr"]))
        if (it + 1) % args.checkpoint_period == 0 or (it + 1) == args.max_iter:
            path = store.save_checkpoint(
                args.out, it + 1,
                {"step": np.int32(it + 1),
                 "params": jax.tree.map(np.asarray, state.params),
                 "opt_state": jax.tree.map(np.asarray, state.opt_state)},
            )
            print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
