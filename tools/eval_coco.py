#!/usr/bin/env python
"""COCO evaluation CLI (rebuild of the reference eval_*.ipynb notebooks).

Runs any of the seven README model presets over a COCO dataset and reports
box (and mask) AP via the native COCOeval.

Usage:
  python tools/eval_coco.py --preset e2e_mask_rcnn_R-50-FPN_2x \
      --weights model_final.pkl --ann instances_minival2014.json \
      --imdir val2014 [--proposals proposals.pkl] [--limit 100]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if os.environ.get("DETECTORCH_CPU"):
        # this jax build ignores the JAX_PLATFORMS env var (the TPU plugin
        # is pinned via sitecustomize); tests force CPU through the config
        import jax

        jax.config.update("jax_platforms", "cpu")
    from detectorch_tpu.utils.io import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", required=True)
    p.add_argument("--weights", required=True,
                   help="Detectron .pkl checkpoint, or (with --orbax) a "
                        "tools/train_fast.py run directory / checkpoint path")
    p.add_argument("--orbax", action="store_true",
                   help="load params from an orbax TRAINING checkpoint "
                        "(latest ckpt-* under --weights) instead of a "
                        "Detectron pkl — closes the train->eval loop")
    p.add_argument("--ann", required=True)
    p.add_argument("--imdir", required=True)
    p.add_argument("--proposals", default=None,
                   help="proposal .pkl (required for fast_rcnn presets)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default=None, help="write results json here")
    p.add_argument("--output-dir", default=None,
                   help="write COCO-format results jsons + evaluator pkls "
                        "here (reference evaluate_boxes/masks flow)")
    p.add_argument("--per-class-ap", action="store_true",
                   help="print the per-category AP table")
    p.add_argument("--fp32", action="store_true", help="fp32 backbone compute")
    p.add_argument("--roi-align-fwd", default=None,
                   choices=["exact", "bf16x3", "bf16"],
                   help="Pallas FPN RoIAlign forward tier (default: exact "
                        "fp32/HIGHEST; bf16x3 = exact products in half the "
                        "MXU passes for bf16 features; bf16 = fastest)")
    p.add_argument("--exact-blob", action="store_true",
                   help="reference-exact ceil-32 image padding (more compiles)")
    p.add_argument("--device-preprocess", action="store_true",
                   help="upload raw uint8 and resize/normalize on device "
                        "(~25x less input traffic; data/device_input.py)")
    p.add_argument("--batch", type=int, default=1,
                   help="bucket-grouped batched inference (throughput mode)")
    p.add_argument("--target-sizes", default=None,
                   help="comma-separated test scales, e.g. 480,576,688,800: "
                        "more than one switches to multi-scale pyramid "
                        "inference (union merge, Detectron TEST.BBOX_AUG "
                        "semantics; single-image engine, accuracy mode)")
    args = p.parse_args()

    from detectorch_tpu.config import PRESETS, TestConfig
    from detectorch_tpu.checkpoint import caffe2_import as c2
    from detectorch_tpu.data.coco import CocoDataset
    from detectorch_tpu.eval.engine import evaluate_dataset

    cfg = PRESETS[args.preset]
    if args.fp32:
        cfg = cfg.replace(compute_dtype="float32")
    if args.roi_align_fwd:
        cfg = cfg.replace(roi_align_fwd_precision=args.roi_align_fwd)
    test_cfg = TestConfig(exact_blob_dims=args.exact_blob,
                          device_preprocess=args.device_preprocess)

    if args.orbax:
        import numpy as np

        from detectorch_tpu.checkpoint import store

        path = store.latest_checkpoint(args.weights) or args.weights
        print(f"loading orbax checkpoint {path}", flush=True)
        tree = store.restore_checkpoint(path)
        params = {k: np.asarray(v) for k, v in tree["params"].items()}
        params = c2.fold_bn(params)
    else:
        print(f"loading weights {args.weights}", flush=True)
        blobs = c2.load_caffe2_pkl(args.weights)
        params = c2.import_params(blobs, cfg)
        params = c2.fold_bn(params)

    ds = CocoDataset(args.ann, args.imdir)
    roidb = ds.get_roidb(
        gt=False, proposal_file=args.proposals if not cfg.use_rpn else None
    )
    sizes = (
        [int(s) for s in args.target_sizes.split(",")]
        if args.target_sizes else None
    )
    # evaluate_dataset folds a 1-element list into test_cfg.target_size
    bbox_stats, segm_stats, info = evaluate_dataset(
        cfg, test_cfg, params, ds, roidb=roidb, limit=args.limit,
        batch_size=args.batch,
        output_dir=args.output_dir,
        dataset_name=os.path.splitext(os.path.basename(args.ann))[0],
        per_class_ap=args.per_class_ap,
        target_sizes=sizes,
    )
    print(f"throughput: {info['images_per_sec']:.2f} images/sec", flush=True)
    if bbox_stats is not None:
        print(f"box AP: {bbox_stats[0] * 100:.1f}")
    if segm_stats is not None:
        print(f"mask AP: {segm_stats[0] * 100:.1f}")
    if info.get("keypoints_stats") is not None:
        print(f"keypoint AP: {info['keypoints_stats'][0] * 100:.1f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"bbox": info["bbox"], "segm": info["segm"],
                 "keypoints": info.get("keypoints", [])}, f
            )
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
