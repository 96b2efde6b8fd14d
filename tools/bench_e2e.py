#!/usr/bin/env python
"""End-to-end dataset-evaluation throughput at production size.

Unlike bench.py (device-rate on a pre-staged batch), this measures the REAL
pipeline the way a user runs it: image files on disk -> host preprocess
(decode, resize, pad; prefetch workers) -> H2D -> batched device program ->
D2H fetch -> mask paste + RLE on the host — via `evaluate_dataset` over a
production-size synthetic COCO set (832x1344 bucket, masks on).

Prints ONE json line with images/sec end-to-end. All other output on stderr.

Usage: python tools/bench_e2e.py [--n 500] [--batch 8] [--preset ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from detectorch_tpu.utils.io import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--preset", default="e2e_mask_rcnn_R-50-FPN_2x")
    p.add_argument("--root", default="/tmp/synth_e2e")
    p.add_argument("--score-thresh", type=float, default=1e-4,
                   help="low threshold => ~100 detections+masks per image "
                        "(worst-case host pasting load)")
    p.add_argument("--device-preprocess", action="store_true",
                   help="upload raw uint8 and resize/normalize on device "
                        "(~25x less input-link traffic; see "
                        "data/device_input.py)")
    args = p.parse_args()

    from detectorch_tpu.config import PRESETS, TestConfig
    from detectorch_tpu.data.coco import CocoDataset
    from detectorch_tpu.data.synth import build_synth_coco
    from detectorch_tpu.eval.engine import evaluate_dataset
    from detectorch_tpu.models.detector import init_params

    t0 = time.time()
    ann, imdir = build_synth_coco(
        args.root, n_images=args.n, height=640, width=960, seed=11,
        img_format="jpg",
    )
    log(f"dataset ready in {time.time()-t0:.1f}s")
    dataset = CocoDataset(ann, imdir)

    cfg = PRESETS[args.preset]
    tcfg = TestConfig(score_thresh=args.score_thresh,
                      device_preprocess=args.device_preprocess)
    # Prefer the AP-harness probe weights when cached: real-looking box
    # geometry (random-weight detections have extreme aspect ratios that
    # needlessly trigger the Pallas exact-rerun path on every image).
    probe_cache = "/tmp/ap_synth/weights_r50_fpn_v3.pkl"
    if cfg.arch == "resnet50" and cfg.use_fpn and os.path.exists(probe_cache):
        import pickle

        with open(probe_cache, "rb") as f:
            params = pickle.load(f)
        log("using AP-harness probe weights")
    else:
        params = init_params(cfg, seed=0)

    # warm every program OUTSIDE the timed run (first axon compile is
    # minutes; a 5k-image production run amortises it to nothing, so the
    # honest steady-state number excludes it): a small eval slice compiles
    # the batched program, then one explicit dispatch compiles the
    # exact-rerun variant
    engines = {}
    log("warmup (compiles)...")
    t0 = time.time()
    evaluate_dataset(
        cfg, tcfg, params, dataset, limit=2 * args.batch,
        batch_size=args.batch, verbose=False, engines=engines,
    )
    single = engines[("batched", args.batch, None)]._single
    roidb = dataset.get_roidb(gt=False)
    from detectorch_tpu.data.transforms import load_image_rgb

    wargs, _, _ = single.preprocess(load_image_rgb(roidb[0].file_path))
    np.asarray(
        single._exact_fn(single.sample_key(wargs))(*wargs).detections.scores
    )
    log(f"warmup done in {time.time()-t0:.1f}s")

    log("running evaluate_dataset (steady state)...")
    t0 = time.time()
    bbox_stats, segm_stats, results = evaluate_dataset(
        cfg, tcfg, params, dataset, batch_size=args.batch, verbose=True,
        engines=engines,
    )
    total = time.time() - t0
    n_det = len(results["bbox"])
    n_segm = len(results["segm"])
    rate = results["images_per_sec"]
    log(f"total {total:.1f}s  inference-loop rate {rate:.2f} img/s  "
        f"{n_det} dets, {n_segm} rles")
    print(json.dumps({
        "metric": "e2e_evaluate_dataset_throughput",
        "value": round(rate, 3),
        "unit": f"images/sec (batch {args.batch}, {args.n} images, "
                f"masks+RLE, incl host"
                + (", device-preprocess" if args.device_preprocess else "")
                + ")",
        "detections": n_det,
    }), flush=True)


if __name__ == "__main__":
    main()
