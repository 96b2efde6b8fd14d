#!/usr/bin/env python
"""Headline benchmark: Mask R-CNN R-50-FPN inference throughput.

Runs the full single-jit pipeline (backbone -> FPN -> RPN -> NMS -> RoIAlign
-> heads -> per-class NMS -> mask head) on the standard 800x1333 bucket,
batched and sharded over all available devices.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 50 images/sec on a v5e-8; with fewer
devices the target scales as 50 * ndev / 8 (pure data-parallel inference).
All other output goes to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compilation cache: the flagship program is identical across
    # rounds, but bench.py used to pay the full remote compile every time
    # (41 s r1 -> 365 s r2 -> 244 s r3 through the axon compiler); the cache
    # under the repo survives rounds (.gitignore'd; harmless if evicted)
    from detectorch_tpu.utils.io import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from detectorch_tpu.config import PRESETS, TestConfig
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.parallel.mesh import (
        make_batched_inference_fn,
        make_mesh,
        shard_batch,
        shard_params,
    )

    ndev = len(jax.devices())
    log(f"devices: {jax.devices()}")
    if os.environ.get("BENCH_MODE") == "train":
        return bench_train()
    preset = os.environ.get("BENCH_PRESET", "e2e_mask_rcnn_R-50-FPN_2x")
    cfg = PRESETS[preset]
    if not cfg.use_rpn:
        raise SystemExit("bench.py covers RPN-driven presets only")
    prec = os.environ.get("BENCH_ROI_ALIGN_PRECISION")
    if prec:
        cfg = cfg.replace(roi_align_precision=prec)
    cdt = os.environ.get("BENCH_COMPUTE_DTYPE")
    if cdt:
        cfg = cfg.replace(compute_dtype=cdt)
    if os.environ.get("BENCH_S2D_STEM"):
        cfg = cfg.replace(s2d_stem=True)
    # default the kernel's forward tier to 'bf16x3' when compute is bf16:
    # AP-stat-identical to 'exact' on the production path (PARITY.md round
    # 5 — bf16 features make every product exact, only fp32 accumulation
    # order differs) and +4.7% throughput. On fp32 compute it would round
    # the features, so 'exact' stays. Env overrides either way.
    fwd = os.environ.get("BENCH_ROI_ALIGN_FWD") or (
        "bf16x3" if cfg.compute_dtype == "bfloat16" else "exact")
    cfg = cfg.replace(roi_align_fwd_precision=fwd)
    test_cfg = TestConfig(
        nms_topk_prefilter=int(os.environ.get("BENCH_NMS_PREFILTER", "0")),
    )
    params = init_params(cfg, seed=0)

    mesh = make_mesh(model_parallel=1)
    fn = make_batched_inference_fn(cfg, test_cfg, mesh)
    params = shard_params(params, mesh)

    per_dev_batch = int(os.environ.get("BENCH_PER_DEV_BATCH", "16"))
    b = ndev * per_dev_batch
    h, w = 832, 1344
    rng = np.random.RandomState(0)
    images = (rng.randn(b, h, w, 3) * 50).astype(np.float32)
    scales = np.full(b, 1.66, np.float32)
    ohs = np.full(b, 500.0, np.float32)
    ows = np.full(b, 800.0, np.float32)
    batch = shard_batch(mesh, images, scales, ohs, ows)

    def run_once():
        out = fn(params, *batch)
        # block_until_ready does not reliably synchronise on every backend
        # (axon); fetching a small result forces real completion
        np.asarray(out.detections.scores)
        return out

    log(f"compiling (batch={b}, {h}x{w})...")
    t0 = time.time()
    run_once()
    log(f"compile+first: {time.time()-t0:.1f}s")

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    run_once()  # warm
    # two-deep pipeline: dispatch batch i+1 before fetching batch i, hiding
    # the result-fetch round trip behind device compute
    t0 = time.time()
    pending = fn(params, *batch)
    for _ in range(iters - 1):
        nxt = fn(params, *batch)
        np.asarray(pending.detections.scores)
        pending = nxt
    np.asarray(pending.detections.scores)
    dt = (time.time() - t0) / iters
    img_per_sec = b / dt
    log(f"steady: {dt*1000:.1f} ms/batch -> {img_per_sec:.2f} img/s on {ndev} device(s)")

    target = 50.0 * ndev / 8.0
    print(
        json.dumps(
            {
                "metric": (
                    "mask_rcnn_r50_fpn_inference_throughput"
                    if preset == "e2e_mask_rcnn_R-50-FPN_2x"
                    else f"{preset}_inference_throughput"
                ),
                "value": round(img_per_sec, 3),
                # name the precision tier in the archived line: the bf16
                # headline and the AP-parity-airtight fp32-compute tier
                # (51.4 img/s, PERF.md) are different numbers
                "unit": (f"images/sec ({ndev} devices, batch {b}, "
                         f"compute={cfg.compute_dtype}, "
                         f"roi_align={cfg.roi_align_precision})"),
                "vs_baseline": round(img_per_sec / target, 4),
                "tier": {
                    "compute_dtype": cfg.compute_dtype,
                    "roi_align_precision": cfg.roi_align_precision,
                    "roi_align_fwd_precision": cfg.roi_align_fwd_precision,
                },
            }
        ),
        flush=True,
    )


def bench_train():
    """BENCH_MODE=train: Fast R-CNN R-50-FPN training-step throughput
    (batch 8 @ 832x1344, 512 rois/img, the TPU-default Pallas-forward +
    separable-matmul-VJP RoIAlign). The reference publishes no training
    throughput (its README calls training "slow"), so vs_baseline is
    reported against OUR round-2 gather-formulation step — read from
    BASELINE_TRAIN.json and emitted ONLY when the measured config matches
    the baseline's (batch/shape/rois), so env-var overrides never compare
    incommensurate configurations.
    """
    import jax
    import jax.numpy as jnp

    from detectorch_tpu.config import PRESETS, SolverConfig
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.train.train_step import make_train_step

    cfg = PRESETS["fast_rcnn_R-50-FPN_2x"]
    fwd = os.environ.get("BENCH_ROI_ALIGN_FWD")
    if fwd:
        cfg = cfg.replace(roi_align_fwd_precision=fwd)
    b, r, h, w = int(os.environ.get("BENCH_PER_DEV_BATCH", "8")), 512, 832, 1344
    k = cfg.num_classes
    impl = ("pallas-mm" if jax.default_backend() == "tpu" else "gather")
    params = init_params(cfg, seed=0)
    rng = np.random.RandomState(0)
    rois = np.stack([np.stack([
        rng.uniform(0, w / 2, r), rng.uniform(0, h / 2, r),
        rng.uniform(w / 2, w - 1, r), rng.uniform(h / 2, h - 1, r)], 1)
        for _ in range(b)]).astype(np.float32)
    batch = {
        "image": (rng.randn(b, h, w, 3) * 40).astype(np.float32),
        "rois": rois,
        "labels": rng.randint(0, k, (b, r)).astype(np.int32),
        "bbox_targets": np.zeros((b, r, 4 * k), np.float32),
        "bbox_inside_weights": np.zeros((b, r, 4 * k), np.float32),
        "bbox_outside_weights": np.zeros((b, r, 4 * k), np.float32),
        "valid": np.ones((b, r), bool),
    }
    batch = {kk: jax.device_put(jnp.asarray(v)) for kk, v in batch.items()}
    init_state, make_step = make_train_step(
        cfg, SolverConfig(), roi_align_impl=impl)
    state, tx = init_state(params)
    step = jax.jit(make_step(tx))
    log(f"compiling train step (batch={b}, {h}x{w}, impl={impl})...")
    t0 = time.time()
    state, metrics = step(state, batch)
    float(metrics["loss"])
    log(f"compile+first: {time.time()-t0:.1f}s")
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = (time.time() - t0) / iters
    img_per_sec = b / dt
    log(f"steady: {dt*1000:.1f} ms/step -> {img_per_sec:.2f} img/s")
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_TRAIN.json")
    with open(base_path) as f:
        base = json.load(f)
    bc = base["config"]
    comparable = (
        b == bc["batch"] and (h, w) == (bc["height"], bc["width"])
        and r == bc["rois_per_image"]
    )
    line = {
        "metric": base["metric"],
        "value": round(img_per_sec, 3),
        "unit": f"images/sec (1 device, batch {b}, {h}x{w}, {r} rois/img, "
                f"roi_align={impl}; vs_baseline = vs our round-2 gather "
                "step from BASELINE_TRAIN.json, no reference training "
                "number exists)",
        "tier": {"roi_align_fwd_precision": cfg.roi_align_fwd_precision,
                 "bwd_precision": "bf16"},
    }
    if comparable:
        line["vs_baseline"] = round(img_per_sec / base["value"], 4)
    else:
        log(f"config differs from BASELINE_TRAIN.json {bc}; "
            "omitting vs_baseline")
        line["vs_baseline"] = None
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
