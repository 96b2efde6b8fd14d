#!/usr/bin/env python
"""Stage bisection of the FPN Fast R-CNN TRAINING step on real TPU
(round-4 item: give training the perf treatment inference got).

Programs measured (batch PROFILE_TRAIN_BATCH, default 8; 832x1344 blob,
512 rois/img, production shapes):

  A. full train step, gather RoIAlign (the round-2/3 baseline, 220 ms)
  B. full train step, Pallas-slab-forward RoIAlign + gather-form VJP
     (ops/roi_align.make_multilevel_roi_align_fused)
  C. backbone+FPN-neck fwd+bwd only (value_and_grad of a feature scalar)

A - C  = RoIAlign + box head + losses + optimizer share.
A - B  = the direct win (or loss) from the Pallas forward in training.

Methodology: steps chain state->state so N dispatches pipeline; one scalar
fetch at the end forces completion (see PERF.md "Timing").

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_train_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from detectorch_tpu.config import PRESETS, SolverConfig
    from detectorch_tpu.models import fpn as fpn_mod
    from detectorch_tpu.models import resnet as resnet_mod
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.train.train_step import make_train_step

    b = int(os.environ.get("PROFILE_TRAIN_BATCH", "8"))
    r = 512
    h, w = 832, 1344
    iters = int(os.environ.get("PROFILE_TRAIN_ITERS", "8"))
    cfg = PRESETS["fast_rcnn_R-50-FPN_2x"]
    k = cfg.num_classes
    print(f"devices: {jax.devices()}  batch={b} rois={r} blob={h}x{w}",
          flush=True)

    params = init_params(cfg, seed=0)
    rng = np.random.RandomState(0)
    rois = np.stack([
        np.stack([
            rng.uniform(0, w / 2, r), rng.uniform(0, h / 2, r),
            rng.uniform(w / 2, w - 1, r), rng.uniform(h / 2, h - 1, r),
        ], axis=1)
        for _ in range(b)
    ]).astype(np.float32)
    batch_np = {
        "image": (rng.randn(b, h, w, 3) * 40).astype(np.float32),
        "rois": rois,
        "labels": rng.randint(0, k, (b, r)).astype(np.int32),
        "bbox_targets": np.zeros((b, r, 4 * k), np.float32),
        "bbox_inside_weights": np.zeros((b, r, 4 * k), np.float32),
        "bbox_outside_weights": np.zeros((b, r, 4 * k), np.float32),
        "valid": np.ones((b, r), bool),
    }
    batch = {kk: jax.device_put(jnp.asarray(v)) for kk, v in batch_np.items()}

    def time_step_program(tag, impl):
        init_state, make_step = make_train_step(
            cfg, SolverConfig(), roi_align_impl=impl)
        state, tx = init_state(params)
        step = jax.jit(make_step(tx))
        t0 = time.time()
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        print(f"[{tag}] compile+first: {time.time() - t0:.1f}s "
              f"loss={loss:.4f}", flush=True)
        t0 = time.time()
        for _ in range(iters):
            state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        dt = (time.time() - t0) / iters
        print(f"[{tag}] steady: {dt * 1e3:.1f} ms/step -> {b / dt:.1f} "
              f"img/s (loss={loss:.4f})", flush=True)
        return dt

    def time_backbone_bwd(tag):
        cd = jnp.dtype(cfg.compute_dtype)

        def loss_fn(p, images):
            def one(im):
                feats = resnet_mod.multilevel_body(
                    p, im[None].astype(cd), cfg.arch)
                pyr = fpn_mod.fpn_neck(p, feats, cfg.arch)
                return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in pyr)

            return jnp.mean(jax.vmap(one)(images)) * 1e-6

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        jp = {kk: jnp.asarray(v) for kk, v in params.items()}
        t0 = time.time()
        val, grads = grad_fn(jp, batch["image"])
        float(val)
        print(f"[{tag}] compile+first: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(iters):
            val, grads = grad_fn(jp, batch["image"])
        # fetch ONE small grad leaf to force completion
        np.asarray(grads["conv1_w"]).ravel()[0]
        float(val)
        dt = (time.time() - t0) / iters
        print(f"[{tag}] steady: {dt * 1e3:.1f} ms/step", flush=True)
        return dt

    stages = os.environ.get(
        "PROFILE_TRAIN_STAGES", "A,B,C,D,E").split(",")
    a = time_step_program("A full/gather", "gather") if "A" in stages else None
    bt = (time_step_program("B full/pallas-fwd", "pallas")
          if "B" in stages else None)
    c = time_backbone_bwd("C backbone+neck f+b") if "C" in stages else None
    # D: Pallas fwd + ZERO RoIAlign backward. NOT a clean isolate of the
    # RoIAlign backward: a zero cotangent into the pyramid lets XLA fold
    # away the BACKBONE backward too (all backbone grads flow through
    # RoIAlign in this model), so D is a lower bound on everything-else.
    # The honest backward comparison is B vs E (same graph, different VJP).
    d = (time_step_program("D pallas-fwd/zero-bwd", "pallas-zero")
         if "D" in stages else None)
    e = (time_step_program("E pallas-fwd/matmul-bwd", "pallas-mm")
         if "E" in stages else None)
    print(f"\nstage table (batch {b}):", flush=True)
    if c and a:
        print(f"  backbone+neck fwd+bwd : {c*1e3:8.1f} ms ({100*c/a:.0f}%)")
        print(f"  roialign+head+loss+opt: {(a-c)*1e3:8.1f} ms "
              f"({100*(a-c)/a:.0f}%)")
    if a:
        print(f"  full (gather)         : {a*1e3:8.1f} ms")
    if bt and a:
        print(f"  full (pallas fwd)     : {bt*1e3:8.1f} ms "
              f"({100*(a-bt)/a:+.1f}% vs gather)")
    if d and bt:
        print(f"  full (zero roi-bwd)   : {d*1e3:8.1f} ms "
              f"(lower bound; XLA folds the backbone bwd away with it)")
    if e and bt:
        print(f"  full (matmul roi-bwd) : {e*1e3:8.1f} ms "
              f"({100*(bt-e)/bt:+.1f}% vs gather-bwd)")


if __name__ == "__main__":
    main()
