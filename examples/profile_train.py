#!/usr/bin/env python
"""Training-step timing on real TPU: Fast R-CNN R-50-FPN at the production
bucket (832x1344, 512 rois/img), synthetic batch pinned on device.

Methodology (see PERF.md "Timing"): the step chains state -> state, so N
dispatched steps pipeline; one scalar fetch at the end forces completion.
Per-step time = wall / N. Round 2 measured 220 ms/step at batch 8; this
probe parameterises the batch size (PROFILE_TRAIN_BATCH env, default 16).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_train.py
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
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.train.train_step import make_train_step

    b = int(os.environ.get("PROFILE_TRAIN_BATCH", "16"))
    r = 512
    h, w = 832, 1344
    cfg = PRESETS[os.environ.get("PROFILE_TRAIN_PRESET",
                                 "fast_rcnn_R-50-FPN_2x")]
    k = cfg.num_classes
    print(f"devices: {jax.devices()}  batch={b} rois={r} blob={h}x{w}",
          flush=True)

    params = init_params(cfg, seed=0)
    init_state, make_step = make_train_step(cfg, SolverConfig())
    state, tx = init_state(params)
    step = jax.jit(make_step(tx))

    rng = np.random.RandomState(0)
    rois = np.stack([
        np.stack([
            rng.uniform(0, w / 2, r), rng.uniform(0, h / 2, r),
            rng.uniform(w / 2, w - 1, r), rng.uniform(h / 2, h - 1, r),
        ], axis=1)
        for _ in range(b)
    ]).astype(np.float32)
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

    t0 = time.time()
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # forces completion
    print(f"compile+first: {time.time() - t0:.1f}s loss={loss:.4f}",
          flush=True)

    n = 10
    t0 = time.time()
    for _ in range(n):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # single sync at the end
    dt = (time.time() - t0) / n
    print(f"steady: {dt * 1e3:.1f} ms/step -> {b / dt:.1f} img/s "
          f"(batch {b}, loss={loss:.4f})", flush=True)


if __name__ == "__main__":
    main()
