"""Real-TPU smoke drive: full Mask R-CNN R-50-FPN program on a demo image.

Runs the complete single-jit pipeline (backbone -> FPN -> RPN -> NMS ->
RoIAlign -> heads -> per-class NMS -> mask head) with random weights on
whatever accelerator jax finds, printing shapes, timings and sanity stats.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/smoke_tpu.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from detectorch_tpu.config import PRESETS, TestConfig
from detectorch_tpu.models.detector import init_params, make_inference_fn


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"]
    test_cfg = TestConfig()
    params = init_params(cfg, seed=0)
    n_params = sum(np.prod(v.shape) for v in params.values())
    print(f"params: {len(params)} blobs, {n_params/1e6:.1f}M", flush=True)

    fwd = jax.jit(make_inference_fn(cfg, test_cfg))

    h, w = 832, 1344  # 800-short-side bucket, stride-64 padded
    rng = np.random.RandomState(0)
    image = (rng.randn(h, w, 3) * 50).astype(np.float32)

    t0 = time.time()
    out = jax.block_until_ready(
        fwd(params, image, jnp.float32(1.66), jnp.float32(500.0), jnp.float32(808.0))
    )
    print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    iters = 5
    for _ in range(iters):
        out = jax.block_until_ready(
            fwd(params, image, jnp.float32(1.66), jnp.float32(500.0), jnp.float32(808.0))
        )
    dt = (time.time() - t0) / iters
    print(f"steady-state: {dt*1000:.1f} ms/image ({1/dt:.2f} img/s single-image)", flush=True)

    d = out.detections
    print("valid dets:", int(np.asarray(d.valid).sum()), flush=True)
    print("rois valid:", int(np.asarray(out.roi_valid).sum()), flush=True)
    print("det boxes finite:", bool(np.isfinite(np.asarray(d.boxes)).all()), flush=True)
    print("masks:", out.masks.shape, "finite:", bool(np.isfinite(np.asarray(out.masks)).all()), flush=True)


if __name__ == "__main__":
    main()
