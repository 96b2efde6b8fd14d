"""Isolate the vmap penalty on the Pallas RoIAlign kernel.

The round-5 e2e bisection charged 36.6 ms to the mask branch's 14^2
Pallas forward (1024 rois over batch 8 under vmap), while the flat
kernel measures 12.7 us/roi — this script times the SAME total work
three ways on the real chip: vmapped (B=8, n=128), flat single-image
(n=128, x8 dispatches inside one jit), and one flat call at n=1024 on a
single image's pyramid.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from detectorch_tpu.ops.pallas.roi_align_kernel import (
    multilevel_roi_align_pallas,
)
from detectorch_tpu.utils.io import enable_persistent_compile_cache

SCALES = (0.25, 0.125, 0.0625, 0.03125)
H, W = 832, 1344
B, N, PH = 8, 128, 14
ITERS = int(os.environ.get("PROFILE_RA_ITERS", "30"))
R_STEP = int(os.environ.get("PROFILE_RA_RSTEP", "0"))


def main():
    enable_persistent_compile_cache()
    print(f"devices: {jax.devices()}  R_STEP={R_STEP}", flush=True)
    rng = np.random.RandomState(0)
    feats_b = [
        jnp.asarray(rng.randn(B, int(H * s), int(W * s), 256), jnp.bfloat16)
        for s in SCALES
    ]
    side = rng.uniform(32, 448, (B, N))
    cx = rng.uniform(224, W - 225, (B, N))
    cy = rng.uniform(224, H - 225, (B, N))
    rois_b = jnp.asarray(
        np.stack([cx - side / 2, cy - side / 2, cx + side / 2,
                  cy + side / 2], axis=2), jnp.float32)
    from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels

    levels_b = jax.vmap(lambda r: map_rois_to_fpn_levels(r, 2, 5) - 2)(rois_b)

    def one(f, r, lv):
        out, fits = multilevel_roi_align_pallas(
            f, r, lv, SCALES, PH, PH, 2, rois_per_step=R_STEP)
        return jnp.sum(out, dtype=jnp.float32)

    variants = {
        "vmap(B=8,n=128)": jax.jit(
            lambda f, r, lv: jnp.sum(jax.vmap(one)(f, r, lv))),
        "python-loop x8 (n=128 each)": jax.jit(
            lambda f, r, lv: sum(
                one([x[b] for x in f], r[b], lv[b]) for b in range(B))),
        "flat n=1024 (image-0 pyramid)": jax.jit(
            lambda f, r, lv: one(
                [x[0] for x in f], r.reshape(-1, 4), lv.reshape(-1))),
    }
    for name, fn in variants.items():
        s = fn(feats_b, rois_b, levels_b)
        s.block_until_ready()
        # relay warm-up: the FIRST timing loop in a process after a big
        # compile absorbs a one-time multi-second cost (block_until_ready
        # does not truly wait on this backend — verify-skill note); burn it
        for _ in range(3):
            s = fn(feats_b, rois_b, levels_b)
        float(s)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = fn(feats_b, rois_b, levels_b)
        float(s)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:32s}: {dt:8.3f} ms ({dt * 1e3 / (B * N):5.2f} us/roi)",
              flush=True)


if __name__ == "__main__":
    main()
