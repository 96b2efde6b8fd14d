"""Kernel-level study of the Pallas slab RoIAlign: rois-per-step batching.

Round-5 bisection found ~36 us of fixed per-grid-step cost at one roi per
step (36.6 ms of the 259 ms e2e mask train step was the 1024-roi mask
branch's forward alone). This script measures the kernel in isolation on
the real TPU across rois_per_step values, at the two production shapes
(box branch: 1000 rois at 7^2; mask/keypoint branch: 128 rois at 14^2,
both per image on an 832x1344-blob pyramid), and checks bit-equality of
every variant against the gather formulation on in-slab rois.

Timing per the verify-skill methodology: pipelined dispatches inside one
jit chain, one scalar fetch.
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
from detectorch_tpu.ops.roi_align import multilevel_roi_align
from detectorch_tpu.utils.io import enable_persistent_compile_cache

SCALES = (0.25, 0.125, 0.0625, 0.03125)
H, W = 832, 1344
ITERS = int(os.environ.get("PROFILE_RA_ITERS", "50"))


def make_case(n, seed):
    rng = np.random.RandomState(seed)
    feats = [
        jnp.asarray(rng.randn(int(H * s), int(W * s), 256), jnp.bfloat16)
        for s in SCALES
    ]
    # square-ish rois sized so each level's assignment window is hit
    # (canonical FPN mapping), all in-slab
    side = rng.uniform(32, 448, n)
    cx = rng.uniform(224, W - 224 - 1, n)
    cy = rng.uniform(224, H - 224 - 1, n)
    ar = rng.uniform(0.7, 1.4, n)
    w = np.minimum(side * ar, 440.0)
    h = np.minimum(side / ar, 440.0)
    rois = np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    ).astype(np.float32)
    from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels

    levels = map_rois_to_fpn_levels(jnp.asarray(rois), 2, 5) - 2
    return feats, jnp.asarray(rois), levels


def time_variant(feats, rois, levels, ph, r_step, fp="exact"):
    @jax.jit
    def run(f, r, lv):
        out, fits = multilevel_roi_align_pallas(
            f, r, lv, SCALES, ph, ph, 2, rois_per_step=r_step,
            fwd_precision=fp,
        )
        return jnp.sum(out, dtype=jnp.float32), jnp.all(fits)

    s, fits = run(feats, rois, levels)
    s.block_until_ready()
    # relay warm-up (see PERF.md round 5): burn 3 iterations before timing
    for _ in range(3):
        s, fits = run(feats, rois, levels)
    float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, fits = run(feats, rois, levels)
    float(s)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    return dt, bool(fits)


def main():
    enable_persistent_compile_cache()
    print(f"devices: {jax.devices()}", flush=True)
    for n, ph, tag in ((1000, 7, "box/inference"), (512, 7, "box/train"),
                       (128, 14, "mask/keypoint")):
        feats, rois, levels = make_case(n, seed=n)
        for r_step, fp in ((8, "exact"), (8, "bf16x3"), (8, "bf16"),
                           (1, "exact"), (4, "exact"), (16, "exact")):
            # one jit for the whole equality check (a scalar out — eager
            # op-by-op dispatch through the relay is minutes-slow)
            @jax.jit
            def check(f, r, lv, _rs=r_step, _fp=fp):
                out, fits = multilevel_roi_align_pallas(
                    f, r, lv, SCALES, ph, ph, 2, rois_per_step=_rs,
                    fwd_precision=_fp)
                # exactness gate vs the gather formulation: bf16 features
                # cast bf16->fp32 then identical fp32 math on both sides;
                # require exact equality on in-slab rois
                ref = multilevel_roi_align(
                    [x.astype(jnp.float32) for x in f], r, lv,
                    SCALES, ph, ph, 2)
                ref_on = jnp.where(fits[:, None, None, None], ref, out)
                return jnp.max(jnp.abs(out - ref_on))

            try:
                err = float(check(feats, rois, levels))
            except Exception as e:  # e.g. VMEM OOM at large R
                print(f"{tag:14s} n={n:5d} ph={ph:2d} R={r_step:2d}: "
                      f"FAILED ({type(e).__name__})", flush=True)
                continue
            dt, allfit = time_variant(feats, rois, levels, ph, r_step, fp)
            us = dt * 1e3 / n
            print(
                f"{tag:14s} n={n:5d} ph={ph:2d} R={r_step:2d} fp={fp:7s}: "
                f"{dt:7.3f} ms ({us:5.2f} us/roi)  max|err|={err:.3e} "
                f"all_fit={allfit}",
                flush=True,
            )


if __name__ == "__main__":
    main()
