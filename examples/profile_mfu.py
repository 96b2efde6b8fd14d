#!/usr/bin/env python
"""FLOPs / MFU accounting for the flagship model + device roofline remeasure.

Three measurements, designed for the axon-relay backend where per-call RPC
latency (~35-40 ms) swamps single-op timings and `block_until_ready` does
not truly synchronise:

1. Sustained matmul TFLOP/s: a CHAIN of K dependent bf16 matmuls inside one
   jit program, timed over several dispatches with one tiny scalar fetch.
   Per-matmul time = total / (dispatches * K): the RPC floor and fetch are
   amortised to nothing. This replaces the earlier naive "one matmul, one
   fetch" number (70 ms for 4096^3 = mostly tunnel, not device).

2. FLOPs/image of the flagship program from XLA's own cost analysis
   (compiled.cost_analysis()['flops']) — no hand counting.

3. MFU = achieved FLOP/s (bench.py throughput x FLOPs/img) / peak.

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_mfu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def sustained_matmul_tflops(size=4096, chain=32, iters=6):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).randn(size, size), jnp.bfloat16)
    w = jnp.asarray(np.random.RandomState(1).randn(size, size), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def body(c, _):
            # normalise to keep values finite through the chain
            c = c @ w
            c = c * (1.0 / size)
            return c, ()
        out, _ = jax.lax.scan(body, x, None, length=chain)
        return jnp.float32(out[0, 0])

    run(x, w)  # compile + warm
    float(run(x, w))
    t0 = time.time()
    pending = run(x, w)
    for _ in range(iters - 1):
        nxt = run(x, w)
        float(pending)
        pending = nxt
    float(pending)
    dt = (time.time() - t0) / (iters * chain)
    flops = 2.0 * size ** 3
    return flops / dt / 1e12, dt * 1e3


def flagship_flops_per_image():
    import jax
    import jax.numpy as jnp

    from detectorch_tpu.config import PRESETS, TestConfig
    from detectorch_tpu.models.detector import init_params, make_inference_fn

    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"]
    tcfg = TestConfig()
    params = init_params(cfg, seed=0)
    fn = jax.jit(make_inference_fn(cfg, tcfg))
    img = jnp.zeros((832, 1344, 3), jnp.float32)
    lowered = fn.lower(params, img, jnp.float32(1.66),
                       jnp.float32(500.0), jnp.float32(800.0))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    for size in (2048, 4096, 8192):
        tflops, ms = sustained_matmul_tflops(size)
        print(f"matmul {size}^3 bf16 chained: {ms:.3f} ms/matmul "
              f"-> {tflops:.1f} TFLOP/s "
              f"({100 * tflops * 1e12 / V5E_PEAK_BF16:.1f}% of v5e peak)",
              flush=True)

    flops = flagship_flops_per_image()
    print(f"flagship Mask R-CNN R-50-FPN 832x1344: "
          f"{flops / 1e9:.1f} GFLOP/image (XLA cost analysis)", flush=True)

    img_s = os.environ.get("BENCH_IMG_PER_SEC")
    if img_s:
        achieved = flops * float(img_s)
        print(f"at {img_s} img/s: {achieved/1e12:.2f} TFLOP/s achieved "
              f"-> MFU {100*achieved/V5E_PEAK_BF16:.2f}% of v5e peak",
              flush=True)


if __name__ == "__main__":
    main()
