"""Stage studies for the two next-largest flagship costs after the round-2
RPN top-k work (VERDICT r2 item 10): per-class NMS (+33.1 ms/batch16) and
the mask branch (+33.2 ms) — measured alternatives, same methodology as the
RPN frontier study (pipelined dispatches, one small fetch, real shapes).

Per-class NMS variants (input: (80 classes, 1000 rois) per image, batch 16):
  nms-full          batched blocked NMS over all 1000 candidates (current)
  nms-top256        lax.top_k 256 per class first, NMS over 256
  nms-top128        ... over 128
  nms-full-b256     blocked NMS with block=256 instead of 128
The top-k prefilter is exact whenever a class has <=M above-threshold
candidates (detectable on device -> the engine's exact-rerun path);
real-weight score distributions put a handful of candidates per class.

Mask branch variants (input: 108 final rois, 14x14 pool, batch 16):
  mask-pallas       Pallas DMA+MXU kernel (current default)
  mask-gather       exact bilinear gather (fewer rois than the box branch
                    -> the Pallas ~38us/grid-step overhead may dominate)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_nms_mask_variants.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from detectorch_tpu.config import PRESETS, TestConfig
from detectorch_tpu.models import fpn as fpn_mod
from detectorch_tpu.models import resnet as resnet_mod
from detectorch_tpu.models import heads as heads_mod
from detectorch_tpu.models.detector import _fpn_roi_align, init_params
from detectorch_tpu.ops import nms as nms_ops
from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels
from detectorch_tpu.ops.roi_align import multilevel_roi_align

B = 16
N = 1000
C = 80
K_PAD = 108

cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"]
DT = jnp.dtype(cfg.compute_dtype)


def timed(fn, args, iters=30, warmup=2):
    """Pipelined dispatch, one tiny fetch per iter (relay methodology)."""
    outs = [fn(*args) for _ in range(warmup)]
    np.asarray(outs[-1])
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(o)
    return (time.time() - t0) / iters * 1000.0


def realistic_scores(rng, b, c, n):
    """Mimic a trained detector: most classes near zero, a few confident."""
    s = rng.uniform(0.0, 0.04, (b, c, n)).astype(np.float32)
    for bi in range(b):
        hot = rng.choice(c, 6, replace=False)
        for h in hot:
            idx = rng.choice(n, 40, replace=False)
            s[bi, h, idx] = rng.uniform(0.05, 1.0, 40)
    return s


def nms_study():
    rng = np.random.RandomState(0)
    boxes = np.zeros((B, C, N, 4), np.float32)
    x1 = rng.uniform(0, 1200, (B, C, N))
    y1 = rng.uniform(0, 700, (B, C, N))
    boxes[..., 0] = x1
    boxes[..., 1] = y1
    boxes[..., 2] = x1 + rng.uniform(8, 120, (B, C, N))
    boxes[..., 3] = y1 + rng.uniform(8, 120, (B, C, N))
    scores = realistic_scores(rng, B, C, N)
    valid = scores > 0.05

    jb, js, jv = jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)

    @jax.jit
    def full(b, s, v):
        def one(bb, ss, vv):
            ki, ko = nms_ops.batched_nms(bb, ss, max_out=K_PAD,
                                         iou_thresh=0.5, valid=vv)
            return ki.sum() + ko.sum()
        return jax.vmap(one)(b, s, v).sum()

    def make_topm(m):
        @jax.jit
        def f(b, s, v):
            def one(bb, ss, vv):
                sv = jnp.where(vv, ss, -jnp.inf)
                top_s, top_i = jax.lax.top_k(sv, m)        # (C, m)
                top_b = jnp.take_along_axis(bb, top_i[..., None], axis=1)
                ki, ko = nms_ops.batched_nms(
                    top_b, top_s, max_out=K_PAD, iou_thresh=0.5,
                    valid=top_s > -jnp.inf,
                )
                # map back to original indices
                ki = jnp.take_along_axis(top_i, ki, axis=1)
                return ki.sum() + ko.sum()
            return jax.vmap(one)(b, s, v).sum()
        return f

    @jax.jit
    def full_b256(b, s, v):
        def one(bb, ss, vv):
            def percls(b2, s2, v2):
                return nms_ops.nms_blocked(b2, s2, K_PAD, 0.5, v2, block=256)
            ki, ko = jax.vmap(percls)(bb, ss, vv)
            return ki.sum() + ko.sum()
        return jax.vmap(one)(b, s, v).sum()

    for label, fn in [
        ("nms-full(b128)", full),
        ("nms-top256", make_topm(256)),
        ("nms-top128", make_topm(128)),
        ("nms-full-b256", full_b256),
    ]:
        ms = timed(fn, (jb, js, jv))
        print(json.dumps({"stage": "per-class-nms", "variant": label,
                          "ms_per_batch16": round(ms, 2)}), flush=True)


def mask_study():
    rng = np.random.RandomState(1)
    params = {k: jnp.asarray(v) for k, v in init_params(cfg, seed=0).items()}
    H, W = 832, 1344
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 30)
    rois_np = np.zeros((B, K_PAD, 4), np.float32)
    x1 = rng.uniform(0, 1200, (B, K_PAD))
    y1 = rng.uniform(0, 700, (B, K_PAD))
    rois_np[..., 0] = x1
    rois_np[..., 1] = y1
    rois_np[..., 2] = x1 + rng.uniform(8, 300, (B, K_PAD))
    rois_np[..., 3] = y1 + rng.uniform(8, 300, (B, K_PAD))
    rois = jnp.asarray(rois_np)
    classes = jnp.asarray(rng.randint(1, 81, (B, K_PAD)))

    msize = cfg.mask.roi_size

    def make(impl, with_head):
        def single(params, image, r, cls):
            x = image[None].astype(DT)
            feats = resnet_mod.multilevel_body(params, x, cfg.arch)
            pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
            lf = [pp[0] for pp in pyramid]
            levels = map_rois_to_fpn_levels(
                r, cfg.fpn.roi_min_level, cfg.fpn.roi_max_level
            ) - cfg.fpn.roi_min_level
            if impl == "pallas":
                mf, _ = _fpn_roi_align(cfg, lf, r, levels, msize)
            else:
                mf = multilevel_roi_align(
                    lf, r, levels, cfg.fpn_spatial_scales, msize, msize,
                    cfg.roi_sampling_ratio,
                )
            if not with_head:
                return mf.astype(jnp.float32).mean()
            mf = mf.astype(DT)
            probs = heads_mod.mask_head(params, mf, cfg.mask.head_type, cfg.arch)
            m = jnp.take_along_axis(probs, cls[:, None, None, None], axis=-1)
            return m.astype(jnp.float32).mean()

        return jax.jit(jax.vmap(single, in_axes=(None, 0, 0, 0)))

    base = None
    for label, impl, with_head in [
        ("backbone-only", "pallas", None),
        ("mask-roialign-pallas", "pallas", False),
        ("mask-roialign-gather", "gather", False),
        ("mask-full-pallas", "pallas", True),
        ("mask-full-gather", "gather", True),
    ]:
        if with_head is None:
            def bb(params, image, r, cls):
                x = image[None].astype(DT)
                feats = resnet_mod.multilevel_body(params, x, cfg.arch)
                pyramid = fpn_mod.fpn_neck(params, feats, cfg.arch)
                return pyramid[0][0].astype(jnp.float32).mean()
            fn = jax.jit(jax.vmap(bb, in_axes=(None, 0, 0, 0)))
        else:
            fn = make(impl, with_head)
        ms = timed(fn, (params, images, rois, classes), iters=20)
        delta = None if base is None else round(ms - base, 2)
        if base is None:
            base = ms
        print(json.dumps({"stage": "mask-branch", "variant": label,
                          "ms_per_batch16": round(ms, 2),
                          "delta_vs_backbone": delta}), flush=True)


if __name__ == "__main__":
    import os

    print(f"devices: {jax.devices()}", flush=True)
    which = os.environ.get("STUDY", "all")
    if which in ("all", "nms"):
        nms_study()
    if which in ("all", "mask"):
        mask_study()
