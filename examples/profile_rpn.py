"""Bisect the FPN RPN/proposal stage cost on device.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_rpn.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from detectorch_tpu.config import PRESETS
from detectorch_tpu.models import fpn as fpn_mod
from detectorch_tpu.models import resnet as resnet_mod
from detectorch_tpu.models import rpn as rpn_mod
from detectorch_tpu.models.detector import init_params
from detectorch_tpu.ops import boxes as box_ops
from detectorch_tpu.ops import nms as nms_ops
from detectorch_tpu.ops.anchors import shifted_anchors

cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"]
H, W = 832, 1344
DT = jnp.dtype(cfg.compute_dtype)


def bench(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:32s} {(time.time()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    params = jax.device_put(init_params(cfg, seed=0))
    rng = np.random.RandomState(0)
    image = jax.device_put((rng.randn(H, W, 3) * 50).astype(np.float32))

    def pyramid_fn(p, img):
        x = img[None].astype(DT)
        feats = resnet_mod.multilevel_body(p, x, cfg.arch)
        pyr = fpn_mod.fpn_neck(p, feats, cfg.arch)
        pyr.append(fpn_mod.subsample2x(pyr[-1]))
        return pyr

    pyr = bench("backbone+neck+P6", jax.jit(pyramid_fn), params, image)

    def heads_fn(p, pyr):
        return [rpn_mod.rpn_head(p, f, "_fpn2") for f in pyr]

    head_outs = bench("rpn heads (5 lvls)", jax.jit(heads_fn), params, pyr)

    def topk_fn(outs):
        res = []
        for cls_prob, _ in outs:
            s = cls_prob[0].reshape(-1)
            k = min(1000, s.shape[0])
            res.append(jax.lax.top_k(s, k))
        return res

    bench("top_k per level", jax.jit(topk_fn), head_outs)

    def decode_fn(outs):
        cand = []
        for lvl, (cls_prob, bbox_pred) in zip(range(2, 7), outs):
            stride = float(2 ** lvl)
            cp, bp = cls_prob[0], bbox_pred[0]
            fh, fw, a = cp.shape
            anchors = jnp.asarray(
                shifted_anchors(int(fh), int(fw), stride, (32.0 * 2 ** (lvl - 2),),
                                (0.5, 1.0, 2.0)))
            s = cp.reshape(-1)
            d = bp.reshape(-1, 4)
            k = min(1000, s.shape[0])
            ts, ti = jax.lax.top_k(s, k)
            props = box_ops.bbox_transform(anchors[ti], d[ti])
            props = box_ops.clip_boxes(props, float(H), float(W))
            ok = box_ops.filter_boxes_mask(props, 0.0, 1.66, float(H), float(W))
            pad = 1000 - k
            if pad:
                props = jnp.pad(props, ((0, pad), (0, 0)))
                ts = jnp.pad(ts, (0, pad))
                ok = jnp.pad(ok, (0, pad))
            cand.append((props, ts, ok))
        return cand

    cand = bench("topk+decode+clip", jax.jit(decode_fn), head_outs)

    def nms_fn(cand):
        boxes = jnp.stack([c[0] for c in cand])
        scores = jnp.stack([c[1] for c in cand])
        valid = jnp.stack([c[2] for c in cand])
        return nms_ops.batched_nms(boxes, scores, max_out=1000,
                                   iou_thresh=0.7, valid=valid)

    bench("batched blocked NMS (5x1000)", jax.jit(nms_fn), cand)

    # isolated raw top_k cost on the P2-sized score vector
    s2 = jax.device_put(rng.rand(209664).astype(np.float32))
    bench("raw top_k(209664 -> 1000)", jax.jit(lambda s: jax.lax.top_k(s, 1000)), s2)
    bench("raw sort(209664)", jax.jit(lambda s: jnp.sort(s)), s2)
    s3 = jax.device_put(rng.rand(52416).astype(np.float32))
    bench("raw top_k(52416 -> 1000)", jax.jit(lambda s: jax.lax.top_k(s, 1000)), s3)
    bench(
        "raw approx_max_k(209664->1000)",
        jax.jit(lambda s: jax.lax.approx_max_k(s, 1000)),
        s2,
    )


if __name__ == "__main__":
    main()
