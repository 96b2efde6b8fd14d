"""Compare NMS formulations on device. Usage:
PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/profile_nms_variants.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from detectorch_tpu.ops import nms as N
from detectorch_tpu.ops.boxes import bbox_overlaps


def nms_global_fixpoint(boxes, scores, max_out, iou_thresh, valid=None):
    """Whole-set fixpoint: sort, one NxN IoU mask, iterate k -> base & ~(kA)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores).astype(jnp.float32)
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    sort_scores, order = jax.lax.top_k(scores, n)
    sboxes = boxes[order]
    base = sort_scores > -jnp.inf
    iou = bbox_overlaps(sboxes, sboxes)
    tri = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    a_mat = ((iou >= iou_thresh) & tri).astype(jnp.float32)

    def cond(c):
        k, prev, it = c
        return (it < n) & jnp.any(k != prev)

    def body(c):
        k, _, it = c
        suppressed = (k.astype(jnp.float32) @ a_mat) > 0
        return base & ~suppressed, k, it + 1

    k0 = base
    k1 = base & ~((k0.astype(jnp.float32) @ a_mat) > 0)
    keep, _, iters = jax.lax.while_loop(cond, body, (k1, k0, jnp.int32(0)))

    pos = jnp.arange(n)
    sel_key = jnp.where(keep, -pos, -(n + 1))
    _, sel = jax.lax.top_k(sel_key.astype(jnp.int32), min(max_out, n))
    sel_ok = keep[sel]
    return jnp.where(sel_ok, order[sel], 0).astype(jnp.int32), sel_ok


def bench(name, fn, *args, iters=20):
    import numpy as _np
    out = fn(*args)
    _np.asarray(jax.tree.leaves(out)[0])  # force real completion (axon quirk)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _np.asarray(jax.tree.leaves(out)[0])
    print(f"{name:40s} {(time.time()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    def mk(n, batch=None):
        shape = (batch, n) if batch else (n,)
        xy = rng.uniform(0, 800, shape + (2,))
        wh = rng.uniform(10, 300, shape + (2,))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(size=shape).astype(np.float32)
        return jax.device_put(boxes), jax.device_put(scores)

    b1, s1 = mk(1024)
    bench("blocked single (1024)",
          jax.jit(lambda b, s: N.nms_blocked(b, s, 1000, 0.7)), b1, s1)
    bench("global fixpoint single (1024)",
          jax.jit(lambda b, s: nms_global_fixpoint(b, s, 1000, 0.7)), b1, s1)
    bench("loop single (1024, max_out 1000)",
          jax.jit(lambda b, s: N.nms_loop(b, s, 1000, 0.7)), b1, s1)

    b5, s5 = mk(1024, batch=5)
    bench("blocked vmap 5x1024",
          jax.jit(jax.vmap(lambda b, s: N.nms_blocked(b, s, 1000, 0.7))), b5, s5)
    bench("global vmap 5x1024",
          jax.jit(jax.vmap(lambda b, s: nms_global_fixpoint(b, s, 1000, 0.7))), b5, s5)

    b80, s80 = mk(1024, batch=80)
    bench("blocked vmap 80x1024 (cls post)",
          jax.jit(jax.vmap(lambda b, s: N.nms_blocked(b, s, 100, 0.5))), b80, s80)
    bench("global vmap 80x1024 (cls post)",
          jax.jit(jax.vmap(lambda b, s: nms_global_fixpoint(b, s, 100, 0.5))), b80, s80)

    b6, s6 = mk(6016)
    bench("blocked single 6016 -> 1000 (C4)",
          jax.jit(lambda b, s: N.nms_blocked(b, s, 1000, 0.7)), b6, s6, iters=5)
    bench("global single 6016 -> 1000 (C4)",
          jax.jit(lambda b, s: nms_global_fixpoint(b, s, 1000, 0.7)), b6, s6, iters=5)

    # correctness cross-check
    idx_a, ok_a = N.nms_blocked(b1, s1, 1000, 0.7)
    idx_b, ok_b = nms_global_fixpoint(b1, s1, 1000, 0.7)
    same = np.array_equal(np.asarray(idx_a)[np.asarray(ok_a)],
                          np.asarray(idx_b)[np.asarray(ok_b)])
    print("blocked == global:", same, flush=True)


if __name__ == "__main__":
    main()
