"""On-device image preprocessing: uint8 raw -> padded float32 blob.

The reference preprocesses entirely on the host (``lib/utils/blob.py:57-87``:
astype(float) - pixel mean, cv2 INTER_LINEAR resize, zero-pad). That is the
right call on a GPU box with a fast PCIe link, but on TPU the input link is
the scarce resource: shipping the 832x1344x3 float32 blob costs ~13.4 MB per
image, while the raw uint8 pixels are ~25x smaller (decoded 640x960 JPEG:
1.8 MB). This module moves the float conversion, bilinear resize, mean
subtraction, and padding INTO the jitted program: the host uploads the raw
uint8 bytes plus ~10 KB of resize tables, and the fp32 blob never exists
host-side.

Resize semantics replicate cv2.resize(float_im, None, fx=s, fy=s,
INTER_LINEAR) exactly at the coefficient level: cv2 maps output pixel dx to
source coordinate float32((dx+0.5)/s - 0.5) — note it uses the GIVEN scale
factor, not the dst/src size ratio — floors, and clamps at both borders
with zeroed fractions (modules/imgproc/src/resize.cpp). We compute the same
indices/weights on the host in double precision (`resize_tables`) and ship
them with the image, so the device does pure gathers + float32 blends. The
only remaining difference from cv2 is the blend order (we run
vertical-then-horizontal, the better layout for (H, W, C) gathers on TPU;
cv2 runs horizontal-then-vertical), i.e. float32 associativity: ~1e-4
absolute on 0..255-scale pixels. tests/test_device_input.py pins the
tolerance and the AP-parity harness shows the end metric is unchanged.

Mean subtraction commutes with bilinear resize (the kernel weights sum to
1), so subtracting AFTER the resize — but only inside the valid region; the
padding stays exactly 0.0 like the reference's zero-pad of mean-subtracted
pixels — is equivalent to the reference's subtract-then-resize order.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from detectorch_tpu.data.transforms import (
    DEFAULT_BUCKETS,
    PIXEL_MEANS_RGB,
    bucket_shape,
    compute_scale,
    round_up,
)

# raw uint8 images are padded up to multiples of this before upload, so a
# dataset of mixed original sizes compiles a handful of programs, not one
# per size (COCO originals cluster around 640x480 / 480x640 / 640x640)
RAW_STRIDE = 160


def _axis_tables(src_len: int, dst_len: int, scale: float, out_cap: int):
    """cv2 INTER_LINEAR index/weight tables for one axis, double precision.

    Returns (i0, w1): (out_cap,) int32 base indices and float32 fractional
    weights; entries >= dst_len are benign fillers (masked downstream).
    sample(i) = src[i0[i]] * (1 - w1[i]) + src[min(i0[i]+1, src_len-1)] * w1[i]
    """
    dx = np.arange(out_cap, dtype=np.float64)
    # cv2 casts the double coordinate to float BEFORE flooring
    fx = ((dx + 0.5) / scale - 0.5).astype(np.float32)
    sx = np.floor(fx).astype(np.int64)
    frac = (fx - sx).astype(np.float32)
    # border clamps with zeroed fraction (resize.cpp xofs construction)
    low = sx < 0
    sx[low] = 0
    frac[low] = 0.0
    high = sx >= src_len - 1
    sx[high] = src_len - 1
    frac[high] = 0.0
    return sx.astype(np.int32), frac


def resize_tables(raw_h: int, raw_w: int, scale: float,
                  out_h: int, out_w: int):
    """Host-side resize tables -> dict of 4 small arrays (~10 KB)."""
    y_i0, y_w1 = _axis_tables(raw_h, int(np.round(raw_h * scale)), scale, out_h)
    x_i0, x_w1 = _axis_tables(raw_w, int(np.round(raw_w * scale)), scale, out_w)
    return {"y_i0": y_i0, "y_w1": y_w1, "x_i0": x_i0, "x_w1": x_w1}


def device_preprocess(
    raw_u8,
    y_i0, y_w1, x_i0, x_w1,
    raw_h, raw_w,
    rsz_h, rsz_w,
    pixel_means=PIXEL_MEANS_RGB,
):
    """(RH, RW, 3) uint8 (padded) -> (len(y_i0), len(x_i0), 3) float32 blob.

    y_i0/y_w1/x_i0/x_w1: resize tables from `resize_tables` (traced arrays,
    static lengths = the output bucket); raw_h/raw_w: actual raw extent
    (traced, bounds the i0+1 clamp); rsz_h/rsz_w: actual resized extent
    (traced, masks the zero padding).
    """
    f = raw_u8.astype(jnp.float32)
    raw_h = jnp.asarray(raw_h, jnp.int32)
    raw_w = jnp.asarray(raw_w, jnp.int32)
    i1y = jnp.minimum(jnp.asarray(y_i0) + 1, raw_h - 1)
    i1x = jnp.minimum(jnp.asarray(x_i0) + 1, raw_w - 1)
    out_h = y_i0.shape[0]
    out_w = x_i0.shape[0]
    # vertical pass: (out_h, RW, 3)
    v = (
        jnp.take(f, jnp.asarray(y_i0), axis=0) * (1.0 - jnp.asarray(y_w1))[:, None, None]
        + jnp.take(f, i1y, axis=0) * jnp.asarray(y_w1)[:, None, None]
    )
    # horizontal pass: (out_h, out_w, 3)
    im = (
        jnp.take(v, jnp.asarray(x_i0), axis=1) * (1.0 - jnp.asarray(x_w1))[None, :, None]
        + jnp.take(v, i1x, axis=1) * jnp.asarray(x_w1)[None, :, None]
    )
    valid = (jnp.arange(out_h)[:, None] < jnp.asarray(rsz_h)) & (
        jnp.arange(out_w)[None, :] < jnp.asarray(rsz_w)
    )
    means = jnp.asarray(np.asarray(pixel_means, np.float32))
    return jnp.where(valid[:, :, None], im - means, 0.0)


def prepare_raw(
    im_rgb: np.ndarray,
    target_size: int = 800,
    max_size: int = 1333,
    pad_stride: int = 32,
    buckets: Optional[Sequence[Tuple[int, int]]] = DEFAULT_BUCKETS,
    raw_stride: int = RAW_STRIDE,
):
    """Host side of the device-preprocess path: pad the uint8 image to a raw
    bucket and compute the resize tables + scalar metadata the device
    program needs.

    Returns (raw_padded_u8, meta) with meta = dict(tables, raw_h, raw_w,
    rsz_h, rsz_w, scale, out_h, out_w, orig_h, orig_w).
    """
    if im_rgb.ndim == 2:
        im_rgb = np.repeat(im_rgb[:, :, None], 3, axis=2)
    if im_rgb.dtype != np.uint8:
        raise ValueError("device preprocess expects uint8 input")
    h, w = im_rgb.shape[:2]
    scale = compute_scale(h, w, target_size, max_size)
    # cv2 dsize: saturate_cast<int>(src * f) == round-half-to-even
    rsz_h = int(np.round(h * scale))
    rsz_w = int(np.round(w * scale))
    out_h, out_w = bucket_shape(rsz_h, rsz_w, pad_stride, buckets)
    rh, rw = round_up(h, raw_stride), round_up(w, raw_stride)
    raw = np.zeros((rh, rw, 3), np.uint8)
    raw[:h, :w] = im_rgb
    meta = {
        "tables": resize_tables(h, w, scale, out_h, out_w),
        "raw_h": h, "raw_w": w, "rsz_h": rsz_h, "rsz_w": rsz_w,
        "scale": scale, "out_h": out_h, "out_w": out_w,
        "orig_h": h, "orig_w": w,
    }
    return raw, meta


def pack_tables_meta(m) -> Tuple[np.ndarray, np.ndarray]:
    """Pack `prepare_raw`'s resize tables + metadata into ONE (4, L) f32
    array (rows y_i0/y_w1/x_i0/x_w1) and ONE 7-vector
    (raw_h, raw_w, rsz_h, rsz_w, scale, orig_h, orig_w).

    This layout is a cross-module contract: `device_preprocess` (and the
    engine's `_scale_of`, which reads meta[4]) consume exactly these row
    and element positions. Every separate device argument costs a full
    transfer RPC on an RPC-floored link, and index tables stored as f32
    are exact below 2^24."""
    t = m["tables"]
    L = max(m["out_h"], m["out_w"])
    tables = np.zeros((4, L), np.float32)
    tables[0, : m["out_h"]] = t["y_i0"]
    tables[1, : m["out_h"]] = t["y_w1"]
    tables[2, : m["out_w"]] = t["x_i0"]
    tables[3, : m["out_w"]] = t["x_w1"]
    meta = np.asarray(
        [m["raw_h"], m["raw_w"], m["rsz_h"], m["rsz_w"],
         m["scale"], m["orig_h"], m["orig_w"]], np.float32)
    return tables, meta
