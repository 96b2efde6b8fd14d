"""Pallas TPU kernel for multi-level RoIAlign (FPN path).

TPU-native replacement for the reference's CUDA bilinear kernel
(``lib/cppcuda/roi_align_forward_cuda.cu:83-212``):

  * the FPN pyramid lives row-concatenated in HBM; per roi the kernel DMAs
    one fixed (SLAB, SLAB, C) window from the roi's assigned level into
    VMEM (scalar-prefetched origins), double-buffered against compute;
  * the PH×PW×S² bilinear bin-average is evaluated as two small MXU matmuls
    with per-roi separable interpolation matrices (channel-shared weights —
    the vectorised analogue of the reference CPU kernel's PreCalc,
    roi_align_cpu.cpp:22-116) built outside the kernel in the same traced
    program;
  * caffe2 semantics preserved exactly (clamping, out-of-range zeros, bin
    averaging) for every roi whose sampling footprint fits the slab.

Footprint bound: FPN level assignment keeps sqrt(roi area) between 14 and
~42 feature pixels on the assigned level, so square-ish rois always fit a
64-slab; extreme aspect ratios (e.g. 1333x10 boxes) can exceed it on one
axis, where sampling gets crop-clamped. The kernel therefore returns a
per-roi `fits` mask alongside the output; the detector reduces it to a
program-level `roi_align_exact` flag and the inference engine re-runs
flagged images through the exact gather variant (eval/engine.py:finalize),
so end-to-end results are always exact while the fast path stays pure —
this is the default FPN RoIAlign (~2x end-to-end throughput vs gather).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detectorch_tpu.ops.roi_align import _roi_geometry, _sample_coords


def _slab_axis_weights(coords, grid, origin, extent, slab: int, s: int):
    """Per-axis interpolation weights over the slab window: (N, P, slab).

    coords (N, P, S) absolute level coords; origin (N,) slab start row/col;
    extent (N,) level size along the axis. Reproduces the caffe2 rules:
    samples outside [-1, extent] contribute nothing; in-range samples clamp
    into [0, extent-1]; samples beyond the adaptive grid are masked.
    """
    in_range = (coords >= -1.0) & (
        coords <= extent[:, None, None].astype(jnp.float32)
    )
    live = in_range & (
        jnp.arange(s, dtype=jnp.int32)[None, None, :] < grid[:, None, None]
    )
    yc = jnp.clip(
        coords, 0.0,
        jnp.maximum(extent[:, None, None].astype(jnp.float32) - 1.0, 0.0),
    ) - origin[:, None, None].astype(jnp.float32)
    h = jnp.arange(slab, dtype=jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(yc[..., None] - h))
    hat = jnp.where(live[..., None], hat, 0.0)
    # columns past the level extent (zero padding region) carry no weight
    size = jnp.minimum(extent - origin, slab)
    col_ok = h[None, None, None, :] < size[:, None, None, None].astype(jnp.float32)
    hat = jnp.where(col_ok, hat, 0.0)
    return jnp.sum(hat, axis=2)


def slab_fits(rois, levels, level_shapes, level_scales: Sequence[float],
              pooled_h: int, pooled_w: int, sampling_ratio: int = 2,
              slab: int = 64):
    """Per-roi exactness mask of the slab kernel, standalone: True where the
    roi's sampling footprint fits the (slab, slab) VMEM window, i.e. the
    kernel result is bit-exact caffe2 RoIAlign (same derivation as inside
    multilevel_roi_align_pallas). Depends on the roi's extent on its
    assigned level and only weakly on pooled_h/pooled_w (the last sample
    sits bin/(2*s) inside the roi end, and larger pooled sizes shrink the
    bin), so evaluating at the LARGEST pooled size in use gives a
    conservative mask for every branch pooling the same rois.

    level_shapes: (L, 2) int array-like of per-level (H, W). Used by the
    training paths to surface `frac_rois_overflowed` as a metric (the
    inference engine instead re-runs flagged images exactly —
    eval/engine.py)."""
    shapes = jnp.asarray(np.asarray(level_shapes, np.int32))
    scales = jnp.asarray(np.asarray(level_scales, np.float32))
    roi_scale = scales[levels]
    lvl_h = shapes[levels, 0]
    lvl_w = shapes[levels, 1]
    s = sampling_ratio
    start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_geometry(
        rois, roi_scale, pooled_h, pooled_w, s, s
    )
    ys = _sample_coords(start_h, bin_h, grid_h, pooled_h, s)
    xs = _sample_coords(start_w, bin_w, grid_w, pooled_w, s)
    y_min = jnp.clip(jnp.floor(ys[:, 0, 0]), 0.0,
                     jnp.maximum(lvl_h - 1, 0).astype(jnp.float32))
    x_min = jnp.clip(jnp.floor(xs[:, 0, 0]), 0.0,
                     jnp.maximum(lvl_w - 1, 0).astype(jnp.float32))
    y0 = (y_min.astype(jnp.int32) // 8) * 8
    x0 = (x_min.astype(jnp.int32) // 8) * 8
    y_last = jnp.clip(ys[:, -1, -1], 0.0, (lvl_h - 1).astype(jnp.float32))
    x_last = jnp.clip(xs[:, -1, -1], 0.0, (lvl_w - 1).astype(jnp.float32))
    return (
        (jnp.floor(y_last).astype(jnp.int32) + 1 - y0 < slab)
        & (jnp.floor(x_last).astype(jnp.int32) + 1 - x0 < slab)
    )


def _slab_geometry(rois, levels, shapes_np, row_offsets, level_scales,
                   pooled_h: int, pooled_w: int, sampling_ratio: int,
                   slab: int):
    """Shared roi->slab-window geometry for the forward kernel and the
    slab-domain backward: per-roi separable hat-weight matrices over the
    slab window (inv_count folded into ky), window origins in atlas
    coordinates, and the per-roi exactness mask.

    Returns (ky (N, PH, slab) fp32, kx (N, PW, slab) fp32,
    slab_row (N,) int32, slab_col (N,) int32, fits (N,) bool).
    """
    s = sampling_ratio
    scales = jnp.asarray(np.asarray(level_scales, np.float32))
    shapes = jnp.asarray(shapes_np)
    roi_scale = scales[levels]
    lvl_h = shapes[levels, 0]
    lvl_w = shapes[levels, 1]
    lvl_row0 = jnp.asarray(np.asarray(row_offsets[:-1], np.int32))[levels]

    start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_geometry(
        rois, roi_scale, pooled_h, pooled_w, s, s
    )
    ys = _sample_coords(start_h, bin_h, grid_h, pooled_h, s)
    xs = _sample_coords(start_w, bin_w, grid_w, pooled_w, s)

    # slab origin = floor of the smallest clamped sample coordinate,
    # quantised DOWN to the TPU tile granularity (Mosaic requires DMA slice
    # offsets divisible by the (8, 128) tiling on the tiled dims)
    y_min = jnp.clip(jnp.floor(ys[:, 0, 0]), 0.0,
                     jnp.maximum(lvl_h - 1, 0).astype(jnp.float32))
    x_min = jnp.clip(jnp.floor(xs[:, 0, 0]), 0.0,
                     jnp.maximum(lvl_w - 1, 0).astype(jnp.float32))
    y0 = (y_min.astype(jnp.int32) // 8) * 8
    x0 = (x_min.astype(jnp.int32) // 8) * 8

    # exactness indicator: the last sample's high neighbour must fall inside
    y_last = jnp.clip(ys[:, -1, -1], 0.0, (lvl_h - 1).astype(jnp.float32))
    x_last = jnp.clip(xs[:, -1, -1], 0.0, (lvl_w - 1).astype(jnp.float32))
    fits = (
        (jnp.floor(y_last).astype(jnp.int32) + 1 - y0 < slab)
        & (jnp.floor(x_last).astype(jnp.int32) + 1 - x0 < slab)
    )

    ky = _slab_axis_weights(ys, grid_h, y0, lvl_h, slab, s)
    kx = _slab_axis_weights(xs, grid_w, x0, lvl_w, slab, s)
    inv_count = 1.0 / (grid_h * grid_w).astype(jnp.float32)
    ky = (ky * inv_count[:, None, None]).astype(jnp.float32)
    kx = kx.astype(jnp.float32)

    slab_row = (lvl_row0 + y0).astype(jnp.int32)
    slab_col = x0.astype(jnp.int32)
    return ky, kx, slab_row, slab_col, fits


def _roi_align_pallas_batched(
    feature_list,
    rois,
    levels,
    level_scales,
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int,
    slab: int,
    interpret,
    rois_per_step: int,
    fwd_precision: str = "exact",
):
    """Batched core of the forward kernel: feature_list entries (B, H, W, C),
    rois (B, N, 4), levels (B, N). ONE kernel invocation over the whole
    batch — the per-image pyramids stack image-major into a single atlas
    (image b's level rows start at b*rows_img + row_offsets[l]) and the
    B*N rois flatten into one grid. Returns (out (B, N, PH, PW, C) fp32,
    fits (B, N) bool)."""
    assert sampling_ratio > 0, "adaptive sampling uses the C4 matmul path"
    bsz, n = rois.shape[:2]
    channels = feature_list[0].shape[-1]
    dtype = feature_list[0].dtype
    shapes_np = np.asarray([f.shape[1:3] for f in feature_list], np.int32)
    max_w = int(shapes_np[:, 1].max())

    # image-major level-stacked atlas padded to a common width + slab guard
    # bands; each level's row count rounds up to 8 so every slab row origin
    # stays tile-aligned (Mosaic DMA offset constraint)
    row_counts = [(int(h) + 7) // 8 * 8 for h in shapes_np[:, 0]]
    padded = [
        jnp.pad(
            f,
            ((0, 0), (0, rc - f.shape[1]), (0, max_w - f.shape[2]), (0, 0)),
        )
        for f, rc in zip(feature_list, row_counts)
    ]
    row_offsets = np.concatenate([[0], np.cumsum(row_counts)]).astype(np.int32)
    rows_img = int(row_offsets[-1])
    atlas = jnp.concatenate(padded, axis=1).reshape(
        bsz * rows_img, max_w, channels)
    atlas = jnp.pad(atlas, ((0, slab), (0, slab), (0, 0)))

    rois_f = rois.reshape(bsz * n, 4)
    levels_f = levels.reshape(bsz * n)
    ky, kx, slab_row, slab_col, fits = _slab_geometry(
        rois_f, levels_f, shapes_np, row_offsets, level_scales,
        pooled_h, pooled_w, sampling_ratio, slab,
    )
    img = jnp.repeat(
        jnp.arange(bsz, dtype=jnp.int32) * np.int32(rows_img), n)
    slab_row = slab_row + img
    n_flat = bsz * n

    if rois_per_step <= 0:
        # 32 MB of slab scratch either way; the remaining VMEM headroom
        # (v5e physical cap 128 MB) absorbs the R-fold ky/kx/out blocks
        rois_per_step = 8 if jnp.dtype(dtype).itemsize <= 2 else 4
    r_step = max(1, min(rois_per_step, n_flat))
    n_pad = (n_flat + r_step - 1) // r_step * r_step
    if n_pad != n_flat:
        # dummy tail rois: zero weights -> zero output; slab origin (0, 0)
        # is always a valid atlas window (guard padding above)
        pad = n_pad - n_flat
        ky = jnp.pad(ky, ((0, pad), (0, 0), (0, 0)))
        kx = jnp.pad(kx, ((0, pad), (0, 0), (0, 0)))
        slab_row = jnp.pad(slab_row, (0, pad))
        slab_col = jnp.pad(slab_col, (0, pad))

    def kernel(sr_ref, sc_ref, ky_ref, kx_ref, atlas_ref, out_ref, vmem, sems):
        # double-buffered slab DMA: scratch persists across grid steps, so
        # each step prefetches step i+1's R slabs while computing on step
        # i's (the R-roi batching amortises the fixed per-step cost)
        i = pl.program_id(0)
        n_total = pl.num_programs(0)

        def slab_dma(step, slot, r):
            idx = step * r_step + r
            row = pl.multiple_of(sr_ref[idx], 8)
            col = pl.multiple_of(sc_ref[idx], 8)
            return pltpu.make_async_copy(
                atlas_ref.at[pl.ds(row, slab), pl.ds(col, slab), :],
                vmem.at[slot, r],
                sems.at[slot, r],
            )

        cur = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            for r in range(r_step):
                slab_dma(0, cur, r).start()

        @pl.when(i + 1 < n_total)
        def _():
            for r in range(r_step):
                slab_dma(i + 1, nxt, r).start()

        for r in range(r_step):
            slab_dma(i, cur, r).wait()
            kyv = ky_ref[r]
            kxv = kx_ref[r]
            if fwd_precision == "exact":
                # fp32 operands, HIGHEST (6-pass bf16 emulation per matmul)
                slab_v = vmem[cur, r].astype(jnp.float32)
                tmp = jnp.dot(
                    kyv, slab_v.reshape(slab, slab * channels),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(pooled_h, slab, channels)
            elif fwd_precision == "bf16x3":
                # bf16 features are exact bf16 operands; splitting the fp32
                # hat weights into 3 bf16 terms makes each product exact in
                # 3 DEFAULT passes instead of HIGHEST's 6 (Mosaic has no
                # bf16_3x tier — verify-skill round-2 note)
                slab_b = vmem[cur, r].astype(jnp.bfloat16)
                slab_f = slab_b.reshape(slab, slab * channels)
                hi = kyv.astype(jnp.bfloat16)
                r1 = kyv - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                tmp = sum(
                    jnp.dot(t, slab_f, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    for t in (hi, mid, lo)
                ).reshape(pooled_h, slab, channels)
            else:  # 'bf16': single-pass everything (fast bound)
                slab_b = vmem[cur, r].astype(jnp.bfloat16)
                tmp = jnp.dot(
                    kyv.astype(jnp.bfloat16),
                    slab_b.reshape(slab, slab * channels),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                ).reshape(pooled_h, slab, channels)
            if fwd_precision == "bf16":
                out = jax.lax.dot_general(
                    kxv.astype(jnp.bfloat16), tmp.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (PW, PH, C)
            else:
                # the second contraction is the cheap one (N = PH*C): keep
                # it fp32/HIGHEST in both exact-grade modes
                out = jax.lax.dot_general(
                    kxv, tmp,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (PW, PH, C)
            out_ref[r] = jnp.transpose(out, (1, 0, 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // r_step,),
        in_specs=[
            pl.BlockSpec((r_step, pooled_h, slab), lambda i, sr, sc: (i, 0, 0)),
            pl.BlockSpec((r_step, pooled_w, slab), lambda i, sr, sc: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # atlas stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (r_step, pooled_h, pooled_w, channels),
            lambda i, sr, sc: (i, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, r_step, slab, slab, channels), dtype),
            pltpu.SemaphoreType.DMA((2, r_step)),
        ],
    )
    # slab scratch + double-buffered auto-pipeline copies of the out/ky/kx
    # blocks (the atlas stays in HBM) + the in-kernel fp32 slab cast and
    # matmul temporaries; 1.5x headroom then, floor at Mosaic's default
    # scoped limit so small-R configs keep their old headroom
    vmem_bytes = (
        2 * r_step * slab * slab * channels * jnp.dtype(dtype).itemsize
        + 2 * r_step * pooled_h * pooled_w * channels * 4
        + 4 * r_step * (pooled_h + pooled_w) * slab * 4
        + (slab + 2 * pooled_h) * slab * channels * 4
    )
    vmem_limit = min(max(int(vmem_bytes * 1.5), 16 * 1024 * 1024),
                     128 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, pooled_h, pooled_w, channels), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(slab_row, slab_col, ky, kx, atlas)
    return (
        out[:n_flat].reshape(bsz, n, pooled_h, pooled_w, channels),
        fits.reshape(bsz, n),
    )


def multilevel_roi_align_pallas(
    feature_list,
    rois,
    levels,
    level_scales: Sequence[float],
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int = 2,
    slab: int = 64,
    interpret=None,
    rois_per_step: int = 0,
    fwd_precision: str = "exact",
):
    """Pallas multi-level RoIAlign. Returns (out (N, PH, PW, C) fp32,
    fits (N,) bool — True where the result is bit-exact caffe2 RoIAlign).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests).

    BATCH-AWARE via jax.custom_batching.custom_vmap: under one level of
    vmap (the inference engine and every train step vmap a per-image
    program over the batch) the whole batch runs as ONE flat kernel
    invocation over an image-major atlas. Without this, jax's default
    pallas batching cannot put batched scalar-prefetch operands (the
    per-image slab origins) on the grid and falls back to an HLO
    while-loop that dynamic-slices every operand — including the ~46 MB
    atlas — per image (pallas_call.py _batch_with_explicit_loop); measured
    round 5 at 4390 ms vs 9.2 ms flat for the SAME 1024-roi 14^2 workload.

    rois_per_step: rois per grid step (0 = auto by feature dtype: 8 bf16 /
    4 fp32) — amortises the fixed per-step cost (tiny auto-pipelined
    ky/kx/out block copies + grid sequencing) while keeping the per-roi
    math (and hence the output bits) identical."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from jax import custom_batching

    kw = dict(
        level_scales=tuple(level_scales), pooled_h=pooled_h,
        pooled_w=pooled_w, sampling_ratio=sampling_ratio, slab=slab,
        interpret=interpret, rois_per_step=rois_per_step,
        fwd_precision=fwd_precision,
    )

    @custom_batching.custom_vmap
    def op(fl, r, lv):
        out, fits = _roi_align_pallas_batched(
            [f[None] for f in fl], r[None], lv[None], **kw)
        return out[0], fits[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, fl, r, lv):
        fl = [
            f if b else jnp.broadcast_to(f[None], (axis_size,) + f.shape)
            for f, b in zip(fl, in_batched[0])
        ]
        if not in_batched[1]:
            r = jnp.broadcast_to(r[None], (axis_size,) + r.shape)
        if not in_batched[2]:
            lv = jnp.broadcast_to(lv[None], (axis_size,) + lv.shape)
        out, fits = _roi_align_pallas_batched(fl, r, lv, **kw)
        return (out, fits), (True, True)

    return op(feature_list, rois, levels)


def _slab_grad_batched(
    g,
    feature_shapes,
    rois,
    levels,
    level_scales,
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int,
    slab: int,
    c_chunk: int,
    out_dtype,
    interpret,
):
    """Batched core of the slab-domain backward: g (B, N, PH, PW, C),
    rois (B, N, 4), levels (B, N); ONE kernel invocation per image group —
    images stack image-major into the gradient atlas exactly like the
    forward's. The group size bounds VMEM: the kernel keeps the group's
    ky/kx/g fully resident, so groups shrink until they fit a ~40 MB
    budget. Returns a list of (B, H_l, W_l, C) `out_dtype` gradients."""
    assert sampling_ratio > 0, "adaptive sampling uses the C4 matmul path"
    bsz, n = rois.shape[:2]
    channels = feature_shapes[0][-1]
    if channels % c_chunk:
        c_chunk = channels
    n_cc = channels // c_chunk
    shapes_np = np.asarray([fs[:2] for fs in feature_shapes], np.int32)
    max_w = int(shapes_np[:, 1].max())
    w_pad = (max_w + slab + 7) // 8 * 8
    row_counts = [(int(h) + 7) // 8 * 8 for h in shapes_np[:, 0]]
    row_offsets = np.concatenate([[0], np.cumsum(row_counts)]).astype(np.int32)
    rows_img = int(row_offsets[-1])
    band = slab  # origin band height; accumulator covers 2 bands

    # image-group size: the kernel keeps the group's ky/kx/g blocks fully
    # resident in VMEM (pessimistic Mosaic tiling: sublanes to 8, lanes to
    # 128), so bound them to ~40 MB and take the largest divisor of B
    lane = lambda d: (d + 127) // 128 * 128
    sub = lambda d: (d + 7) // 8 * 8
    per_img = n * 4 * (
        pooled_h * lane(slab) + pooled_w * lane(slab)
        + pooled_h * sub(pooled_w) * max(c_chunk, 128)
    )
    bg = max(1, min(bsz, int(40 * 1024 * 1024 // max(per_img, 1))))
    while bsz % bg:
        bg -= 1

    grads = []
    for g0 in range(0, bsz, bg):
        grads.append(_slab_grad_group(
            g[g0:g0 + bg], rois[g0:g0 + bg], levels[g0:g0 + bg],
            shapes_np, row_offsets, rows_img, max_w, w_pad, band,
            level_scales, pooled_h, pooled_w, sampling_ratio, slab,
            c_chunk, n_cc, channels, out_dtype, interpret,
        ))
    if len(grads) == 1:
        return grads[0]
    return [jnp.concatenate([gr[lvl] for gr in grads], axis=0)
            for lvl in range(len(feature_shapes))]


def _slab_grad_group(g, rois, levels, shapes_np, row_offsets, rows_img,
                     max_w, w_pad, band, level_scales, pooled_h, pooled_w,
                     sampling_ratio, slab, c_chunk, n_cc, channels,
                     out_dtype, interpret):
    bsz, n = rois.shape[:2]
    rois_f = rois.reshape(bsz * n, 4)
    levels_f = levels.reshape(bsz * n)
    ky, kx, slab_row, slab_col, _ = _slab_geometry(
        rois_f, levels_f, shapes_np, row_offsets, level_scales,
        pooled_h, pooled_w, sampling_ratio, slab,
    )
    img = jnp.repeat(
        jnp.arange(bsz, dtype=jnp.int32) * np.int32(rows_img), n)
    slab_row = slab_row + img

    rows_total = bsz * rows_img + slab  # window-overhang guard
    n_bands = (rows_total + band - 1) // band
    rows_pad = n_bands * band

    # sort rois by origin band; per-band [start, end) index ranges
    band_id = slab_row // band
    order = jnp.argsort(band_id, stable=True)
    ky = jnp.take(ky, order, axis=0)
    kx = jnp.take(kx, order, axis=0)
    g_s = jnp.take(
        g.reshape(bsz * n, pooled_h, pooled_w, channels).astype(jnp.float32),
        order, axis=0)
    row_s = jnp.take(slab_row, order, axis=0)
    col_s = jnp.take(slab_col, order, axis=0)
    starts = jnp.searchsorted(
        jnp.take(band_id, order, axis=0),
        jnp.arange(n_bands + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    def kernel(st_ref, row_ref, col_ref, ky_ref, kx_ref, g_ref, out_ref, acc):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def body(i, carry):
            kyi = ky_ref[i]  # (PH, slab)
            kxi = kx_ref[i]  # (PW, slab)
            gi = g_ref[i]    # (PH, PW, c_chunk)
            # x first: g @ Kx, contract PW -> (slab_w, PH, cc)
            tmp = jax.lax.dot_general(
                kxi, gi,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # then y: Ky^T @ ., contract PH -> (slab_h, slab_w, cc)
            # DIRECTLY in accumulator layout (no in-loop transpose)
            dslab = jax.lax.dot_general(
                kyi, tmp,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            ro = pl.multiple_of(row_ref[i] - b * band, 8)
            co = pl.multiple_of(col_ref[i], 8)
            cur = acc[pl.ds(ro, slab), pl.ds(co, slab), :]
            acc[pl.ds(ro, slab), pl.ds(co, slab), :] = cur + dslab
            return carry

        jax.lax.fori_loop(st_ref[b], st_ref[b + 1], body, 0)
        out_ref[...] = acc[:band].astype(out_dtype)
        # carry the accumulator tail into the next band (8-row chunks keep
        # the in-place shift free of read/write aliasing)
        for j in range(band // 8):
            acc[pl.ds(j * 8, 8)] = acc[pl.ds(band + j * 8, 8)]
        acc[pl.ds(band, band)] = jnp.zeros(
            (band, w_pad, c_chunk), jnp.float32)

    n_flat = bsz * n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_cc, n_bands),
        in_specs=[
            pl.BlockSpec((n_flat, pooled_h, slab),
                         lambda cc, b, *_: (0, 0, 0)),
            pl.BlockSpec((n_flat, pooled_w, slab),
                         lambda cc, b, *_: (0, 0, 0)),
            pl.BlockSpec(
                (n_flat, pooled_h, pooled_w, c_chunk),
                lambda cc, b, *_: (0, 0, 0, cc),
            ),
        ],
        out_specs=pl.BlockSpec(
            (band, w_pad, c_chunk), lambda cc, b, *_: (b, 0, cc)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * band, w_pad, c_chunk), jnp.float32),
        ],
    )
    # accumulator + the resident ky/kx/g blocks (Mosaic pads ky/kx lanes
    # 64->128 and g sublanes 7->8) + double-buffered out block + matmul /
    # transpose stack temporaries; 1.5x headroom (1.3x measured 3% short
    # on the mask-branch train shape)
    vmem_bytes = (
        2 * band * w_pad * c_chunk * 4
        + n_flat * (pooled_h + pooled_w) * 2 * slab * 4
        + n_flat * pooled_h * ((pooled_w + 7) // 8 * 8) * c_chunk * 4
        + 2 * band * w_pad * c_chunk * jnp.dtype(out_dtype).itemsize
        + 4 * slab * slab * c_chunk * 4
    )
    vmem_limit = min(max(int(vmem_bytes * 1.5), 16 * 1024 * 1024),
                     128 * 1024 * 1024)
    datlas = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (rows_pad, w_pad, channels), out_dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(starts, row_s, col_s, ky, kx, g_s)
    per_img = datlas[:bsz * rows_img].reshape(
        bsz, rows_img, w_pad, channels)
    return [
        per_img[:, row_offsets[lvl]:row_offsets[lvl] + int(h), :int(w), :]
        for lvl, (h, w) in enumerate(shapes_np)
    ]


def multilevel_roi_align_slab_grad(
    g,
    feature_shapes,
    rois,
    levels,
    level_scales: Sequence[float],
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int = 2,
    slab: int = 64,
    c_chunk: int = 128,
    out_dtype=jnp.float32,
    interpret=None,
):
    """Feature gradient of multilevel RoIAlign in the SLAB domain — the
    tile-stationary Pallas mirror of the forward kernel.

    The cotangent of roi n only touches its (slab, slab) window:
    dF += Ky_n^T @ g_n @ Kx_n placed at the window origin — 2*PH*slab*
    (PW + slab)*C FLOPs per roi, vs the dense per-level einsum backward
    (multilevel_roi_align_feature_grad) whose second contraction costs
    H_l*W_l*C*N*PW per level REGARDLESS of where rois live (~20x more at
    production shapes) and materialises an (N, H, PW, C) intermediate in
    HBM. Replaces the reference's global-atomic CUDA scatter
    (roi_align_backward_cuda.cu:109-219) with a deterministic
    band-accumulator sweep — TPU has no atomics, and doesn't need them:

      * the gradient atlas (levels row-stacked, image-major, same layout
        as the forward atlas) is produced in 64-row bands,
        grid = (C chunks, bands);
      * rois are sorted by window-origin band outside the kernel
        (origins are 8-aligned; windows are `slab` tall, so a roi whose
        origin lies in band b writes rows [64b, 64b+128) at most); a
        128-row fp32 VMEM accumulator covers exactly that, and its tail
        carries into the next band by a shift at each band boundary
        (Pallas TPU grids execute sequentially, which makes the carry —
        and the accumulation order — deterministic);
      * per-band rois come from scalar-prefetched [start, end) ranges, so
        each roi is visited exactly once per C chunk;
      * per-roi matmuls run fp32/HIGHEST: for every in-slab roi the
        gradient is EXACT (same summation caveats as any fp32 reduction) —
        out-of-slab rois get the gradient of the crop-clamped forward the
        kernel actually computed, which is MORE consistent than the dense
        backward's exact-op gradient paired with a clamped forward.

    BATCH-AWARE via jax.custom_batching.custom_vmap, like the forward: one
    level of vmap turns into image-major flat kernel invocations (in
    VMEM-bounded image groups) instead of jax's explicit-loop fallback.

    g: (N, PH, PW, C) cotangent; feature_shapes: [(H_l, W_l, C)].
    Returns a list of (H_l, W_l, C) `out_dtype` gradients.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from jax import custom_batching

    kw = dict(
        feature_shapes=[tuple(int(d) for d in fs) for fs in feature_shapes],
        level_scales=tuple(level_scales), pooled_h=pooled_h,
        pooled_w=pooled_w, sampling_ratio=sampling_ratio, slab=slab,
        c_chunk=c_chunk, out_dtype=out_dtype, interpret=interpret,
    )

    @custom_batching.custom_vmap
    def op(gg, r, lv):
        out = _slab_grad_batched(gg[None], rois=r[None], levels=lv[None],
                                 **kw)
        return [o[0] for o in out]

    @op.def_vmap
    def _rule(axis_size, in_batched, gg, r, lv):
        if not in_batched[0]:
            gg = jnp.broadcast_to(gg[None], (axis_size,) + gg.shape)
        if not in_batched[1]:
            r = jnp.broadcast_to(r[None], (axis_size,) + r.shape)
        if not in_batched[2]:
            lv = jnp.broadcast_to(lv[None], (axis_size,) + lv.shape)
        out = _slab_grad_batched(gg, rois=r, levels=lv, **kw)
        return out, [True] * len(out)

    return op(g, rois, levels)
