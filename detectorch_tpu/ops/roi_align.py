"""RoIAlign — TPU-native, fixed shapes, exact caffe2 semantics.

The reference implements RoIAlign as CUDA/C++ kernels
(``lib/cppcuda/roi_align_cpu.cpp:119-276``, ``roi_align_forward_cuda.cu:83-212``).
Semantics reproduced here:

  * roi coords scaled by ``spatial_scale`` with NO rounding (cpp:150-153);
  * malformed rois forced to 1x1 in feature coords (cpp:158-159);
  * per-bin sample grid = ``sampling_ratio`` if > 0 else
    ``ceil(roi_size / pooled_size)`` — adaptive, data-dependent (cpp:166-170);
  * samples with y < -1 or y > height (or x ditto) contribute zero but still
    count in the bin average (cpp:50-66 + ``count = gh*gw`` at cpp:173);
  * coordinates clamped into [0, size-1] before bilinear weights (cpp:68-95).

Two TPU formulations, both exact in fp32:

  1. ``roi_align_gather`` — compute all sample coordinates (static
     ``max_grid`` per-bin samples, masked when the adaptive grid is smaller),
     gather the 4 bilinear neighbours from a flattened (multi-level) feature
     atlas, and combine. Memory-bound; right choice for FPN (7x7x256 out).

  2. ``roi_align_matmul`` — bin-averaged bilinear sampling is separable per
     axis, so RoIAlign(roi) == Ky @ F @ Kxᵀ with per-roi interpolation
     matrices Ky (PH, H), Kx (PW, W). Batched over rois this is two large
     MXU matmuls; right choice for C4 (14x14x1024 out of a 1024-channel map)
     where gather traffic would dominate.

The multi-level "atlas" replaces the reference's host-side FPN level routing
(``collect_and_distribute_fpn_rpn_proposals.py:108-129``): all pyramid levels
live in one (L, maxH, maxW, C) array and the level index folds into the
gather offset, so rois of mixed levels process in a single call with no
sorting, splitting, or restore-index round trip.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _roi_geometry(rois, spatial_scale, pooled_h, pooled_w, sampling_ratio, max_grid):
    """Common per-roi geometry. rois (N, 4) image-space xyxy; spatial_scale
    scalar or (N,). Returns start_h/w, bin_h/w, grid_h/w (ints), all (N,)."""
    s = jnp.asarray(spatial_scale, jnp.float32)
    if s.ndim == 0:
        s = jnp.broadcast_to(s, (rois.shape[0],))
    start_w = rois[:, 0] * s
    start_h = rois[:, 1] * s
    end_w = rois[:, 2] * s
    end_h = rois[:, 3] * s
    roi_w = jnp.maximum(end_w - start_w, 1.0)
    roi_h = jnp.maximum(end_h - start_h, 1.0)
    bin_h = roi_h / pooled_h
    bin_w = roi_w / pooled_w
    if sampling_ratio > 0:
        grid_h = jnp.full_like(start_h, sampling_ratio, dtype=jnp.int32)
        grid_w = grid_h
    else:
        grid_h = jnp.clip(jnp.ceil(roi_h / pooled_h), 1, max_grid).astype(jnp.int32)
        grid_w = jnp.clip(jnp.ceil(roi_w / pooled_w), 1, max_grid).astype(jnp.int32)
    return start_h, start_w, bin_h, bin_w, grid_h, grid_w


def _sample_coords(start, bin_size, grid, pooled, max_grid):
    """Sample positions along one axis: (N, pooled, max_grid) float32.
    coord = start + p*bin + (i+0.5)*bin/grid  (cpp:39-45); entries with
    i >= grid are masked out by the caller."""
    p = jnp.arange(pooled, dtype=jnp.float32)[None, :, None]
    i = jnp.arange(max_grid, dtype=jnp.float32)[None, None, :]
    g = grid.astype(jnp.float32)[:, None, None]
    return start[:, None, None] + p * bin_size[:, None, None] + (
        (i + 0.5) * bin_size[:, None, None] / g
    )


def _axis_weights_dense(coords, grid, size, max_grid):
    """Dense per-axis interpolation weights: (N, pooled, size).

    For each sample coordinate y: zero if outside [-1, size] (cpp:50-56),
    else clamp to [0, size-1] and lay down the linear hat max(0, 1-|y-h|)
    over the feature axis — which reproduces the cpp y_low/y_high weights
    including the high-edge clamp (cpp:68-95). Samples beyond the adaptive
    grid count are masked. Result is summed over samples (the 1/count
    normalisation is applied by the caller as 1/(gh*gw))."""
    n, pooled, mg = coords.shape
    in_range = (coords >= -1.0) & (coords <= size)
    live = in_range & (
        jnp.arange(mg, dtype=jnp.int32)[None, None, :] < grid[:, None, None]
    )
    yc = jnp.clip(coords, 0.0, size - 1.0)
    h = jnp.arange(size, dtype=jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(yc[..., None] - h))  # (N, P, mg, size)
    hat = jnp.where(live[..., None], hat, 0.0)
    return jnp.sum(hat, axis=2)  # (N, P, size)


PRECISIONS = {
    "bf16": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def roi_align_matmul(
    features,
    rois,
    pooled_h: int,
    pooled_w: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    precision: str = "highest",
    roi_chunk: int = 128,
    out_dtype=None,
):
    """Separable-matmul RoIAlign on a single feature level.

    features: (H, W, C); rois: (N, 4). Returns (N, PH, PW, C) — float32,
    except the 'bf16' tier which returns bfloat16 (see below). Pass
    out_dtype to pin the output dtype explicitly regardless of tier
    (e.g. out_dtype=jnp.float32 keeps the old contract under 'bf16').

    precision: 'highest' (fp32, bit-parity with the reference kernel),
    'high' (bf16_3x, ~1e-6 rel error, ~2-3x faster on MXU), or 'bf16'
    (~4e-3 rel error, fastest: inputs, the intermediate, and the output
    all bf16 — this op is HBM-bound, so halving the tensors is the win).

    roi_chunk: rois are processed in static chunks of this size via
    lax.scan. The separable form materialises a (chunk, PH, W, C)
    intermediate between the two contractions — at C4 shapes
    (N=1000, W=84, C=1024, fp32) the unchunked intermediate is ~4.8 GB
    per image, which capped the C4 models at batch 2. Chunking bounds it
    at ~600 MB (chunk=128) with no change in results (each roi's output
    is independent). 0 disables chunking.
    """
    height, width, _ = features.shape
    start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_geometry(
        rois, spatial_scale, pooled_h, pooled_w, sampling_ratio, max_grid
    )
    if sampling_ratio > 0:
        max_grid = sampling_ratio
    ys = _sample_coords(start_h, bin_h, grid_h, pooled_h, max_grid)
    xs = _sample_coords(start_w, bin_w, grid_w, pooled_w, max_grid)
    ky = _axis_weights_dense(ys, grid_h, height, max_grid)  # (N, PH, H)
    kx = _axis_weights_dense(xs, grid_w, width, max_grid)  # (N, PW, W)
    inv_count = 1.0 / (grid_h * grid_w).astype(jnp.float32)
    ky = ky * inv_count[:, None, None]

    f = features.astype(jnp.float32)
    # fp32 matmuls: on TPU the default matmul precision truncates inputs to
    # bf16, which costs ~1e-3 absolute error vs the reference kernel.
    hi = PRECISIONS[precision]
    # At C4 shapes this op is HBM-traffic-bound, not FLOPs-bound: the
    # (n, PH, W, C) intermediate between the two contractions is the
    # dominant cost (~38 GB write+read per 8-image 832x1344 batch in fp32).
    # At the 'bf16' tier the inputs are truncated anyway, so storing the
    # intermediate in bf16 halves that traffic for ~the same accuracy.
    # (A Pallas whole-map-in-VMEM kernel was tried and measured SLOWER:
    # ~38 us/grid-step fixed overhead across ~1000 steps/image beats the
    # streamed XLA form's traffic cost — see PERF.md round 2.)
    tmp_t = jnp.bfloat16 if precision == "bf16" else jnp.float32

    def contract(ky_c, kx_c):
        # (n, PH, H) x (H, W*C) -> (n, PH, W, C): one big MXU matmul.
        tmp = jnp.einsum(
            "nph,hwc->npwc", ky_c, f,
            preferred_element_type=tmp_t, precision=hi,
        )
        # (n, PW, W) x (n, PH, W, C) -> (n, PH, PW, C): batched over n.
        # bf16 tier also stores the OUTPUT in bf16 (the consumer is the
        # bf16 res5/mask head, so fp32 here would be 6+ GB of pure write
        # traffic that the next op immediately truncates away)
        return jnp.einsum(
            "nqw,npwc->npqc", kx_c.astype(tmp_t), tmp,
            preferred_element_type=tmp_t, precision=hi,
        )

    n = ky.shape[0]
    if roi_chunk <= 0 or n <= roi_chunk:
        out = contract(ky, kx)
    else:
        pad = (-n) % roi_chunk
        kyp = jnp.pad(ky, ((0, pad), (0, 0), (0, 0)))
        kxp = jnp.pad(kx, ((0, pad), (0, 0), (0, 0)))
        chunks = (n + pad) // roi_chunk
        kyp = kyp.reshape(chunks, roi_chunk, *ky.shape[1:])
        kxp = kxp.reshape(chunks, roi_chunk, *kx.shape[1:])
        out = jax.lax.map(lambda ab: contract(*ab), (kyp, kxp))
        out = out.reshape(chunks * roi_chunk, pooled_h, pooled_w, -1)[:n]
    return out if out_dtype is None else out.astype(out_dtype)


def _gather_bilinear(flat_features, base_offset, ys, xs, w_live, lvl_h, lvl_w, row_stride):
    """Gather 4 neighbours for each sample point and blend.

    flat_features: (T, C) flattened feature rows; base_offset: (N,) int32 flat
    offset of each roi's level slab; ys/xs: (N, P) clamped sample coords;
    w_live: (N, P) 0/1 sample mask; lvl_h/lvl_w: (N,) per-roi valid extent;
    row_stride: (N,) per-roi row pitch. Returns (N, P, C) float32.
    """
    y_max = (lvl_h - 1)[:, None]
    x_max = (lvl_w - 1)[:, None]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, y_max)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, x_max)
    y1 = jnp.minimum(y0 + 1, y_max)
    x1 = jnp.minimum(x0 + 1, x_max)
    ly = ys - y0.astype(jnp.float32)
    lx = xs - x0.astype(jnp.float32)
    hy = 1.0 - ly
    hx = 1.0 - lx

    def take(yy, xx):
        idx = base_offset[:, None] + yy * row_stride[:, None] + xx
        return jnp.take(flat_features, idx.reshape(-1), axis=0).reshape(
            idx.shape + (flat_features.shape[-1],)
        )

    v = (
        take(y0, x0) * (hy * hx * w_live)[..., None]
        + take(y0, x1) * (hy * lx * w_live)[..., None]
        + take(y1, x0) * (ly * hx * w_live)[..., None]
        + take(y1, x1) * (ly * lx * w_live)[..., None]
    )
    return v


def roi_align_gather(
    features,
    rois,
    pooled_h: int,
    pooled_w: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    max_grid: int = 8,
):
    """Gather-based RoIAlign on a single feature level (exact semantics)."""
    height, width, channels = features.shape
    atlas = features.reshape(1, height, width, channels)
    levels = jnp.zeros((rois.shape[0],), jnp.int32)
    return multilevel_roi_align_gather(
        atlas,
        rois,
        levels,
        level_scales=(float(spatial_scale),),
        level_shapes=((height, width),),
        pooled_h=pooled_h,
        pooled_w=pooled_w,
        sampling_ratio=sampling_ratio,
        max_grid=max_grid,
    )


def multilevel_roi_align_gather(
    atlas,
    rois,
    levels,
    level_scales: Sequence[float],
    level_shapes: Sequence[Tuple[int, int]],
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int = 2,
    max_grid: int = 8,
):
    """RoIAlign over an FPN level atlas.

    atlas: (L, maxH, maxW, C) — level l's valid region is
      level_shapes[l] = (H_l, W_l), rest is padding.
    rois: (N, 4) image-space xyxy; levels: (N,) int32 in [0, L).
    Returns (N, PH, PW, C) float32.

    Prefer `multilevel_roi_align` (row-concatenated levels, no padding waste)
    in model code; this padded-atlas variant is kept for kernel tests.
    """
    nlvl, max_h, max_w, channels = atlas.shape
    scales = jnp.asarray(np.asarray(level_scales, np.float32))
    shapes = jnp.asarray(np.asarray(level_shapes, np.int32))  # (L, 2)
    roi_scale = scales[levels]
    lvl_h = shapes[levels, 0]
    lvl_w = shapes[levels, 1]

    start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_geometry(
        rois, roi_scale, pooled_h, pooled_w, sampling_ratio, max_grid
    )
    if sampling_ratio > 0:
        max_grid = sampling_ratio
    ys = _sample_coords(start_h, bin_h, grid_h, pooled_h, max_grid)  # (N,PH,S)
    xs = _sample_coords(start_w, bin_w, grid_w, pooled_w, max_grid)  # (N,PW,S)

    fh = lvl_h.astype(jnp.float32)[:, None, None]
    fw = lvl_w.astype(jnp.float32)[:, None, None]
    live_y = (ys >= -1.0) & (ys <= fh) & (
        jnp.arange(max_grid, dtype=jnp.int32)[None, None, :] < grid_h[:, None, None]
    )
    live_x = (xs >= -1.0) & (xs <= fw) & (
        jnp.arange(max_grid, dtype=jnp.int32)[None, None, :] < grid_w[:, None, None]
    )
    ysc = jnp.clip(ys, 0.0, fh - 1.0)
    xsc = jnp.clip(xs, 0.0, fw - 1.0)

    n = rois.shape[0]
    # Broadcast (PH,S) x (PW,S) sample grids into P = PH*PW*S*S points.
    yy = jnp.broadcast_to(
        ysc[:, :, None, :, None], (n, pooled_h, pooled_w, max_grid, max_grid)
    ).reshape(n, -1)
    xx = jnp.broadcast_to(
        xsc[:, None, :, None, :], (n, pooled_h, pooled_w, max_grid, max_grid)
    ).reshape(n, -1)
    live = (
        jnp.broadcast_to(
            live_y[:, :, None, :, None], (n, pooled_h, pooled_w, max_grid, max_grid)
        )
        & jnp.broadcast_to(
            live_x[:, None, :, None, :], (n, pooled_h, pooled_w, max_grid, max_grid)
        )
    ).reshape(n, -1)

    flat = atlas.reshape(-1, channels).astype(jnp.float32)
    base = levels * (max_h * max_w)
    row_stride = jnp.full_like(levels, max_w)
    vals = _gather_bilinear(
        flat, base, yy, xx, live.astype(jnp.float32), lvl_h, lvl_w, row_stride
    )  # (N, P, C)

    vals = vals.reshape(n, pooled_h, pooled_w, max_grid * max_grid, channels)
    summed = jnp.sum(vals, axis=3)
    inv_count = 1.0 / (grid_h * grid_w).astype(jnp.float32)
    return summed * inv_count[:, None, None, None]


def multilevel_roi_align(
    feature_list,
    rois,
    levels,
    level_scales: Sequence[float],
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int = 2,
    max_grid: int = 8,
):
    """RoIAlign over a list of FPN levels, row-concatenated (no pad waste).

    feature_list: list of (H_l, W_l, C) maps, finest first; rois: (N, 4)
    image-space xyxy; levels: (N,) int32 indices into feature_list.
    Returns (N, PH, PW, C) float32.

    This is the production FPN path: the level index folds into a flat gather
    offset, replacing the reference's host-side collect/distribute + restore
    (collect_and_distribute_fpn_rpn_proposals.py:108-129) with pure index
    arithmetic inside the jit program.
    """
    channels = feature_list[0].shape[-1]
    shapes_np = np.asarray([f.shape[:2] for f in feature_list], np.int32)
    offsets_np = np.concatenate(
        [[0], np.cumsum(shapes_np[:, 0] * shapes_np[:, 1])]
    ).astype(np.int32)
    flat = jnp.concatenate(
        [f.reshape(-1, channels) for f in feature_list], axis=0
    ).astype(jnp.float32)

    scales = jnp.asarray(np.asarray(level_scales, np.float32))
    shapes = jnp.asarray(shapes_np)
    offsets = jnp.asarray(offsets_np[:-1])
    roi_scale = scales[levels]
    lvl_h = shapes[levels, 0]
    lvl_w = shapes[levels, 1]
    base = offsets[levels]

    start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_geometry(
        rois, roi_scale, pooled_h, pooled_w, sampling_ratio, max_grid
    )
    if sampling_ratio > 0:
        max_grid = sampling_ratio
    ys = _sample_coords(start_h, bin_h, grid_h, pooled_h, max_grid)
    xs = _sample_coords(start_w, bin_w, grid_w, pooled_w, max_grid)

    fh = lvl_h.astype(jnp.float32)[:, None, None]
    fw = lvl_w.astype(jnp.float32)[:, None, None]
    live_y = (ys >= -1.0) & (ys <= fh) & (
        jnp.arange(max_grid, dtype=jnp.int32)[None, None, :] < grid_h[:, None, None]
    )
    live_x = (xs >= -1.0) & (xs <= fw) & (
        jnp.arange(max_grid, dtype=jnp.int32)[None, None, :] < grid_w[:, None, None]
    )
    ysc = jnp.clip(ys, 0.0, fh - 1.0)
    xsc = jnp.clip(xs, 0.0, fw - 1.0)

    n = rois.shape[0]
    yy = jnp.broadcast_to(
        ysc[:, :, None, :, None], (n, pooled_h, pooled_w, max_grid, max_grid)
    ).reshape(n, -1)
    xx = jnp.broadcast_to(
        xsc[:, None, :, None, :], (n, pooled_h, pooled_w, max_grid, max_grid)
    ).reshape(n, -1)
    live = (
        jnp.broadcast_to(
            live_y[:, :, None, :, None], (n, pooled_h, pooled_w, max_grid, max_grid)
        )
        & jnp.broadcast_to(
            live_x[:, None, :, None, :], (n, pooled_h, pooled_w, max_grid, max_grid)
        )
    ).reshape(n, -1)

    vals = _gather_bilinear(
        flat, base, yy, xx, live.astype(jnp.float32), lvl_h, lvl_w, lvl_w
    )
    vals = vals.reshape(n, pooled_h, pooled_w, max_grid * max_grid, channels)
    summed = jnp.sum(vals, axis=3)
    inv_count = 1.0 / (grid_h * grid_w).astype(jnp.float32)
    return summed * inv_count[:, None, None, None]


def multilevel_roi_align_feature_grad(
    g,
    feature_shapes: Sequence[Tuple[int, int, int]],
    rois,
    levels,
    level_scales: Sequence[float],
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int = 2,
    max_grid: int = 8,
    roi_chunk: int = 128,
    tmp_dtype=jnp.bfloat16,
    precision=jax.lax.Precision.DEFAULT,
):
    """Feature gradient of multilevel RoIAlign as per-level MXU matmuls.

    RoIAlign is separable (see roi_align_matmul): for a roi on level l,
    out_n = inv_count_n * Ky_n @ F_l @ Kx_nᵀ with dense per-axis hat-weight
    matrices Ky (PH, H_l), Kx (PW, W_l). Hence the cotangent wrt F_l is

        dF_l = Σ_{n: levels[n]=l}  inv_count_n * Ky_nᵀ @ g_n @ Kx_n

    — two einsums per level, all MXU work. This replaces the gather form's
    VJP, whose jnp.take backward is a scatter-add over N*PH*PW*S*S*4
    duplicate row indices per image (VPU/serialization-bound on TPU, the
    same lesson as the forward kernel studies: computed-index scatter loses
    to a matmul reformulation).

    g: (N, PH, PW, C) cotangent; feature_shapes: [(H_l, W_l, C)]. Rois not
    assigned to level l contribute zero via a masked Ky row. Returns a list
    of (H_l, W_l, C) float32 gradients.

    tmp_dtype/precision: by default the operands AND the (n, H, PW, C)
    intermediate of the first contraction are bf16 (a deliberate HBM
    saving — that intermediate is the largest tensor in the backward);
    only the second contraction accumulates fp32. vs the fp32 scatter the
    cost is bf16 rounding of the hat weights and of the intermediate
    (update cosine > 0.999, test-pinned). Pass tmp_dtype=jnp.float32 +
    precision=HIGHEST for near-exact gradients (tests do; the 'highest'
    tier of BWD_PRECISIONS).
    """
    n = rois.shape[0]
    g_tmp = g.astype(tmp_dtype)
    grads = []
    for lvl, (height, width, _) in enumerate(feature_shapes):
        start_h, start_w, bin_h, bin_w, grid_h, grid_w = _roi_geometry(
            rois, float(level_scales[lvl]), pooled_h, pooled_w,
            sampling_ratio, max_grid,
        )
        mg = sampling_ratio if sampling_ratio > 0 else max_grid
        ys = _sample_coords(start_h, bin_h, grid_h, pooled_h, mg)
        xs = _sample_coords(start_w, bin_w, grid_w, pooled_w, mg)
        ky = _axis_weights_dense(ys, grid_h, height, mg)   # (N, PH, H)
        kx = _axis_weights_dense(xs, grid_w, width, mg)    # (N, PW, W)
        inv_count = 1.0 / (grid_h * grid_w).astype(jnp.float32)
        sel = jnp.where(levels == lvl, inv_count, 0.0)
        ky = (ky * sel[:, None, None]).astype(tmp_dtype)
        kx = kx.astype(tmp_dtype)

        def contract(ky_c, kx_c, g_c):
            # (n,PH,H)x(n,PH,PW,C) -> (n,H,PW,C): small-K batched matmul
            tmp = jnp.einsum("nph,npqc->nhqc", ky_c, g_c,
                             preferred_element_type=tmp_dtype,
                             precision=precision)
            # (n,H,PW,C)x(n,PW,W) -> (H,W,C): one big matmul, K = n*PW
            return jnp.einsum("nhqc,nqw->hwc", tmp, kx_c,
                              preferred_element_type=jnp.float32,
                              precision=precision)

        if roi_chunk <= 0 or n <= roi_chunk:
            acc = contract(ky, kx, g_tmp)
        else:
            pad = (-n) % roi_chunk
            kyp = jnp.pad(ky, ((0, pad), (0, 0), (0, 0)))
            kxp = jnp.pad(kx, ((0, pad), (0, 0), (0, 0)))
            gp = jnp.pad(g_tmp, ((0, pad), (0, 0), (0, 0), (0, 0)))
            chunks = (n + pad) // roi_chunk
            kyp = kyp.reshape(chunks, roi_chunk, *ky.shape[1:])
            kxp = kxp.reshape(chunks, roi_chunk, *kx.shape[1:])
            gp = gp.reshape(chunks, roi_chunk, *g_tmp.shape[1:])

            def body(acc, abc):
                return acc + contract(*abc), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((height, width, g.shape[-1]), jnp.float32),
                (kyp, kxp, gp),
            )
        grads.append(acc)
    return grads


BWD_PRECISIONS = {
    # tmp/operand dtype, dot precision for the matmul backward
    "bf16": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
    "high": (jnp.float32, jax.lax.Precision.HIGH),
    "highest": (jnp.float32, jax.lax.Precision.HIGHEST),
}


def make_multilevel_roi_align_fused(
    level_scales: Sequence[float],
    pooled_h: int,
    pooled_w: int,
    sampling_ratio: int = 2,
    bwd: str = "gather",
    bwd_precision: str = "bf16",
    fwd_precision: str = "exact",
):
    """Training-path RoIAlign: Pallas slab-DMA FORWARD + a choice of VJP.

    Inference measured the Pallas kernel at ~2x the gather formulation's
    end-to-end throughput (PERF.md); training kept the gather form because
    the kernel has no backward. This wrapper gives the train step the fast
    forward while the backward evaluates a mathematically identical
    formulation — the cotangent is exact for every roi whose footprint
    fits the slab.

    bwd: 'gather' differentiates the gather formulation (fp32 scatter-add,
    bit-faithful to the reference's roi_align_backward_cuda.cu semantics);
    'matmul' uses the separable-matmul feature gradient
    (multilevel_roi_align_feature_grad — MXU work instead of scatter,
    measured faster on TPU, bf16-rounded weights); 'slab' runs the
    tile-stationary Pallas backward in the slab domain
    (multilevel_roi_align_slab_grad — fp32/HIGHEST, EXACT for in-slab
    rois, deterministic accumulation order, ~20x fewer FLOPs than
    'matmul'; measured the FASTEST EXACT tier on TPU — e2e Mask 296 vs
    381 ms for 'gather' — but slower than 'matmul' bf16 at 257 ms, so it
    is the reference-grade-gradients choice, not the default; PERF.md
    round 5); 'none' returns zero feature gradients (profiling only —
    isolates the backward's cost).

    fwd_precision selects the kernel's forward contraction tier
    ('exact' | 'bf16x3' | 'bf16' — see roi_align_kernel; inference
    measured +4.7%/+19% end-to-end for the latter two, PERF.md round 5).
    The VJP always differentiates the exact formulation regardless of
    the forward tier (same structure as the bwd-tier asymmetry).

    Caveat (documented, matching the inference architecture): rois whose
    sampling footprint exceeds the 64-slab (extreme >~4:1 aspect ratios on
    their assigned FPN level) get crop-clamped forward VALUES; inference
    re-runs such images exactly, training accepts the bounded error on
    those rare rois (the gradient still flows through the exact VJP).
    Returns fn(feature_list, rois, levels) -> (N, PH, PW, C) fp32.
    """
    assert bwd in ("gather", "matmul", "slab", "none"), bwd

    @jax.custom_vjp
    def fn(feature_list, rois, levels):
        from detectorch_tpu.ops.pallas.roi_align_kernel import (
            multilevel_roi_align_pallas,
        )

        out, _ = multilevel_roi_align_pallas(
            feature_list, rois, levels, level_scales,
            pooled_h, pooled_w, sampling_ratio,
            fwd_precision=fwd_precision,
        )
        return out

    def fwd(feature_list, rois, levels):
        return fn(feature_list, rois, levels), (feature_list, rois, levels)

    def bwd_fn(res, g):
        feature_list, rois, levels = res
        if bwd == "none":
            g_feats = [jnp.zeros_like(f) for f in feature_list]
        elif bwd == "slab":
            from detectorch_tpu.ops.pallas.roi_align_kernel import (
                multilevel_roi_align_slab_grad,
            )

            g_feats = multilevel_roi_align_slab_grad(
                g, [f.shape for f in feature_list], rois, levels,
                level_scales, pooled_h, pooled_w, sampling_ratio,
                out_dtype=feature_list[0].dtype,
            )
        elif bwd == "matmul":
            tmp_dtype, prec = BWD_PRECISIONS[bwd_precision]
            g_feats = multilevel_roi_align_feature_grad(
                g, [f.shape for f in feature_list], rois, levels,
                level_scales, pooled_h, pooled_w, sampling_ratio,
                tmp_dtype=tmp_dtype, precision=prec,
            )
            g_feats = [gf.astype(f.dtype)
                       for gf, f in zip(g_feats, feature_list)]
        else:
            _, vjp = jax.vjp(
                lambda fl: multilevel_roi_align(
                    fl, rois, levels, level_scales,
                    pooled_h, pooled_w, sampling_ratio,
                ),
                feature_list,
            )
            (g_feats,) = vjp(g.astype(jnp.float32))
            g_feats = [gf.astype(f.dtype)
                       for gf, f in zip(g_feats, feature_list)]
        # rois/levels are not differentiated (levels is integral; roi
        # coordinates receive no gradient in the reference either —
        # roi_align_backward_cuda.cu computes grad wrt features only)
        zero_rois = jnp.zeros_like(rois)
        zero_levels = np.zeros(levels.shape, dtype=jax.dtypes.float0)
        return (g_feats, zero_rois, zero_levels)

    fn.defvjp(fwd, bwd_fn)
    return fn


def roi_align(
    features,
    rois,
    pooled_h: int,
    pooled_w: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    method: str = "auto",
):
    """Single-level RoIAlign dispatcher.

    method: 'gather' | 'matmul' | 'auto'. 'auto' picks matmul for wide-channel
    maps (C4's 1024ch, where gather traffic dominates) and gather otherwise.
    """
    if method == "auto":
        method = "matmul" if features.shape[-1] >= 512 else "gather"
    fn = roi_align_matmul if method == "matmul" else roi_align_gather
    return fn(features, rois, pooled_h, pooled_w, spatial_scale, sampling_ratio, max_grid)
