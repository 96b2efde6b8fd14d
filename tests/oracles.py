"""Independent numpy oracles for the Detectron algorithms under test.

These are straight transcriptions of the reference formulas (cited per
function) used ONLY as test fixtures — the framework itself never calls them.
"""

import numpy as np

BBOX_XFORM_CLIP = 4.135166556742356


def np_bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """reference lib/utils/boxes.py:168-208"""
    boxes = boxes.astype(deltas.dtype)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = np.minimum(deltas[:, 2::4] / ww, BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[:, 3::4] / wh, BBOX_XFORM_CLIP)
    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = np.exp(dw) * widths[:, None]
    pred_h = np.exp(dh) * heights[:, None]
    out = np.zeros(deltas.shape, dtype=deltas.dtype)
    out[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    out[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    out[:, 2::4] = pred_ctr_x + 0.5 * pred_w - 1
    out[:, 3::4] = pred_ctr_y + 0.5 * pred_h - 1
    return out


def np_nms(dets, thresh, kind=None):
    """reference lib/utils_cython/cython_nms.pyx:37-87 (greedy, +1 areas,
    suppress at IoU >= thresh). Returns kept indices in pick order.

    `kind` is the argsort kind. The reference uses numpy's default
    (introsort — stable only below the 16-element insertion-sort cutoff);
    pass kind='stable' to pin the tie order to "higher index first", the
    deterministic interpretation of argsort()[::-1] that the device NMS
    reproduces.
    """
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort(kind=kind)[::-1]
    suppressed = np.zeros(len(dets), dtype=bool)
    keep = []
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(order)):
            j = order[_j]
            if suppressed[j]:
                continue
            xx1 = max(x1[i], x1[j])
            yy1 = max(y1[i], y1[j])
            xx2 = min(x2[i], x2[j])
            yy2 = min(y2[i], y2[j])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            ovr = inter / (areas[i] + areas[j] - inter)
            if ovr >= thresh:
                suppressed[j] = True
    return np.array(keep, dtype=np.int64)


def np_roi_align(features_chw, rois, pooled_h, pooled_w, spatial_scale, sampling_ratio):
    """reference lib/cppcuda/roi_align_cpu.cpp:119-276 — direct transcription.

    features_chw: (C, H, W); rois: (N, 4) [x1,y1,x2,y2] (no batch col).
    Returns (N, C, PH, PW) float64.
    """
    channels, height, width = features_chw.shape
    n_rois = rois.shape[0]
    out = np.zeros((n_rois, channels, pooled_h, pooled_w))
    for n in range(n_rois):
        roi_start_w = rois[n, 0] * spatial_scale
        roi_start_h = rois[n, 1] * spatial_scale
        roi_end_w = rois[n, 2] * spatial_scale
        roi_end_h = rois[n, 3] * spatial_scale
        roi_width = max(roi_end_w - roi_start_w, 1.0)
        roi_height = max(roi_end_h - roi_start_h, 1.0)
        bin_h = roi_height / pooled_h
        bin_w = roi_width / pooled_w
        grid_h = sampling_ratio if sampling_ratio > 0 else int(
            np.ceil(roi_height / pooled_h)
        )
        grid_w = sampling_ratio if sampling_ratio > 0 else int(
            np.ceil(roi_width / pooled_w)
        )
        count = grid_h * grid_w
        for ph in range(pooled_h):
            for pw in range(pooled_w):
                acc = np.zeros(channels)
                for iy in range(grid_h):
                    y = roi_start_h + ph * bin_h + (iy + 0.5) * bin_h / grid_h
                    for ix in range(grid_w):
                        x = roi_start_w + pw * bin_w + (ix + 0.5) * bin_w / grid_w
                        if y < -1.0 or y > height or x < -1.0 or x > width:
                            continue
                        yy = max(y, 0.0)
                        xx = max(x, 0.0)
                        y_low = int(yy)
                        x_low = int(xx)
                        if y_low >= height - 1:
                            y_high = y_low = height - 1
                            yy = float(y_low)
                        else:
                            y_high = y_low + 1
                        if x_low >= width - 1:
                            x_high = x_low = width - 1
                            xx = float(x_low)
                        else:
                            x_high = x_low + 1
                        ly = yy - y_low
                        lx = xx - x_low
                        hy = 1.0 - ly
                        hx = 1.0 - lx
                        acc += (
                            hy * hx * features_chw[:, y_low, x_low]
                            + hy * lx * features_chw[:, y_low, x_high]
                            + ly * hx * features_chw[:, y_high, x_low]
                            + ly * lx * features_chw[:, y_high, x_high]
                        )
                out[n, :, ph, pw] = acc / count
    return out


def np_map_rois_to_fpn_levels(rois, k_min, k_max):
    """reference lib/utils/multilevel_rois.py:41-53"""
    w = rois[:, 2] - rois[:, 0] + 1
    h = rois[:, 3] - rois[:, 1] + 1
    s = np.sqrt(w * h)
    target = np.floor(4 + np.log2(s / 224.0 + 1e-6))
    return np.clip(target, k_min, k_max).astype(np.int32)


def np_soft_nms(dets, sigma=0.5, Nt=0.3, threshold=0.001, method=1):
    """reference lib/utils_cython/cython_nms.pyx:98-202, transcribed."""
    boxes = dets.copy().astype(np.float64)
    n = boxes.shape[0]
    inds = np.arange(n)
    i = 0
    while i < n:
        maxpos = i + np.argmax(boxes[i:n, 4])
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        inds[[i, maxpos]] = inds[[maxpos, i]]
        tx1, ty1, tx2, ty2 = boxes[i, :4]
        pos = i + 1
        while pos < n:
            x1, y1, x2, y2, s = boxes[pos]
            area = (x2 - x1 + 1) * (y2 - y1 + 1)
            iw = min(tx2, x2) - max(tx1, x1) + 1
            if iw > 0:
                ih = min(ty2, y2) - max(ty1, y1) + 1
                if ih > 0:
                    ua = (tx2 - tx1 + 1) * (ty2 - ty1 + 1) + area - iw * ih
                    ov = iw * ih / ua
                    if method == 1:
                        weight = 1 - ov if ov > Nt else 1.0
                    elif method == 2:
                        weight = np.exp(-(ov * ov) / sigma)
                    else:
                        weight = 0.0 if ov > Nt else 1.0
                    boxes[pos, 4] *= weight
                    if boxes[pos, 4] < threshold:
                        boxes[pos] = boxes[n - 1]
                        inds[pos] = inds[n - 1]
                        n -= 1
                        pos -= 1
            pos += 1
        i += 1
    return boxes[:n], inds[:n]


# The matlab anchor table from reference lib/utils/generate_anchors.py:26-51
MATLAB_ANCHORS = np.array(
    [
        [-83.0, -39.0, 100.0, 56.0],
        [-175.0, -87.0, 192.0, 104.0],
        [-359.0, -183.0, 376.0, 200.0],
        [-55.0, -55.0, 72.0, 72.0],
        [-119.0, -119.0, 136.0, 136.0],
        [-247.0, -247.0, 264.0, 264.0],
        [-35.0, -79.0, 52.0, 96.0],
        [-79.0, -167.0, 96.0, 184.0],
        [-167.0, -343.0, 184.0, 360.0],
    ]
)
