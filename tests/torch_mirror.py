"""A torch+numpy mirror of the reference pipeline, built from this repo's
param dicts — used as the full-stack parity oracle (the closest available
proxy to running the actual reference, which needs torchvision+CUDA)."""

import numpy as np
import torch
import torch.nn.functional as F

from detectorch_tpu.models.resnet import STAGE_BLOCKS
from tests.oracles import np_bbox_transform, np_nms, np_roi_align
from tests.test_rpn import np_generate_proposals


def t(x):
    return torch.from_numpy(np.asarray(x))


def conv_bn(params, x, name, stride=1, pad=0):
    w = t(params[f"{name}_w"]).permute(3, 2, 0, 1)
    x = F.conv2d(x, w, stride=stride, padding=pad)
    s = t(params[f"{name}_bn_s"]).view(1, -1, 1, 1)
    b = t(params[f"{name}_bn_b"]).view(1, -1, 1, 1)
    return x * s + b


def bottleneck(params, x, prefix, stride, has_proj):
    shortcut = x
    if has_proj:
        shortcut = conv_bn(params, x, f"{prefix}_branch1", stride=stride)
    out = F.relu(conv_bn(params, x, f"{prefix}_branch2a", stride=stride))
    out = F.relu(conv_bn(params, out, f"{prefix}_branch2b", stride=1, pad=1))
    out = conv_bn(params, out, f"{prefix}_branch2c")
    return F.relu(out + shortcut)


def stage(params, x, name, n_blocks, stride):
    for i in range(n_blocks):
        x = bottleneck(params, x, f"{name}_{i}",
                       stride if i == 0 else 1, i == 0)
    return x


def stem(params, x):
    w = t(params["conv1_w"]).permute(3, 2, 0, 1)
    x = F.conv2d(x, w, stride=2, padding=3)
    s = t(params["res_conv1_bn_s"]).view(1, -1, 1, 1)
    b = t(params["res_conv1_bn_b"]).view(1, -1, 1, 1)
    x = F.relu(x * s + b)
    return F.max_pool2d(x, 3, stride=2, padding=1)


def c4_body(params, image_hwc, arch="resnet50"):
    blocks = STAGE_BLOCKS[arch]
    x = t(image_hwc).permute(2, 0, 1)[None]
    x = stem(params, x)
    x = stage(params, x, "res2", blocks[0], 1)
    x = stage(params, x, "res3", blocks[1], 2)
    x = stage(params, x, "res4", blocks[2], 2)
    return x  # NCHW


def rpn_head(params, feats_nchw, prefix="", return_hidden=False):
    w = t(params[f"conv_rpn{prefix}_w"]).permute(3, 2, 0, 1)
    h = F.relu(F.conv2d(feats_nchw, w, bias=t(params[f"conv_rpn{prefix}_b"]), padding=1))
    wc = t(params[f"rpn_cls_logits{prefix}_w"]).permute(3, 2, 0, 1)
    cls = torch.sigmoid(F.conv2d(h, wc, bias=t(params[f"rpn_cls_logits{prefix}_b"])))
    wb = t(params[f"rpn_bbox_pred{prefix}_w"]).permute(3, 2, 0, 1)
    bbox = F.conv2d(h, wb, bias=t(params[f"rpn_bbox_pred{prefix}_b"]))
    if return_hidden:
        return cls, bbox, h
    return cls, bbox


def res5_head(params, roi_feats_nchw, arch="resnet50"):
    x = stage(params, torch.from_numpy(roi_feats_nchw).float(), "res5",
              STAGE_BLOCKS[arch][3], 2)
    return x.mean(dim=(2, 3))  # (N, 2048)


def box_outputs(params, feats):
    cls = F.linear(feats, t(params["cls_score_w"]), t(params["cls_score_b"]))
    cls = F.softmax(cls, dim=1)
    bbox = F.linear(feats, t(params["bbox_pred_w"]), t(params["bbox_pred_b"]))
    return cls.numpy(), bbox.numpy()


def multilevel_body(params, image_hwc, arch="resnet50"):
    blocks = STAGE_BLOCKS[arch]
    x = t(image_hwc).permute(2, 0, 1)[None]
    x = stem(params, x)
    c2 = stage(params, x, "res2", blocks[0], 1)
    c3 = stage(params, c2, "res3", blocks[1], 2)
    c4 = stage(params, c3, "res4", blocks[2], 2)
    c5 = stage(params, c4, "res5", blocks[3], 2)
    return [c2, c3, c4, c5]


def fpn_neck(params, cs, arch="resnet50"):
    """reference fpn_body.forward (detector.py:35-52) in torch."""
    names = {
        "resnet50": ["res2_2", "res3_3", "res4_5", "res5_2"],
        "resnet101": ["res2_2", "res3_3", "res4_22", "res5_2"],
    }[arch]
    lat = []
    for i, c in enumerate(cs):
        suffix = "_sum" if i == 3 else "_sum_lateral"
        w = t(params[f"fpn_inner_{names[i]}{suffix}_w"]).permute(3, 2, 0, 1)
        lat.append(F.conv2d(c, w, bias=t(params[f"fpn_inner_{names[i]}{suffix}_b"])))
    for i in range(2, -1, -1):
        lat[i] = lat[i] + F.interpolate(lat[i + 1], scale_factor=2, mode="nearest")
    outs = []
    for i in range(4):
        w = t(params[f"fpn_{names[i]}_sum_w"]).permute(3, 2, 0, 1)
        outs.append(F.conv2d(lat[i], w, bias=t(params[f"fpn_{names[i]}_sum_b"]), padding=1))
    return outs  # P2..P5


def mlp_head(params, roi_feats_nchw):
    """fc6/fc7 on (N, 256, 7, 7) — NOTE: our fc6 weights are (H, W, C)-major,
    so permute the torch NCHW features to NHWC before flattening."""
    x = torch.from_numpy(roi_feats_nchw).float().permute(0, 2, 3, 1).reshape(
        roi_feats_nchw.shape[0], -1
    )
    x = F.relu(F.linear(x, t(params["fc6_w"]), t(params["fc6_b"])))
    x = F.relu(F.linear(x, t(params["fc7_w"]), t(params["fc7_b"])))
    return x


def four_layer_trunk(params, roi_feats_nchw):
    """reference four_layer_conv (detector.py:67-82): 4x (3x3 conv 256 + relu)."""
    x = torch.from_numpy(roi_feats_nchw).float()
    for i in range(1, 5):
        w = t(params[f"_[mask]_fcn{i}_w"]).permute(3, 2, 0, 1)
        x = F.relu(F.conv2d(x, w, bias=t(params[f"_[mask]_fcn{i}_b"]), padding=1))
    return x


def mask_probs_fpn(params, roi_feats_nchw):
    """reference mask_head.forward with the 1up4convs trunk
    (detector.py:99-112,216-223): trunk -> 2x2/2 deconv -> 1x1 logits ->
    sigmoid. Returns (K, 81, M, M) numpy."""
    x = four_layer_trunk(params, roi_feats_nchw)
    w = t(params["conv5_mask_w"])  # (256, 256, 2, 2) ConvTranspose layout
    x = F.relu(F.conv_transpose2d(x, w, t(params["conv5_mask_b"]), stride=2))
    wl = t(params["mask_fcn_logits_w"]).permute(3, 2, 0, 1)
    logits = F.conv2d(x, wl, t(params["mask_fcn_logits_b"]))
    return torch.sigmoid(logits).detach().numpy()


def mask_probs_c4(params, roi_feats_nchw, arch="resnet50"):
    """reference mask_head.forward with the shared res5 trunk ("upshare",
    detector.py:84-98): res5 stage -> 2x2/2 deconv -> 1x1 logits -> sigmoid.
    Returns (K, 81, M, M) numpy."""
    trunk = stage(params, torch.from_numpy(roi_feats_nchw).float(), "res5",
                  STAGE_BLOCKS[arch][3], 2)
    w = t(params["conv5_mask_w"])  # (2048, 256, 2, 2) ConvTranspose layout
    x = F.relu(F.conv_transpose2d(trunk, w, t(params["conv5_mask_b"]), stride=2))
    wl = t(params["mask_fcn_logits_w"]).permute(3, 2, 0, 1)
    logits = F.conv2d(x, wl, t(params["mask_fcn_logits_b"]))
    return torch.sigmoid(logits).detach().numpy()


def keypoint_trunk(params, roi_feats_nchw, num_convs=8):
    """KRCNN conv trunk mirror (upstream Detectron add_roi_pose_head_v1convX;
    see detectorch_tpu/models/heads.py:keypoint_head): num_convs x
    (3x3 conv 512 + relu). Returns torch (K, 512, 14, 14)."""
    x = torch.from_numpy(roi_feats_nchw).float()
    for i in range(1, num_convs + 1):
        w = t(params[f"conv_fcn{i}_w"]).permute(3, 2, 0, 1)
        x = F.relu(F.conv2d(x, w, bias=t(params[f"conv_fcn{i}_b"]), padding=1))
    return x


def keypoint_logits(params, roi_feats_nchw, num_convs=8):
    """Full KRCNN head mirror: trunk -> 4x4/2/p1 deconv (kps_score_lowres)
    -> FIXED bilinear 2x as a depthwise transposed conv k4/s2/p1 with the
    (0.25, 0.75, 0.75, 0.25) filler — NOT F.interpolate, whose border
    clamping differs from the conv form at the 1-px edge.
    Returns (K, P, 56, 56) numpy fp32 heatmap logits."""
    x = keypoint_trunk(params, roi_feats_nchw, num_convs)
    w = t(params["kps_score_lowres_w"])  # (512, P, 4, 4) ConvTranspose layout
    x = F.conv_transpose2d(x, w, t(params["kps_score_lowres_b"]),
                           stride=2, padding=1)
    p = x.shape[1]
    f = torch.tensor([0.25, 0.75, 0.75, 0.25], dtype=x.dtype)
    kb = torch.outer(f, f)[None, None].repeat(p, 1, 1, 1)
    x = F.conv_transpose2d(x, kb, stride=2, padding=1, groups=p)
    return x.detach().numpy()


def np_map_levels(rois, k_min=2, k_max=5):
    w = rois[:, 2] - rois[:, 0] + 1
    h = rois[:, 3] - rois[:, 1] + 1
    s = np.sqrt(w * h)
    lv = np.floor(4 + np.log2(s / 224.0 + 1e-6))
    return np.clip(lv, k_min, k_max).astype(np.int32)


def fpn_mirror_proposals(cfg, params, image, h, w, im_scale, pyr_np=None):
    """torch+numpy mirror of the FPN trunk + per-level RPN + collect
    (reference detector.py:153-189 + collect_and_distribute...py);
    returns (exp_rois, pyr_np [P2..P5 HWC]). Pass `pyr_np` to reuse an
    already-computed pyramid."""
    from detectorch_tpu.ops.anchors import shifted_anchors

    if pyr_np is None:
        cs = multilevel_body(params, image, cfg.arch)
        pyr = fpn_neck(params, cs, cfg.arch)  # P2..P5 torch NCHW
        pyr_np = [p[0].permute(1, 2, 0).detach().numpy() for p in pyr]
    p6 = pyr_np[-1][::2, ::2, :]
    rpn_feats = pyr_np + [p6]

    cand = []
    for lvl, feat in zip(range(2, 7), rpn_feats):
        ft = torch.from_numpy(feat).permute(2, 0, 1)[None]
        cls, bbox = rpn_head(params, ft, "_fpn2")
        cls_np = cls[0].permute(1, 2, 0).detach().numpy()
        bbox_np = bbox[0].permute(1, 2, 0).detach().numpy()
        anchors = shifted_anchors(
            cls_np.shape[0], cls_np.shape[1], float(2 ** lvl),
            (32.0 * 2 ** (lvl - 2),), (0.5, 1.0, 2.0),
        )
        props, scores = np_generate_proposals(
            cls_np, bbox_np, anchors, float(h), float(w), im_scale,
            cfg.rpn.pre_nms_top_n, cfg.rpn.post_nms_top_n,
            cfg.rpn.nms_thresh, cfg.rpn.min_size,
        )
        cand.append((props, scores))
    # collect: global top-N by score (reference collect, torch.sort desc)
    all_props = np.vstack([c[0] for c in cand])
    all_scores = np.concatenate([c[1] for c in cand])
    order = np.argsort(-all_scores, kind="stable")[: cfg.rpn.post_nms_top_n]
    return all_props[order], pyr_np


def fpn_mirror_roi_align(pyr_np, rois, size, sampling_ratio=2):
    """Level-routed multilevel RoIAlign via the C++-semantics transcription."""
    lvls = np_map_levels(rois)
    roi_feats = np.zeros((len(rois), 256, size, size), np.float32)
    for lv in range(2, 6):
        idx = np.where(lvls == lv)[0]
        if len(idx) == 0:
            continue
        feats_chw = pyr_np[lv - 2].transpose(2, 0, 1).astype(np.float64)
        roi_feats[idx] = np_roi_align(
            feats_chw, rois[idx], size, size, 1.0 / 2 ** lv, sampling_ratio
        ).astype(np.float32)
    return roi_feats


def c4_mirror_proposals(cfg, params, image, h, w, im_scale, feats_np=None):
    """torch+numpy mirror of the C4 trunk + RPN (reference
    detector.py:129-152 + generate_proposals.py); returns
    (exp_rois, c4_feats_chw numpy). Pass `feats_np` (C,H,W) to reuse an
    already-computed trunk."""
    from detectorch_tpu.ops.anchors import shifted_anchors

    if feats_np is None:
        feats = c4_body(params, image, cfg.arch)  # NCHW torch
    else:
        feats = torch.from_numpy(feats_np).float()[None]
    cls_prob, bbox_pred = rpn_head(params, feats, "")
    cls_np = cls_prob[0].permute(1, 2, 0).detach().numpy()
    bbox_np = bbox_pred[0].permute(1, 2, 0).detach().numpy()
    anchors = shifted_anchors(
        cls_np.shape[0], cls_np.shape[1], 16.0,
        tuple(cfg.anchors.sizes), tuple(cfg.anchors.aspect_ratios),
    )
    props, _ = np_generate_proposals(
        cls_np, bbox_np, anchors, float(h), float(w), im_scale,
        cfg.rpn.pre_nms_top_n, cfg.rpn.post_nms_top_n,
        cfg.rpn.nms_thresh, cfg.rpn.min_size,
    )
    return props, feats[0].detach().numpy()


def mirror_box_voting(top_dets, all_dets, thresh, scoring_method="ID",
                      beta=1.0):
    """Transcription of the reference box_voting (boxes.py:280-329), ID and
    AVG scoring (the two methods the pipeline-parity rows exercise; the
    op-level tests cover all six against the executed reference)."""
    out = top_dets.copy()
    for k in range(len(out)):
        iw = np.minimum(out[k, 2], all_dets[:, 2]) - np.maximum(
            out[k, 0], all_dets[:, 0]) + 1
        ih = np.minimum(out[k, 3], all_dets[:, 3]) - np.maximum(
            out[k, 1], all_dets[:, 1]) + 1
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        ua = ((out[k, 2] - out[k, 0] + 1) * (out[k, 3] - out[k, 1] + 1)
              + (all_dets[:, 2] - all_dets[:, 0] + 1)
              * (all_dets[:, 3] - all_dets[:, 1] + 1) - inter)
        ov = inter / ua
        vote = np.where(ov >= thresh)[0]
        ws = all_dets[vote, 4]
        out[k, :4] = np.average(all_dets[vote, :4], axis=0, weights=ws)
        if scoring_method == "AVG":
            out[k, 4] = ws.mean()
        elif scoring_method != "ID":
            raise NotImplementedError(scoring_method)
    return out


def mirror_box_results(scores, boxes, num_classes=81, score_thresh=0.05,
                       overlap_thresh=0.5, max_detections_per_img=100,
                       do_soft_nms=False, soft_nms_sigma=0.5,
                       soft_nms_method="linear", do_bbox_vote=False,
                       bbox_vote_thresh=0.8, bbox_vote_method="ID"):
    """Transcription of the reference box_results_with_nms_and_limit
    (result_utils.py:96-168) INCLUDING its soft-NMS and box-voting options
    (result_utils.py:134-152): per-class threshold + NMS (or soft-NMS),
    optional voting refinement against the full above-threshold candidate
    set, then the global >=image_thresh cap. Returns the per-class list
    `cls_boxes` (each (n, 5) [x1 y1 x2 y2 score]) — class-major, the order
    the reference feeds the mask branch in."""
    from tests.oracles import np_soft_nms

    methods = {"hard": 0, "linear": 1, "gaussian": 2}
    cls_boxes = [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
    for j in range(1, num_classes):
        inds = np.where(scores[:, j] > score_thresh)[0]
        dets_j = np.hstack(
            (boxes[inds, j * 4:(j + 1) * 4], scores[inds, j, np.newaxis])
        ).astype(np.float32, copy=False)
        if do_soft_nms:
            nms_dets, _ = np_soft_nms(
                dets_j, sigma=soft_nms_sigma, Nt=overlap_thresh,
                threshold=0.0001, method=methods[soft_nms_method],
            )
            nms_dets = nms_dets.astype(np.float32)
        else:
            keep = np_nms(dets_j, overlap_thresh)
            nms_dets = dets_j[keep, :]
        if do_bbox_vote and len(nms_dets):
            nms_dets = mirror_box_voting(
                nms_dets, dets_j, bbox_vote_thresh, bbox_vote_method)
        cls_boxes[j] = nms_dets
    if max_detections_per_img > 0:
        image_scores = np.hstack(
            [cls_boxes[j][:, -1] for j in range(1, num_classes)]
        )
        if len(image_scores) > max_detections_per_img:
            image_thresh = np.sort(image_scores)[-max_detections_per_img]
            for j in range(1, num_classes):
                keep = np.where(cls_boxes[j][:, -1] >= image_thresh)[0]
                cls_boxes[j] = cls_boxes[j][keep, :]
    return cls_boxes


def mirror_segm_results(cls_boxes, masks, ref_boxes, im_h, im_w,
                        num_classes=81, M=14, thresh_binarize=0.5):
    """Transcription of the reference segm_results (result_utils.py:170-228):
    1px zero-pad, expand box by (M+2)/M, cv2 bilinear resize, binarize at
    0.5, paste, RLE-encode. `masks` is (K, num_classes, M, M) in class-major
    detection order; `ref_boxes` the matching (K, 4) boxes in original-image
    coords. Returns per-class lists of RLE dicts."""
    import cv2

    from detectorch_tpu.eval import rle as rle_mod

    cls_segms = [[] for _ in range(num_classes)]
    mask_ind = 0
    scale = (M + 2.0) / M
    w_half = (ref_boxes[:, 2] - ref_boxes[:, 0]) * 0.5 * scale
    h_half = (ref_boxes[:, 3] - ref_boxes[:, 1]) * 0.5 * scale
    x_c = (ref_boxes[:, 2] + ref_boxes[:, 0]) * 0.5
    y_c = (ref_boxes[:, 3] + ref_boxes[:, 1]) * 0.5
    ref_boxes = np.stack(
        [x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half], axis=1
    ).astype(np.int32)
    padded_mask = np.zeros((M + 2, M + 2), dtype=np.float32)
    for j in range(1, num_classes):
        segms = []
        for _ in range(cls_boxes[j].shape[0]):
            padded_mask[1:-1, 1:-1] = masks[mask_ind, j, :, :]
            ref_box = ref_boxes[mask_ind, :]
            w = int(np.maximum(ref_box[2] - ref_box[0] + 1, 1))
            h = int(np.maximum(ref_box[3] - ref_box[1] + 1, 1))
            mask = cv2.resize(padded_mask, (w, h))
            mask = np.array(mask > thresh_binarize, dtype=np.uint8)
            im_mask = np.zeros((im_h, im_w), dtype=np.uint8)
            x_0 = max(ref_box[0], 0)
            x_1 = min(ref_box[2] + 1, im_w)
            y_0 = max(ref_box[1], 0)
            y_1 = min(ref_box[3] + 1, im_h)
            im_mask[y_0:y_1, x_0:x_1] = mask[
                (y_0 - ref_box[1]):(y_1 - ref_box[1]),
                (x_0 - ref_box[0]):(x_1 - ref_box[0])
            ]
            segms.append(rle_mod.encode(im_mask))
            mask_ind += 1
        cls_segms[j] = segms
    assert mask_ind == masks.shape[0]
    return cls_segms


def postprocess(scores, boxes_decoded, num_classes=81, score_thresh=0.05,
                nms_thresh=0.5, max_det=100):
    """reference result_utils.box_results_with_nms_and_limit."""
    cls_boxes = [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
    for j in range(1, num_classes):
        inds = np.where(scores[:, j] > score_thresh)[0]
        dets = np.hstack(
            [boxes_decoded[inds, j * 4:(j + 1) * 4], scores[inds, j, None]]
        ).astype(np.float32)
        keep = np_nms(dets, nms_thresh)
        cls_boxes[j] = dets[keep]
    all_scores = np.hstack([cls_boxes[j][:, 4] for j in range(1, num_classes)])
    if len(all_scores) > max_det:
        thresh = np.sort(all_scores)[-max_det]
        for j in range(1, num_classes):
            cls_boxes[j] = cls_boxes[j][cls_boxes[j][:, 4] >= thresh]
    # NOTE: the reference keeps EVERYTHING >= the max_det-th score — ties at
    # the threshold can push the count past max_det (result_utils.py:160-166)
    out = []
    for j in range(1, num_classes):
        for row in cls_boxes[j]:
            out.append((j, row[4], row[:4]))
    out.sort(key=lambda r: -r[1])
    return out
