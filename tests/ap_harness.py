"""Full-pipeline AP-parity harness.

The defining acceptance gate for this framework is "box/mask AP within 0.2
points of the reference" (reference README.md:24-32). No real Detectron
weights or COCO images exist in this container, so the closest obtainable
proxy is: run the COMPLETE torch+numpy mirror of the reference pipeline
(preprocess -> backbone -> RPN -> NMS -> heads -> postprocess -> mask paste
-> RLE -> COCOeval) and our `evaluate_dataset` side by side on a
deterministic synthetic COCO set, for every preset, and require the final
AP numbers to agree.

Weights: random-init backbone + BN perturbation (as in the full-stack
tests), with the terminal predictors (cls_score / bbox_pred /
mask_fcn_logits) trained as linear probes on the *mirror's* frozen features,
so scores are confident, spread over (0.05, 1), tie-free, and the resulting
AP is non-trivial (detections actually land on objects).  The probes are
plain torch optimization — weights are data shared by both pipelines.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import torch
import torch.nn.functional as F

from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig
from detectorch_tpu.data import transforms as T
from detectorch_tpu.data.coco import CocoDataset
from detectorch_tpu.data.synth import build_synth_coco, write_proposals_pkl
from detectorch_tpu.eval import rle as rle_mod
from detectorch_tpu.eval.coco_eval import COCOeval
from detectorch_tpu.models.detector import init_params
from detectorch_tpu.ops.anchors import shifted_anchors
from tests import torch_mirror as TM
from tests.oracles import np_bbox_transform, np_roi_align

HARNESS_ROOT = os.environ.get("AP_HARNESS_ROOT", "/tmp/ap_synth")

# Reduced-but-realistic proposal counts so the 7-preset matrix runs in
# CI time (both pipelines use the same values; parity is config-agnostic).
C4_RPN = RPNConfig(pre_nms_top_n=600, post_nms_top_n=150)
FPN_RPN = RPNConfig(pre_nms_top_n=300, post_nms_top_n=100)

HARNESS_TCFG = TestConfig(
    target_size=256, max_size=320, exact_blob_dims=True, max_proposals=256
)

# Production-shape configuration (VERDICT r2 item 1): the reference's real
# test-time counts — 800/1333 resize, C4 RPN 6000->1000
# (generate_proposals.py:13-29 defaults) / FPN 1000 per level
# (detector.py:203-207), 1000 rois through the heads, 100-detection global
# cap (result_utils.py:96-168). This regime exercises the top-k/tie
# behaviour the CI-sized harness cannot (SURVEY "Hard parts"); it is
# CPU-expensive, so it runs via `tools/ap_parity.py --shapes production`
# (recorded in AP_PARITY.json), not in the default suite.
PRODUCTION_TCFG = TestConfig(
    target_size=800, max_size=1333, exact_blob_dims=True, max_proposals=1000
)


def harness_cfg(preset: str, shapes: str = "harness"):
    if shapes == "production":
        cfg = PRESETS[preset].replace(
            compute_dtype="float32",
            roi_align_precision="highest",
            # full production RPN counts (the preset defaults)
        )
        return cfg, PRODUCTION_TCFG
    cfg = PRESETS[preset].replace(
        compute_dtype="float32",
        # bit-parity configuration: the proof runs exact fp32 RoIAlign
        # regardless of the production preset's precision tier
        roi_align_precision="highest",
        rpn=FPN_RPN if PRESETS[preset].use_fpn else C4_RPN,
    )
    return cfg, HARNESS_TCFG


def prepare_dataset(root: str = HARNESS_ROOT):
    ann, imdir = build_synth_coco(root, n_images=24, height=224, width=288,
                                  seed=5)
    props = os.path.join(root, "proposals.pkl")
    if not os.path.exists(props):
        write_proposals_pkl(ann, props)
    return CocoDataset(ann, imdir), props


def prepare_keypoint_dataset(root: str = HARNESS_ROOT + "_kp"):
    """person_keypoints-schema synthetic set for the keypoint-preset row."""
    ann, imdir = build_synth_coco(root, n_images=16, height=224, width=288,
                                  seed=6, with_keypoints=True)
    return CocoDataset(ann, imdir)


# ---------------------------------------------------------------------------
# probe-weight construction
# ---------------------------------------------------------------------------

FAMILY_PRESET = {
    "r50_c4": "e2e_mask_rcnn_R-50-C4_2x",
    "r50_fpn": "e2e_mask_rcnn_R-50-FPN_2x",
    "r101_fpn": "e2e_mask_rcnn_R-101-FPN_2x",
    # keypoint family: 2-class (person) head probes + KRCNN deconv probe,
    # trained on the person-keypoints synthetic set
    "r50_fpn_kp": "e2e_keypoint_rcnn_R-50-FPN_1x",
}


def family_of(preset: str) -> str:
    cfg = PRESETS[preset]
    if cfg.keypoint is not None:
        return "r50_fpn_kp"
    return ("r101_" if cfg.arch == "resnet101" else "r50_") + (
        "fpn" if cfg.use_fpn else "c4"
    )


def _perturb_bn(params, rng):
    for k in list(params):
        if k.endswith("_bn_s") and not k.endswith("branch2c_bn_s"):
            params[k] = rng.uniform(0.8, 1.2, params[k].shape).astype(np.float32)
        if k.endswith("_bn_b"):
            params[k] = (rng.randn(*params[k].shape) * 0.02).astype(np.float32)
    return params


def _probe_rois(entry, scale, rng, jitters=4, randoms=24):
    """Training rois (network-input coords) + labels + gt index per roi."""
    gt = entry.boxes[entry.gt_classes > 0] * scale
    gt_cls = entry.gt_classes[entry.gt_classes > 0]
    rois, labels, gti = [], [], []
    for i, (b, c) in enumerate(zip(gt, gt_cls)):
        w, h = b[2] - b[0], b[3] - b[1]
        rois.append(b); labels.append(c); gti.append(i)
        for _ in range(jitters):
            j = b + rng.randn(4) * np.array([w, h, w, h]) * 0.08
            rois.append(j); labels.append(c); gti.append(i)
    H = entry.height * scale
    W = entry.width * scale
    for _ in range(randoms):
        x1 = rng.uniform(0, W * 0.7); y1 = rng.uniform(0, H * 0.7)
        b = np.array([x1, y1, x1 + rng.uniform(10, W * 0.5),
                      y1 + rng.uniform(10, H * 0.5)])
        # label by IoU vs gt
        lab, gidx = 0, -1
        if len(gt):
            xx1 = np.maximum(b[0], gt[:, 0]); yy1 = np.maximum(b[1], gt[:, 1])
            xx2 = np.minimum(b[2], gt[:, 2]); yy2 = np.minimum(b[3], gt[:, 3])
            inter = np.maximum(0, xx2 - xx1 + 1) * np.maximum(0, yy2 - yy1 + 1)
            areas = ((gt[:, 2] - gt[:, 0] + 1) * (gt[:, 3] - gt[:, 1] + 1)
                     + (b[2] - b[0] + 1) * (b[3] - b[1] + 1) - inter)
            iou = inter / areas
            k = int(iou.argmax())
            if iou[k] >= 0.5:
                lab, gidx = int(gt_cls[k]), k
        rois.append(b); labels.append(lab); gti.append(gidx)
    rois = np.asarray(rois, np.float64)
    rois[:, [0, 2]] = np.clip(rois[:, [0, 2]], 0, W - 1)
    rois[:, [1, 3]] = np.clip(rois[:, [1, 3]], 0, H - 1)
    return rois, np.asarray(labels, np.int64), np.asarray(gti), gt, gt_cls


def _label_by_iou(props, gt, gt_cls, fg_thresh=0.5):
    """Label proposals by best-IoU gt (Fast R-CNN fg rule)."""
    labels = np.zeros(len(props), np.int64)
    gti = -np.ones(len(props), np.int64)
    if len(gt) == 0 or len(props) == 0:
        return labels, gti
    xx1 = np.maximum(props[:, None, 0], gt[None, :, 0])
    yy1 = np.maximum(props[:, None, 1], gt[None, :, 1])
    xx2 = np.minimum(props[:, None, 2], gt[None, :, 2])
    yy2 = np.minimum(props[:, None, 3], gt[None, :, 3])
    inter = np.maximum(0, xx2 - xx1 + 1) * np.maximum(0, yy2 - yy1 + 1)
    a_p = (props[:, 2] - props[:, 0] + 1) * (props[:, 3] - props[:, 1] + 1)
    a_g = (gt[:, 2] - gt[:, 0] + 1) * (gt[:, 3] - gt[:, 1] + 1)
    iou = inter / (a_p[:, None] + a_g[None, :] - inter)
    best = iou.argmax(axis=1)
    best_iou = iou.max(axis=1)
    fg = best_iou >= fg_thresh
    labels[fg] = gt_cls[best[fg]]
    gti[fg] = best[fg]
    return labels, gti


def _mask_target(entry, gt_index, box, M):
    """Gt polygon -> full mask -> crop to (rounded) box -> resize to MxM."""
    import cv2

    gt_rows = np.where(entry.gt_classes > 0)[0]
    segm = entry.segms[gt_rows[gt_index]]
    full = rle_mod.decode(
        rle_mod.segmentation_to_rle(segm, entry.height, entry.width)
    )
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    x1 = max(x1, 0); y1 = max(y1, 0)
    x2 = min(x2, entry.width - 1); y2 = min(y2, entry.height - 1)
    crop = full[y1:y2 + 1, x1:x2 + 1].astype(np.float32)
    if crop.size == 0:
        crop = np.zeros((2, 2), np.float32)
    return (cv2.resize(crop, (M, M)) > 0.5).astype(np.float32)


def _blob_dims(cfg, image, oh, ow, scale):
    """The reference's proposal clip bounds: the RESIZED blob dims (C4) /
    their ceil-to-coarsest-stride (FPN) — not the padded static shape
    (mirrors models/detector.py:158-168)."""
    im_h = min(round(oh * scale), image.shape[0])
    im_w = min(round(ow * scale), image.shape[1])
    if cfg.use_fpn:
        s = cfg.fpn.coarsest_stride
        im_h = min(-(-im_h // s) * s, image.shape[0])
        im_w = min(-(-im_w // s) * s, image.shape[1])
    return float(im_h), float(im_w)


def _backbone_rpn_levels(cfg, params, image):
    """Mirror backbone + per-level RPN hidden feature maps.

    Returns (backbone, levels) where backbone is the pyramid (FPN, P2..P5
    HWC list) or C4 feats (C,H,W), and levels is a list of
    (hidden (C,fh,fw) numpy, stride, anchor_sizes)."""
    if cfg.use_fpn:
        cs = TM.multilevel_body(params, image, cfg.arch)
        pyr_np = [p[0].permute(1, 2, 0).detach().numpy()
                  for p in TM.fpn_neck(params, cs, cfg.arch)]
        p6 = pyr_np[-1][::2, ::2, :]
        levels = []
        for lvl, feat in zip(range(2, 7), pyr_np + [p6]):
            ft = torch.from_numpy(feat).permute(2, 0, 1)[None]
            _, _, hid = TM.rpn_head(params, ft, "_fpn2", return_hidden=True)
            levels.append(
                (hid[0].detach().numpy(), 2 ** lvl, (32.0 * 2 ** (lvl - 2),))
            )
        return pyr_np, levels
    feats = TM.c4_body(params, image, cfg.arch)
    _, _, hid = TM.rpn_head(params, feats, "", return_hidden=True)
    return feats[0].detach().numpy(), [
        (hid[0].detach().numpy(), 16, tuple(cfg.anchors.sizes))
    ]


def _train_rpn_probe(hidden, labels, steps=300):
    """Logistic objectness probe: hidden (P, C) -> labels (P, A)."""
    x = torch.from_numpy(hidden).float()
    y = torch.from_numpy(labels).float()
    torch.manual_seed(11)
    n_anchor = y.shape[1]
    w = torch.zeros(n_anchor, x.shape[1], requires_grad=True)
    b = torch.zeros(n_anchor, requires_grad=True)
    opt = torch.optim.Adam([w, b], lr=1e-2)
    s = float(x.std() + 1e-6)
    xn = x / s
    pos_weight = (y.numel() - y.sum()).clamp(min=1.0) / y.sum().clamp(min=1.0)
    for _ in range(steps):
        opt.zero_grad()
        logits = F.linear(xn, w, b)
        loss = F.binary_cross_entropy_with_logits(
            logits, y, pos_weight=pos_weight.clamp(max=100.0)
        )
        loss.backward()
        opt.step()
    # Temperature-rescale so logits stay out of sigmoid saturation: saturated
    # scores collapse to fp32 ties, making the proposal ORDER sensitive to
    # cross-backend float noise (the exact failure mode this harness must not
    # manufacture — real weights aren't this confident on 8 shape classes).
    with torch.no_grad():
        q = torch.quantile(F.linear(xn, w, b).abs().flatten(), 0.999)
        lam = float(4.0 / q.clamp(min=4.0))
    # store as a 1x1 conv in the framework's HWIO (1, 1, C, A) layout
    w_hwio = (w * lam / s).detach().numpy().astype(np.float32)
    return w_hwio.T[None, None], (b * lam).detach().numpy().astype(np.float32)


def _box_feats(cfg, params, backbone, rois):
    """Mirror box-head features for given rois (scaled coords)."""
    if cfg.use_fpn:
        roi_feats = TM.fpn_mirror_roi_align(
            backbone, rois, cfg.roi_size, cfg.roi_sampling_ratio
        )
        return TM.mlp_head(params, roi_feats).detach().numpy()
    roi_feats = np_roi_align(
        backbone.astype(np.float64), rois, cfg.roi_size, cfg.roi_size,
        cfg.spatial_scale, cfg.roi_sampling_ratio,
    ).astype(np.float32)
    return TM.res5_head(params, roi_feats, cfg.arch).detach().numpy()


def _mask_trunk_feats(cfg, params, backbone, rois):
    """Mirror activations right before mask_fcn_logits: (K, 256, M, M)."""
    if cfg.use_fpn:
        roi_feats = TM.fpn_mirror_roi_align(
            backbone, rois, cfg.mask.roi_size, cfg.roi_sampling_ratio
        )
        x = TM.four_layer_trunk(params, roi_feats)
        w = TM.t(params["conv5_mask_w"])
        x = F.relu(F.conv_transpose2d(x, w, TM.t(params["conv5_mask_b"]), stride=2))
        return x.detach().numpy()
    roi_feats = np_roi_align(
        backbone.astype(np.float64), rois, cfg.mask.roi_size,
        cfg.mask.roi_size, cfg.spatial_scale, cfg.roi_sampling_ratio,
    ).astype(np.float32)
    trunk = TM.stage(params, torch.from_numpy(roi_feats).float(), "res5",
                     TM.STAGE_BLOCKS[cfg.arch][3], 2)
    w = TM.t(params["conv5_mask_w"])
    x = F.relu(F.conv_transpose2d(trunk, w, TM.t(params["conv5_mask_b"]), stride=2))
    return x.detach().numpy()


def _kp_trunk_feats(cfg, params, backbone, rois):
    """Mirror KRCNN trunk activations for given rois: (K, 512, 14, 14)."""
    roi_feats = TM.fpn_mirror_roi_align(
        backbone, rois, cfg.keypoint.roi_size, cfg.roi_sampling_ratio
    )
    return TM.keypoint_trunk(
        params, roi_feats, cfg.keypoint.num_convs
    ).detach().numpy()


def _train_kp_probe(kfeats, bins, vis, params, steps=300):
    """Train kps_score_lowres (4x4/2 deconv 512->P) on mirror trunk
    activations with per-keypoint spatial cross-entropy to the 56x56 gt
    heatmap bins (the trunk stays at its random init, exactly like the
    mask probe trains only mask_fcn_logits)."""
    x = torch.from_numpy(kfeats).float()               # (K, 512, 14, 14)
    n_kp = params["kps_score_lowres_w"].shape[1]
    torch.manual_seed(13)
    w = torch.zeros(x.shape[1], n_kp, 4, 4, requires_grad=True)
    b = torch.zeros(n_kp, requires_grad=True)
    opt = torch.optim.Adam([w, b], lr=1e-2)
    s = float(x.std() + 1e-6)
    xn = x / s
    idx = torch.from_numpy(bins).long()                # (K, P)
    msk = torch.from_numpy(vis)                        # (K, P) bool
    f = torch.tensor([0.25, 0.75, 0.75, 0.25])
    kb = torch.outer(f, f)[None, None].repeat(n_kp, 1, 1, 1)

    def logits56(weight, bias):
        lo = F.conv_transpose2d(xn, weight, bias, stride=2, padding=1)
        hi = F.conv_transpose2d(lo, kb, stride=2, padding=1, groups=n_kp)
        return hi.flatten(2)                           # (K, P, 3136)

    for _ in range(steps):
        opt.zero_grad()
        lg = logits56(w, b)
        nll = F.cross_entropy(
            lg.reshape(-1, lg.shape[-1]), idx.reshape(-1), reduction="none"
        ).reshape(idx.shape)
        loss = (nll * msk).sum() / msk.sum().clamp(min=1)
        loss.backward()
        opt.step()
    # Temperature-rescale out of softmax saturation (see _train_rpn_probe):
    # saturated per-bin logits tie in fp32 and make the ARGMAX bin order
    # sensitive to cross-backend conv noise.
    with torch.no_grad():
        q = torch.quantile(logits56(w, b).abs().flatten(), 0.999)
        lam = float(4.0 / q.clamp(min=4.0))
    return (
        (w * lam / s).detach().numpy().astype(np.float32),  # native layout
        (b * lam).detach().numpy().astype(np.float32),
    )


def make_probe_weights(family: str, dataset: CocoDataset, cache_root: str = HARNESS_ROOT,
                       shapes: str = "harness"):
    """Probe weights for one backbone family. `shapes='production'` trains
    the probes on 800/1333-scale mirror features (cached separately):
    probes trained at the 256-scale harness regime are degenerate at
    production scale (the backbone features they were fit to shift with
    input resolution), measured AP ~0."""
    suffix = "_v3" if shapes == "harness" else f"_{shapes}_v3"
    os.makedirs(cache_root, exist_ok=True)
    cache = os.path.join(cache_root, f"weights_{family}{suffix}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)

    cfg, tcfg = harness_cfg(FAMILY_PRESET[family], shapes=shapes)
    seed = {"r50_c4": 101, "r50_fpn": 202, "r101_fpn": 303,
            "r50_fpn_kp": 404}[family]
    rng = np.random.RandomState(seed)
    params = _perturb_bn(
        {k: np.asarray(v) for k, v in init_params(cfg, seed=seed).items()}, rng
    )
    # Damp the (untrained) RPN regression so proposals stay anchor-shaped:
    # random-init deltas on O(100) features decode to off-image slivers,
    # which would starve the probe detector of usable proposals.
    for k in list(params):
        if k.startswith("rpn_bbox_pred"):
            params[k] = params[k] * 1e-3

    roidb = dataset.get_roidb(gt=True)

    # ---- pass 1: backbones + RPN hidden features + anchor labels --------
    cached = []          # (entry, image, scale, backbone)
    rpn_hid, rpn_lab = [], []
    for entry in roidb:
        im = T.load_image_rgb(entry.file_path)
        image, scale, _ = T.preprocess_image(
            im, tcfg.target_size, tcfg.max_size,
            pad_stride=cfg.fpn.coarsest_stride if cfg.use_fpn else 32,
            buckets=None,
        )
        backbone, levels = _backbone_rpn_levels(cfg, params, image)
        gt = entry.boxes[entry.gt_classes > 0] * scale
        for hidden, stride, sizes in levels:
            c, fh, fw = hidden.shape
            anchors = shifted_anchors(
                fh, fw, float(stride), tuple(sizes),
                tuple(cfg.anchors.aspect_ratios),
            )
            n_anchor = len(sizes) * len(cfg.anchors.aspect_ratios)
            lab, _ = _label_by_iou(
                np.asarray(anchors, np.float64), gt,
                np.ones(len(gt), np.int64), fg_thresh=0.4,
            )
            rpn_hid.append(hidden.reshape(c, fh * fw).T)
            rpn_lab.append(lab.reshape(fh * fw, n_anchor))
        cached.append((entry, image, scale, backbone))

    prefix = "_fpn2" if cfg.use_fpn else ""
    w_rpn, b_rpn = _train_rpn_probe(
        np.vstack(rpn_hid), np.vstack(rpn_lab).astype(np.float32)
    )
    params[f"rpn_cls_logits{prefix}_w"] = w_rpn
    params[f"rpn_cls_logits{prefix}_b"] = b_rpn

    # ---- pass 2: head probes on the trained-RPN proposal distribution ---
    feats_all, labels_all, tgt_all = [], [], []
    mask_feats_all, mask_tgt_all, mask_cls_all = [], [], []
    kp_feats_all, kp_bins_all, kp_vis_all = [], [], []
    for entry, image, scale, backbone in cached:
        h, w = _blob_dims(cfg, image, entry.height, entry.width, scale)
        if cfg.use_fpn:
            props, _ = TM.fpn_mirror_proposals(
                cfg, params, image, h, w, scale, pyr_np=backbone
            )
        else:
            props, _ = TM.c4_mirror_proposals(
                cfg, params, image, h, w, scale, feats_np=backbone
            )
        props = props[:60]
        rois, labels, gti, gt, gt_cls = _probe_rois(entry, scale, rng)
        p_labels, p_gti = _label_by_iou(props, gt, gt_cls)
        rois = np.vstack([rois, props])
        labels = np.concatenate([labels, p_labels])
        gti = np.concatenate([gti, p_gti])
        feats = _box_feats(cfg, params, backbone, rois)
        feats_all.append(feats); labels_all.append(labels)
        # bbox regression targets for positive rois
        pos = labels > 0
        tg = np.zeros((len(rois), 4), np.float32)
        if pos.any():
            tg[pos] = _bbox_targets(rois[pos], gt[gti[pos]])
        tgt_all.append(tg)
        # mask probe set: gt boxes only
        if cfg.use_mask and len(gt):
            mf = _mask_trunk_feats(cfg, params, backbone, gt)
            mask_feats_all.append(mf)
            for i in range(len(gt)):
                mask_tgt_all.append(
                    _mask_target(entry, i, gt[i] / scale, cfg.mask.resolution)
                )
                mask_cls_all.append(int(gt_cls[i]))
        # keypoint probe set: gt boxes with gt keypoint heatmap bins
        if cfg.keypoint is not None and len(gt):
            from detectorch_tpu.train.sampler import keypoints_to_heatmap_labels

            gt_rows = np.where(entry.gt_classes > 0)[0]
            gt_kps = entry.gt_keypoints[gt_rows]          # (G, P, 3)
            bins, vis = keypoints_to_heatmap_labels(
                gt_kps, entry.boxes[gt_rows], cfg.keypoint.heatmap_size
            )
            kp_feats_all.append(_kp_trunk_feats(cfg, params, backbone, gt))
            kp_bins_all.append(bins)
            kp_vis_all.append(vis)

    feats = np.vstack(feats_all)
    labels = np.concatenate(labels_all)
    tgts = np.vstack(tgt_all)

    cls_w, cls_b, bbox_w, bbox_b = _train_box_probes(
        feats, labels, tgts, params, rng
    )
    params["cls_score_w"] = cls_w
    params["cls_score_b"] = cls_b
    params["bbox_pred_w"] = bbox_w
    params["bbox_pred_b"] = bbox_b

    if cfg.use_mask:
        mfeats = np.vstack(mask_feats_all)
        mtgts = np.stack(mask_tgt_all)
        mcls = np.asarray(mask_cls_all)
        mw, mb = _train_mask_probe(mfeats, mtgts, mcls, params)
        params["mask_fcn_logits_w"] = mw
        params["mask_fcn_logits_b"] = mb

    if cfg.keypoint is not None:
        kw, kb = _train_kp_probe(
            np.vstack(kp_feats_all), np.vstack(kp_bins_all),
            np.vstack(kp_vis_all), params,
        )
        params["kps_score_lowres_w"] = kw
        params["kps_score_lowres_b"] = kb

    with open(cache, "wb") as f:
        pickle.dump(params, f)
    return params


def _bbox_targets(rois, gt, weights=(10.0, 10.0, 5.0, 5.0)):
    ws = rois[:, 2] - rois[:, 0] + 1.0
    hs = rois[:, 3] - rois[:, 1] + 1.0
    cx = rois[:, 0] + 0.5 * ws
    cy = rois[:, 1] + 0.5 * hs
    gws = gt[:, 2] - gt[:, 0] + 1.0
    ghs = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * gws
    gcy = gt[:, 1] + 0.5 * ghs
    wx, wy, ww, wh = weights
    return np.stack([
        wx * (gcx - cx) / ws, wy * (gcy - cy) / hs,
        ww * np.log(gws / ws), wh * np.log(ghs / hs),
    ], axis=1).astype(np.float32)


def _train_box_probes(feats, labels, tgts, params, rng, steps=400):
    x = torch.from_numpy(feats).float()
    y = torch.from_numpy(labels)
    t = torch.from_numpy(tgts).float()
    d = x.shape[1]
    n_cls = params["cls_score_w"].shape[0]
    torch.manual_seed(7)
    cls_w = torch.zeros(n_cls, d, requires_grad=True)
    cls_b = torch.zeros(n_cls, requires_grad=True)
    bbox_w = torch.zeros(4 * n_cls, d, requires_grad=True)
    bbox_b = torch.zeros(4 * n_cls, requires_grad=True)
    opt = torch.optim.Adam([cls_w, cls_b, bbox_w, bbox_b], lr=5e-3)
    pos = y > 0
    col = (y[pos, None] * 4 + torch.arange(4)[None, :]).long()
    xn = x / (x.std() + 1e-6)
    for _ in range(steps):
        opt.zero_grad()
        logits = F.linear(xn, cls_w, cls_b)
        loss = F.cross_entropy(logits, y)
        deltas = F.linear(xn[pos], bbox_w, bbox_b)
        picked = torch.gather(deltas, 1, col)
        loss = loss + F.smooth_l1_loss(picked, t[pos])
        loss.backward()
        opt.step()
    # Temperature-rescale the classifier out of softmax saturation (see
    # _train_rpn_probe): saturated probs tie in fp32 and make the detection
    # order noise-sensitive.
    with torch.no_grad():
        q = torch.quantile(F.linear(xn, cls_w, cls_b).abs().flatten(), 0.999)
        lam = float(6.0 / q.clamp(min=6.0))
    # fold the feature normalisation into the weights
    s = float(x.std() + 1e-6)
    return (
        (cls_w * lam / s).detach().numpy().astype(np.float32),
        (cls_b * lam).detach().numpy().astype(np.float32),
        (bbox_w / s).detach().numpy().astype(np.float32),
        bbox_b.detach().numpy().astype(np.float32),
    )


def _train_mask_probe(mfeats, mtgts, mcls, params, steps=250):
    """Train mask_fcn_logits (1x1 conv 256->C) on gt-class channels."""
    x = torch.from_numpy(mfeats).float()           # (K, 256, M, M)
    t = torch.from_numpy(mtgts).float()            # (K, M, M)
    n_cls = params["mask_fcn_logits_w"].shape[-1]
    torch.manual_seed(9)
    w = torch.zeros(n_cls, x.shape[1], 1, 1, requires_grad=True)
    b = torch.zeros(n_cls, requires_grad=True)
    opt = torch.optim.Adam([w, b], lr=1e-2)
    s = float(x.std() + 1e-6)
    xn = x / s
    idx = torch.from_numpy(mcls).long()
    for _ in range(steps):
        opt.zero_grad()
        logits = F.conv2d(xn, w, b)                # (K, C, M, M)
        picked = logits[torch.arange(len(idx)), idx]
        loss = F.binary_cross_entropy_with_logits(picked, t)
        loss.backward()
        opt.step()
    # store in the framework's HWIO (1, 1, 256, C) layout
    w_hwio = (w / s).detach().numpy().astype(np.float32)
    w_hwio = w_hwio.transpose(2, 3, 1, 0)
    return w_hwio, b.detach().numpy().astype(np.float32)


# ---------------------------------------------------------------------------
# mirror full-pipeline evaluation
# ---------------------------------------------------------------------------

def _mirror_decode_keypoints(heat, boxes):
    """numpy twin of ops/keypoints.heatmaps_to_keypoints: heat (K, P, H, W)
    logits, boxes (K, 4) original-image xyxy -> (K, P, 2) [x, y] at the
    argmax bin center."""
    k, p, h, w = heat.shape
    flat = heat.reshape(k, p, h * w)
    idx = flat.argmax(axis=2)
    x_int = (idx % w).astype(np.float64)
    y_int = (idx // w).astype(np.float64)
    widths = np.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    heights = np.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    x = boxes[:, None, 0] + (x_int + 0.5) * widths[:, None] / w
    y = boxes[:, None, 1] + (y_int + 0.5) * heights[:, None] / h
    return np.stack([x, y], axis=-1)


def mirror_run_image(cfg, tcfg, params, entry, dataset):
    """One image through the complete reference-mirror pipeline. Returns
    (bbox COCO dicts, segm COCO dicts, keypoint COCO dicts)."""
    im = T.load_image_rgb(entry.file_path)
    image, scale, (oh, ow) = T.preprocess_image(
        im, tcfg.target_size, tcfg.max_size,
        pad_stride=cfg.fpn.coarsest_stride if cfg.use_fpn else 32,
        buckets=None,
    )
    h, w = _blob_dims(cfg, image, oh, ow, scale)

    backbone = None
    if cfg.use_rpn:
        if cfg.use_fpn:
            rois, backbone = TM.fpn_mirror_proposals(
                cfg, params, image, h, w, scale
            )
        else:
            rois, backbone = TM.c4_mirror_proposals(
                cfg, params, image, h, w, scale
            )
    else:
        scaled = entry.boxes * scale
        scaled, _ = T.dedup_proposals(scaled, cfg.spatial_scale)
        rois = scaled[: tcfg.max_proposals]
        if cfg.use_fpn:
            cs = TM.multilevel_body(params, image, cfg.arch)
            backbone = [p[0].permute(1, 2, 0).detach().numpy()
                        for p in TM.fpn_neck(params, cs, cfg.arch)]
        else:
            backbone = TM.c4_body(params, image, cfg.arch)[0].detach().numpy()

    if cfg.use_fpn:
        roi_feats = TM.fpn_mirror_roi_align(
            backbone, rois, cfg.roi_size, cfg.roi_sampling_ratio
        )
        feats = TM.mlp_head(params, roi_feats)
    else:
        roi_feats = np_roi_align(
            backbone.astype(np.float64), rois, cfg.roi_size, cfg.roi_size,
            cfg.spatial_scale, cfg.roi_sampling_ratio,
        ).astype(np.float32)
        feats = TM.res5_head(params, roi_feats, cfg.arch)
    cls, deltas = TM.box_outputs(params, feats)

    pred = np_bbox_transform(rois / scale, deltas, tcfg.bbox_reg_weights)
    pred[:, 0::4] = np.clip(pred[:, 0::4], 0, ow - 1)
    pred[:, 1::4] = np.clip(pred[:, 1::4], 0, oh - 1)
    pred[:, 2::4] = np.clip(pred[:, 2::4], 0, ow - 1)
    pred[:, 3::4] = np.clip(pred[:, 3::4], 0, oh - 1)

    cls_boxes = TM.mirror_box_results(
        cls, pred, cfg.num_classes, tcfg.score_thresh, tcfg.nms_thresh,
        tcfg.detections_per_img,
        do_soft_nms=tcfg.soft_nms, soft_nms_sigma=tcfg.soft_nms_sigma,
        soft_nms_method=tcfg.soft_nms_method, do_bbox_vote=tcfg.do_bbox_vote,
        bbox_vote_thresh=tcfg.bbox_vote_thresh,
        bbox_vote_method=tcfg.bbox_vote_method,
    )

    bbox_out = []
    for j in range(1, cfg.num_classes):
        for row in cls_boxes[j]:
            x1, y1, x2, y2 = [float(v) for v in row[:4]]
            bbox_out.append({
                "image_id": int(entry.image_id),
                "category_id": int(dataset.contiguous_to_json[j]),
                "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                "score": float(row[4]),
            })

    segm_out = []
    if cfg.use_mask:
        im_results = np.vstack([cls_boxes[j] for j in range(1, cfg.num_classes)])
        boxes_final = im_results[:, :4]
        if len(boxes_final):
            mask_rois = boxes_final * scale
            if cfg.use_fpn:
                mfeats = TM.fpn_mirror_roi_align(
                    backbone, mask_rois, cfg.mask.roi_size,
                    cfg.roi_sampling_ratio,
                )
                probs = TM.mask_probs_fpn(params, mfeats)
            else:
                mfeats = np_roi_align(
                    backbone.astype(np.float64), mask_rois, cfg.mask.roi_size,
                    cfg.mask.roi_size, cfg.spatial_scale,
                    cfg.roi_sampling_ratio,
                ).astype(np.float32)
                probs = TM.mask_probs_c4(params, mfeats, cfg.arch)
            cls_segms = TM.mirror_segm_results(
                cls_boxes, probs, boxes_final, int(oh), int(ow),
                cfg.num_classes, cfg.mask.resolution,
            )
            for j in range(1, cfg.num_classes):
                for rle, row in zip(cls_segms[j], cls_boxes[j]):
                    segm_out.append({
                        "image_id": int(entry.image_id),
                        "category_id": int(dataset.contiguous_to_json[j]),
                        "segmentation": rle,
                        "score": float(row[4]),
                    })

    kps_out = []
    if cfg.keypoint is not None:
        im_results = np.vstack([cls_boxes[j] for j in range(1, cfg.num_classes)])
        boxes_final = im_results[:, :4]
        if len(boxes_final):
            kp_rois = boxes_final * scale
            kfeats = TM.fpn_mirror_roi_align(
                backbone, kp_rois, cfg.keypoint.roi_size,
                cfg.roi_sampling_ratio,
            )
            heat = TM.keypoint_logits(params, kfeats, cfg.keypoint.num_convs)
            xy = _mirror_decode_keypoints(heat, boxes_final)  # (K, P, 2)
            k = 0
            for j in range(1, cfg.num_classes):
                for row in cls_boxes[j]:
                    xyv = np.concatenate(
                        [xy[k], np.ones((xy.shape[1], 1))], axis=1
                    )
                    kps_out.append({
                        "image_id": int(entry.image_id),
                        "category_id": int(dataset.contiguous_to_json[j]),
                        "keypoints": [float(v) for v in xyv.reshape(-1)],
                        "score": float(row[4]),
                    })
                    k += 1
    return bbox_out, segm_out, kps_out


def mirror_evaluate(cfg, tcfg, params, dataset, roidb):
    """Dataset loop + COCOeval, mirror side. Returns (bbox stats,
    segm stats, keypoints stats) — the latter two None unless the preset
    carries that branch."""
    bbox_all, segm_all, kps_all = [], [], []
    for entry in roidb:
        b, s, k = mirror_run_image(cfg, tcfg, params, entry, dataset)
        bbox_all.extend(b)
        segm_all.extend(s)
        kps_all.extend(k)

    def _eval(results, iou_type):
        if not results:
            return None
        coco_dt = dataset.coco.load_res(results)
        ev = COCOeval(dataset.coco, coco_dt, iou_type)
        ev.evaluate()
        ev.accumulate()
        return ev.summarize(verbose=False)

    return (
        _eval(bbox_all, "bbox"),
        _eval(segm_all, "segm") if cfg.use_mask else None,
        _eval(kps_all, "keypoints") if cfg.keypoint is not None else None,
    )
