"""Full-stack parity: the single-jit Faster R-CNN C4 program vs a
torch+numpy mirror of the reference pipeline, end to end in fp32."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig
from detectorch_tpu.models.detector import init_params, make_inference_fn
from detectorch_tpu.ops.anchors import shifted_anchors
from tests import torch_mirror as TM
from tests.oracles import np_bbox_transform, np_roi_align
from tests.test_rpn import np_generate_proposals


@pytest.fixture(scope="module")
def setup(request):
    rng = np.random.RandomState(42)
    cfg = PRESETS["e2e_faster_rcnn_R-50-C4_2x"].replace(
        compute_dtype="float32",
        rpn=RPNConfig(pre_nms_top_n=400, post_nms_top_n=80),
    )
    tcfg = TestConfig(detections_per_img=20)
    params = init_params(cfg, seed=9)
    # nontrivial BN affines so frozen-BN plumbing is exercised
    for k in list(params):
        if k.endswith("_bn_s") and not k.endswith("branch2c_bn_s"):
            params[k] = rng.uniform(0.8, 1.2, params[k].shape).astype(np.float32)
        if k.endswith("_bn_b"):
            params[k] = (rng.randn(*params[k].shape) * 0.02).astype(np.float32)
    h, w = 128, 160
    image = (rng.randn(h, w, 3) * 8).astype(np.float32)
    im_scale = 1.25
    orig_h, orig_w = h / im_scale, w / im_scale
    return cfg, tcfg, params, image, im_scale, orig_h, orig_w


def test_full_stack_c4_faster_rcnn(setup):
    cfg, tcfg, params, image, im_scale, orig_h, orig_w = setup
    h, w = image.shape[:2]

    # ---- ours: one jit program ------------------------------------------
    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    out = fwd(params, image, jnp.float32(im_scale),
              jnp.float32(orig_h), jnp.float32(orig_w))

    # ---- mirror: torch convs + numpy reference algorithms ---------------
    feats = TM.c4_body(params, image)  # NCHW torch
    cls_prob, bbox_pred = TM.rpn_head(params, feats, "")
    # (H, W, A) ordering
    cls_np = cls_prob[0].permute(1, 2, 0).detach().numpy()
    bbox_np = bbox_pred[0].permute(1, 2, 0).detach().numpy()
    fh, fw = cls_np.shape[:2]
    anchors = shifted_anchors(fh, fw, 16.0, tuple(cfg.anchors.sizes),
                              tuple(cfg.anchors.aspect_ratios))
    exp_props, exp_scores = np_generate_proposals(
        cls_np, bbox_np, anchors, float(h), float(w), im_scale,
        cfg.rpn.pre_nms_top_n, cfg.rpn.post_nms_top_n, cfg.rpn.nms_thresh, 0.0,
    )

    got_valid = np.asarray(out.roi_valid)
    got_rois = np.asarray(out.rois)[got_valid]
    assert len(got_rois) == len(exp_props)
    np.testing.assert_allclose(got_rois, exp_props, rtol=1e-3, atol=0.05)

    # roi features + heads on the mirror's proposals
    feats_np = feats[0].detach().numpy()  # (C, H, W)
    roi_feats = np_roi_align(
        feats_np.astype(np.float64), exp_props, 14, 14, 1.0 / 16, 0
    ).astype(np.float32)  # (N, C, 14, 14)
    box_feats = TM.res5_head(params, roi_feats)
    exp_cls, exp_bbox = TM.box_outputs(params, box_feats)

    got_cls = np.asarray(out.cls_scores)[got_valid]
    np.testing.assert_allclose(got_cls, exp_cls, rtol=5e-2, atol=2e-3)

    # full postprocess comparison
    pred_boxes = np_bbox_transform(
        exp_props / im_scale, exp_bbox, (10.0, 10.0, 5.0, 5.0)
    )
    pred_boxes[:, 0::4] = np.clip(pred_boxes[:, 0::4], 0, orig_w - 1)
    pred_boxes[:, 1::4] = np.clip(pred_boxes[:, 1::4], 0, orig_h - 1)
    pred_boxes[:, 2::4] = np.clip(pred_boxes[:, 2::4], 0, orig_w - 1)
    pred_boxes[:, 3::4] = np.clip(pred_boxes[:, 3::4], 0, orig_h - 1)
    exp_dets = TM.postprocess(
        exp_cls, pred_boxes, cfg.num_classes, tcfg.score_thresh,
        tcfg.nms_thresh, tcfg.detections_per_img,
    )

    d = out.detections
    ok = np.asarray(d.valid)
    got = [
        (int(c), float(s), np.asarray(b))
        for c, s, b in zip(
            np.asarray(d.classes)[ok], np.asarray(d.scores)[ok],
            np.asarray(d.boxes)[ok],
        )
    ]
    assert len(got) == len(exp_dets), (len(got), len(exp_dets))
    for (gc, gs, gb), (ec, es, eb) in zip(got, exp_dets):
        assert gc == ec
        np.testing.assert_allclose(gs, es, rtol=2e-2, atol=1e-3)
        np.testing.assert_allclose(gb, eb, rtol=2e-2, atol=0.2)


def test_full_stack_c4_mask_branch(setup):
    """Mask head wiring on final detections: RoIAlign at 14x14 on C4
    features -> shared res5 trunk -> deconv -> per-class sigmoid -> class
    gather, vs the torch+numpy mirror."""
    import torch.nn.functional as F

    from detectorch_tpu.config import MaskConfig
    from detectorch_tpu.models.heads import init_mask_head_params

    cfg, tcfg, params, image, im_scale, orig_h, orig_w = setup
    cfg = cfg.replace(
        use_mask=True,
        mask=MaskConfig(head_type="upshare", resolution=14, roi_size=14),
    )
    params = dict(params)
    params.update(init_mask_head_params("upshare", seed=21))

    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    out = fwd(params, image, jnp.float32(im_scale),
              jnp.float32(orig_h), jnp.float32(orig_w))
    d = out.detections
    ok = np.asarray(d.valid)
    if not ok.any():
        pytest.skip("no detections with this random seed")
    det_boxes = np.asarray(d.boxes)[ok]
    det_classes = np.asarray(d.classes)[ok]
    got_masks = np.asarray(out.masks)[ok]

    # mirror: same detections -> scaled rois -> np RoIAlign -> torch trunk
    feats = TM.c4_body(params, image)
    feats_np = feats[0].detach().numpy().astype(np.float64)
    mask_rois = det_boxes * im_scale
    roi_feats = np_roi_align(feats_np, mask_rois, 14, 14, 1.0 / 16, 0).astype(np.float32)
    trunk = TM.stage(params, torch.from_numpy(roi_feats).float(), "res5", 3, 2)
    w = TM.t(params["conv5_mask_w"])  # (2048, 256, 2, 2)
    x = F.relu(F.conv_transpose2d(trunk, w, TM.t(params["conv5_mask_b"]), stride=2))
    wl = TM.t(params["mask_fcn_logits_w"]).permute(3, 2, 0, 1)
    logits = F.conv2d(x, wl, TM.t(params["mask_fcn_logits_b"]))
    probs = torch.sigmoid(logits).detach().numpy()  # (K, 81, M, M)
    exp_masks = np.stack([probs[i, det_classes[i]] for i in range(len(det_classes))])
    np.testing.assert_allclose(got_masks, exp_masks, rtol=5e-2, atol=5e-3)


def test_full_stack_fpn_faster_rcnn():
    """FPN path: per-level RPN with shared head, collect, multilevel
    RoIAlign routing, MLP head — vs the torch+numpy mirror."""
    rng = np.random.RandomState(7)
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(
        compute_dtype="float32",
        rpn=RPNConfig(pre_nms_top_n=200, post_nms_top_n=60),
    )
    tcfg = TestConfig(detections_per_img=15)
    params = init_params(cfg, seed=11)
    for k in list(params):
        if k.endswith("_bn_s") and not k.endswith("branch2c_bn_s"):
            params[k] = rng.uniform(0.8, 1.2, params[k].shape).astype(np.float32)
    h, w = 128, 160
    image = (rng.randn(h, w, 3) * 8).astype(np.float32)
    im_scale = 1.0

    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    out = fwd(params, image, jnp.float32(im_scale), jnp.float32(h), jnp.float32(w))

    exp_rois, pyr_np = TM.fpn_mirror_proposals(cfg, params, image, h, w, im_scale)

    got_valid = np.asarray(out.roi_valid)
    got_rois = np.asarray(out.rois)[got_valid]
    assert len(got_rois) == len(exp_rois)
    np.testing.assert_allclose(got_rois, exp_rois, rtol=1e-3, atol=0.05)

    # box branch: per-roi level routing + RoIAlign + MLP + predictors
    roi_feats = TM.fpn_mirror_roi_align(pyr_np, exp_rois, 7)
    box_feats = TM.mlp_head(params, roi_feats)
    exp_cls, _ = TM.box_outputs(params, box_feats)

    got_cls = np.asarray(out.cls_scores)[got_valid]
    np.testing.assert_allclose(got_cls, exp_cls, rtol=5e-2, atol=2e-3)


@pytest.mark.parametrize("preset", [
    "e2e_mask_rcnn_R-50-FPN_2x", "e2e_mask_rcnn_R-101-FPN_2x",
])
def test_full_stack_fpn_mask_branch(preset):
    """Value-level FPN mask-branch parity (the flagship path): Pallas
    RoIAlign at 14x14 on final detections -> four_layer_conv trunk ->
    deconv -> per-class sigmoid, vs the torch+numpy mirror — masks
    compared, not just shapes. Covers R-50 AND R-101
    (reference detector.py:84-112,216-223; README.md:31-32)."""
    rng = np.random.RandomState(7)
    cfg = PRESETS[preset].replace(
        compute_dtype="float32",
        rpn=RPNConfig(pre_nms_top_n=200, post_nms_top_n=60),
    )
    tcfg = TestConfig(detections_per_img=15)
    params = init_params(cfg, seed=11)
    for k in list(params):
        if k.endswith("_bn_s") and not k.endswith("branch2c_bn_s"):
            params[k] = rng.uniform(0.8, 1.2, params[k].shape).astype(np.float32)
    h, w = 128, 160
    image = (rng.randn(h, w, 3) * 8).astype(np.float32)
    im_scale = 1.0

    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    out = fwd(params, image, jnp.float32(im_scale), jnp.float32(h), jnp.float32(w))

    exp_rois, pyr_np = TM.fpn_mirror_proposals(cfg, params, image, h, w, im_scale)
    got_valid = np.asarray(out.roi_valid)
    got_rois = np.asarray(out.rois)[got_valid]
    assert len(got_rois) == len(exp_rois)
    np.testing.assert_allclose(got_rois, exp_rois, rtol=1e-3, atol=0.05)

    roi_feats = TM.fpn_mirror_roi_align(pyr_np, exp_rois, 7)
    box_feats = TM.mlp_head(params, roi_feats)
    exp_cls, _ = TM.box_outputs(params, box_feats)
    got_cls = np.asarray(out.cls_scores)[got_valid]
    np.testing.assert_allclose(got_cls, exp_cls, rtol=5e-2, atol=2e-3)

    # ---- mask branch on OUR final detections (isolates the mask path
    # from tiny box-score ordering differences) -------------------------
    d = out.detections
    ok = np.asarray(d.valid)
    if not ok.any():
        pytest.skip("no detections with this random seed")
    det_boxes = np.asarray(d.boxes)[ok]
    det_classes = np.asarray(d.classes)[ok]
    got_masks = np.asarray(out.masks)[ok]

    mask_rois = det_boxes * im_scale
    mask_feats = TM.fpn_mirror_roi_align(pyr_np, mask_rois, cfg.mask.roi_size)
    probs = TM.mask_probs_fpn(params, mask_feats)  # (K, 81, M, M)
    exp_masks = np.stack(
        [probs[i, det_classes[i]] for i in range(len(det_classes))]
    )
    assert exp_masks.shape[-1] == cfg.mask.resolution
    np.testing.assert_allclose(got_masks, exp_masks, rtol=5e-2, atol=5e-3)


def test_full_stack_c4_faster_rcnn_r101():
    """C4 path on ResNet-101 (reference README.md:32 is an R-101 gate row):
    proposals + class scores vs the torch+numpy mirror."""
    rng = np.random.RandomState(3)
    cfg = PRESETS["e2e_faster_rcnn_R-50-C4_2x"].replace(
        compute_dtype="float32", arch="resnet101",
        rpn=RPNConfig(pre_nms_top_n=300, post_nms_top_n=40),
    )
    tcfg = TestConfig(detections_per_img=10)
    params = init_params(cfg, seed=13)
    for k in list(params):
        if k.endswith("_bn_s") and not k.endswith("branch2c_bn_s"):
            params[k] = rng.uniform(0.8, 1.2, params[k].shape).astype(np.float32)
    h, w = 96, 128
    image = (rng.randn(h, w, 3) * 8).astype(np.float32)
    im_scale = 1.0

    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    out = fwd(params, image, jnp.float32(im_scale), jnp.float32(h), jnp.float32(w))

    feats = TM.c4_body(params, image, "resnet101")
    cls_prob, bbox_pred = TM.rpn_head(params, feats, "")
    cls_np = cls_prob[0].permute(1, 2, 0).detach().numpy()
    bbox_np = bbox_pred[0].permute(1, 2, 0).detach().numpy()
    anchors = shifted_anchors(
        cls_np.shape[0], cls_np.shape[1], 16.0,
        tuple(cfg.anchors.sizes), tuple(cfg.anchors.aspect_ratios),
    )
    exp_props, _ = np_generate_proposals(
        cls_np, bbox_np, anchors, float(h), float(w), im_scale,
        cfg.rpn.pre_nms_top_n, cfg.rpn.post_nms_top_n, cfg.rpn.nms_thresh, 0.0,
    )
    got_valid = np.asarray(out.roi_valid)
    got_rois = np.asarray(out.rois)[got_valid]
    assert len(got_rois) == len(exp_props)
    np.testing.assert_allclose(got_rois, exp_props, rtol=1e-3, atol=0.05)

    feats_np = feats[0].detach().numpy()
    roi_feats = np_roi_align(
        feats_np.astype(np.float64), exp_props, 14, 14, 1.0 / 16, 0
    ).astype(np.float32)
    box_feats = TM.res5_head(params, roi_feats, "resnet101")
    exp_cls, _ = TM.box_outputs(params, box_feats)
    got_cls = np.asarray(out.cls_scores)[got_valid]
    np.testing.assert_allclose(got_cls, exp_cls, rtol=5e-2, atol=2e-3)
