"""Box, classification and mask heads.

Reference: ``lib/model/detector.py:54-112`` (two_layer_mlp_head,
four_layer_conv, mask_head) and ``:211-223`` (cls/bbox Linear heads).
Blob names: fc6/fc7, cls_score, bbox_pred, conv5_mask, mask_fcn_logits,
_[mask]_fcn{1..4} (reference detector.py:312-351).

Note on fc6: caffe2's fc6 weights expect a (C, H, W)-major flatten of the
7x7x256 RoI feature; we flatten NHWC (H, W, C) and the checkpoint importer
permutes the fc6 columns accordingly (see checkpoint/caffe2_import.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from detectorch_tpu.models.resnet import c5_head, conv


def linear(params, x, name: str, dtype=jnp.bfloat16):
    """caffe2 FC: weights stored (out, in); y = x @ W^T + b.

    Matmul inputs run in `dtype` with fp32 accumulation — fp32 matmuls are
    ~30x slower than bf16 on v5e (no native fp32 MXU path); pass
    dtype=jnp.float32 for bit-parity runs. Output is always fp32.
    """
    w = params[f"{name}_w"].astype(dtype)
    b = params[f"{name}_b"].astype(jnp.float32)
    y = jnp.matmul(x.astype(dtype), w.T, preferred_element_type=jnp.float32)
    return y + b


def mlp_box_head(params, roi_feats, dtype=jnp.bfloat16):
    """fc6+fc7 (reference two_layer_mlp_head, detector.py:54-65).

    roi_feats: (N, 7, 7, 256) -> (N, 1024) fp32.
    """
    x = roi_feats.reshape(roi_feats.shape[0], -1)
    x = jax.nn.relu(linear(params, x, "fc6", dtype))
    x = jax.nn.relu(linear(params, x, "fc7", dtype))
    return x


def res5_box_head(params, roi_feats, arch: str = "resnet50"):
    """layer4 + global average pool (reference conv_head ['layer4','avgpool']).

    roi_feats: (N, 14, 14, 1024) -> (N, 2048) fp32.
    """
    x = c5_head(params, roi_feats, arch=arch, stride=2)  # (N, 7, 7, 2048)
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def box_predictors(params, box_feats, output_prob: bool = True, dtype=jnp.bfloat16):
    """cls_score (softmax over 81) + bbox_pred (4*81 deltas)
    (reference detector.py:277-284)."""
    cls_score = linear(params, box_feats, "cls_score", dtype)
    if output_prob:
        cls_score = jax.nn.softmax(cls_score, axis=-1)
    bbox_pred = linear(params, box_feats, "bbox_pred", dtype)
    return cls_score, bbox_pred


def deconv2x2(params, x, name: str):
    """ConvTranspose2d(kernel 2, stride 2): non-overlapping upsample — each
    input pixel emits a 2x2 block. Weights stored (C_in, C_out, 2, 2)
    (caffe2/torch ConvTranspose layout, reference detector.py:89)."""
    w = params[f"{name}_w"].astype(x.dtype)  # (C, O, 2, 2)
    b = params[f"{name}_b"].astype(x.dtype)
    n, h, ww, c = x.shape
    y = jnp.einsum("nhwc,coab->nhawbo", x, w)
    y = y.reshape(n, h * 2, ww * 2, w.shape[1])
    return y + b


def four_layer_conv_trunk(params, x):
    """FPN mask trunk: 4x (3x3 conv 256 + relu) with _[mask]_fcn{i} blobs
    (reference four_layer_conv, detector.py:67-82)."""
    for i in range(1, 5):
        x = jax.nn.relu(
            conv(x, params[f"_[mask]_fcn{i}_w"], pad=1)
            + params[f"_[mask]_fcn{i}_b"].astype(x.dtype)
        )
    return x


def mask_head(params, roi_feats, head_type: str, arch: str = "resnet50",
              output_prob: bool = True):
    """Mask branch on post-NMS detection rois (reference mask_head.forward,
    detector.py:99-112).

    roi_feats: (N, 14, 14, C) RoIAligned features.
    Returns (N, M, M, 81) sigmoid probabilities (or logits).
    """
    if head_type == "upshare":
        x = c5_head(params, roi_feats, arch=arch, stride=2)  # (N,7,7,2048)
    elif head_type == "1up4convs":
        x = four_layer_conv_trunk(params, roi_feats)  # (N,14,14,256)
    else:
        raise ValueError(head_type)
    x = jax.nn.relu(deconv2x2(params, x, "conv5_mask"))
    logits = conv(x, params["mask_fcn_logits_w"]) + params["mask_fcn_logits_b"].astype(x.dtype)
    logits = logits.astype(jnp.float32)
    return jax.nn.sigmoid(logits) if output_prob else logits


def deconv4x4s2(params, x, name: str):
    """ConvTranspose2d(kernel 4, stride 2, padding 1): exact 2x upsample
    (out = 2*in). Implemented as a conv over the 2x-dilated input with the
    flipped kernel and padding k-1-p = 2 — the standard transposed-conv
    identity, which XLA fuses like any other conv. Weights stored
    (C_in, C_out, 4, 4) (caffe2 ConvTranspose layout, as conv5_mask)."""
    w = params[f"{name}_w"]
    b = params[f"{name}_b"].astype(x.dtype)
    w_hwio = jnp.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w_hwio, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def bilinear_upsample2x(x):
    """Fixed-weight bilinear 2x upsample: depthwise transposed conv k4/s2/p1
    with the bilinear filler (0.25, 0.75, 0.75, 0.25) — upstream Detectron's
    BilinearInterpolation op (used by the keypoint predictor). Not learned;
    never imported."""
    c = x.shape[-1]
    f = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    k = jnp.outer(f, f)  # symmetric: flip-invariant
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def keypoint_head(params, roi_feats, num_convs: int = 8):
    """Keypoint branch on post-NMS detection rois (upstream Detectron
    add_roi_pose_head_v1convX + kps predictor; the reference repo has no
    keypoint model — see config.KeypointConfig).

    roi_feats: (N, 14, 14, 256) RoIAligned FPN features.
    Returns (N, 56, 56, K) fp32 heatmap LOGITS: 8x (3x3 conv 512 + relu)
    trunk, 4x4/2 deconv to K channels at 28x28 (kps_score_lowres), fixed
    bilinear 2x upsample to 56x56.
    """
    x = roi_feats
    for i in range(1, num_convs + 1):
        x = jax.nn.relu(
            conv(x, params[f"conv_fcn{i}_w"], pad=1)
            + params[f"conv_fcn{i}_b"].astype(x.dtype)
        )
    x = deconv4x4s2(params, x, "kps_score_lowres")  # (N, 28, 28, K)
    return bilinear_upsample2x(x.astype(jnp.float32))  # (N, 56, 56, K)


# ---------------------------------------------------------------------------
# Random init
# ---------------------------------------------------------------------------


def init_box_head_params(box_head: str = "mlp", feat_ch: int = 1024,
                         num_classes: int = 81, seed: int = 3):
    rng = np.random.RandomState(seed)
    p = {}
    if box_head == "mlp":
        p["fc6_w"] = (rng.randn(1024, 7 * 7 * 256) * 0.01).astype(np.float32)
        p["fc6_b"] = np.zeros(1024, np.float32)
        p["fc7_w"] = (rng.randn(1024, 1024) * 0.01).astype(np.float32)
        p["fc7_b"] = np.zeros(1024, np.float32)
    p["cls_score_w"] = (rng.randn(num_classes, feat_ch) * 0.01).astype(np.float32)
    p["cls_score_b"] = np.zeros(num_classes, np.float32)
    p["bbox_pred_w"] = (rng.randn(4 * num_classes, feat_ch) * 0.001).astype(np.float32)
    p["bbox_pred_b"] = np.zeros(4 * num_classes, np.float32)
    return p


def init_keypoint_head_params(num_keypoints: int = 17, num_convs: int = 8,
                              conv_dim: int = 512, in_ch: int = 256,
                              seed: int = 6):
    """He/MSRA init, matching upstream Detectron's MSRAFill on the KRCNN
    trunk and deconv. Gaussian(0.01) here is a silent training killer: the
    post-ReLU variance gain per 3x3x512 conv is 9*512*1e-4/2 ~ 0.23, so
    after 8 layers the heatmap logits are ~1e-4-scale — the spatial softmax
    sits at the uniform ln(56^2) plateau, and (unlike a sigmoid head) the
    final deconv BIAS is constant across bins and cannot move a softmax, so
    the loss is stuck with vanishing gradients (round-4 red test)."""
    rng = np.random.RandomState(seed)
    p = {}
    c = in_ch
    for i in range(1, num_convs + 1):
        std = np.sqrt(2.0 / (3 * 3 * c))
        p[f"conv_fcn{i}_w"] = (
            rng.randn(3, 3, c, conv_dim) * std
        ).astype(np.float32)
        p[f"conv_fcn{i}_b"] = np.zeros(conv_dim, np.float32)
        c = conv_dim
    # stride-2 4x4 deconv: each output pixel sums ceil(4/2)^2 = 4 taps over
    # conv_dim channels -> fan_in 4*conv_dim
    std = np.sqrt(2.0 / (4 * conv_dim))
    p["kps_score_lowres_w"] = (
        rng.randn(conv_dim, num_keypoints, 4, 4) * std
    ).astype(np.float32)
    p["kps_score_lowres_b"] = np.zeros(num_keypoints, np.float32)
    return p


def init_mask_head_params(head_type: str = "1up4convs", num_classes: int = 81, seed: int = 4):
    """He/MSRA init on the trunk convs + deconv, Gaussian(0.001) on the
    logits — upstream Detectron's mask_rcnn_heads fills (MSRAFill /
    GaussianFill). Same rationale as init_keypoint_head_params: scale-
    preserving init keeps gradients alive through the trunk."""
    rng = np.random.RandomState(seed)
    p = {}
    trunk_out = 256 if head_type == "1up4convs" else 2048
    if head_type == "1up4convs":
        std = np.sqrt(2.0 / (3 * 3 * 256))
        for i in range(1, 5):
            p[f"_[mask]_fcn{i}_w"] = (rng.randn(3, 3, 256, 256) * std).astype(np.float32)
            p[f"_[mask]_fcn{i}_b"] = np.zeros(256, np.float32)
    # stride-2 2x2 deconv: each output pixel sums 1 tap over trunk_out chans
    std = np.sqrt(2.0 / trunk_out)
    p["conv5_mask_w"] = (rng.randn(trunk_out, 256, 2, 2) * std).astype(np.float32)
    p["conv5_mask_b"] = np.zeros(256, np.float32)
    p["mask_fcn_logits_w"] = (rng.randn(1, 1, 256, num_classes) * 0.001).astype(np.float32)
    p["mask_fcn_logits_b"] = np.zeros(num_classes, np.float32)
    return p
