import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig
from detectorch_tpu.checkpoint import caffe2_import as C2
from detectorch_tpu.models.detector import init_params, make_inference_fn


@pytest.mark.parametrize(
    "name", ["e2e_mask_rcnn_R-50-FPN_2x", "e2e_mask_rcnn_R-50-C4_2x",
             "e2e_mask_rcnn_R-101-FPN_2x", "e2e_keypoint_rcnn_R-50-FPN_1x"]
)
def test_roundtrip_import(name, tmp_path):
    """export -> caffe2 pkl -> import reproduces params bit-for-bit."""
    cfg = PRESETS[name]
    params = init_params(cfg, seed=7)
    path = str(tmp_path / "model.pkl")
    C2.save_caffe2_pkl(params, cfg, path)
    blobs = C2.load_caffe2_pkl(path)
    # caffe2-side conv blobs must be OIHW
    assert blobs["conv1_w"].shape == (64, 3, 7, 7)
    assert blobs["res2_0_branch2a_w"].shape == (64, 64, 1, 1)
    imported = C2.import_params(blobs, cfg)
    assert set(imported) == set(params)
    for k in params:
        np.testing.assert_array_equal(imported[k], np.asarray(params[k]), err_msg=k)


def test_conv1_bgr_flip(tmp_path):
    cfg = PRESETS["fast_rcnn_R-50-C4_2x"]
    params = init_params(cfg, seed=1)
    blobs = C2.export_to_caffe2_layout(params, cfg)
    # caffe2 blob channel 0 (B) == our RGB channel 2
    np.testing.assert_array_equal(
        blobs["conv1_w"][:, 0], np.asarray(params["conv1_w"])[:, :, 2, :].transpose(2, 0, 1)
    )


def test_import_missing_blob_strict(tmp_path):
    cfg = PRESETS["fast_rcnn_R-50-C4_2x"]
    params = init_params(cfg, seed=1)
    blobs = C2.export_to_caffe2_layout(params, cfg)
    del blobs["cls_score_w"]
    with pytest.raises(KeyError):
        C2.import_params(blobs, cfg)


def test_momentum_blobs_skipped(tmp_path):
    cfg = PRESETS["fast_rcnn_R-50-C4_2x"]
    params = init_params(cfg, seed=1)
    path = str(tmp_path / "m.pkl")
    blobs = C2.export_to_caffe2_layout(params, cfg)
    blobs["cls_score_w_momentum"] = np.zeros_like(blobs["cls_score_w"])
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f, protocol=2)
    loaded = C2.load_caffe2_pkl(path)
    assert "cls_score_w_momentum" not in loaded


def test_fold_bn_preserves_forward(rng):
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(
        rpn=RPNConfig(pre_nms_top_n=100, post_nms_top_n=20),
        compute_dtype="float32",
    )
    params = init_params(cfg, seed=3)
    # non-trivial bn scales
    for k in list(params):
        if k.endswith("_bn_s"):
            params[k] = rng.uniform(0.5, 1.5, params[k].shape).astype(np.float32)
        if k.endswith("_bn_b"):
            params[k] = (rng.randn(*params[k].shape) * 0.05).astype(np.float32)
    folded = C2.fold_bn(params)
    assert all(np.all(folded[k] == 1.0) for k in folded if k.endswith("_bn_s"))

    tcfg = TestConfig(detections_per_img=5)
    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    image = (rng.randn(64, 96, 3) * 10).astype(np.float32)
    args = (image, jnp.float32(1.0), jnp.float32(64.0), jnp.float32(96.0))
    a = fwd(params, *args)
    b = fwd(folded, *args)
    np.testing.assert_allclose(
        np.asarray(a.cls_scores), np.asarray(b.cls_scores), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.detections.boxes), np.asarray(b.detections.boxes),
        rtol=1e-3, atol=0.1,
    )


def test_base_cnn_import():
    cfg = PRESETS["fast_rcnn_R-50-C4_2x"]
    params = init_params(cfg, seed=2)
    blobs = C2.export_to_caffe2_layout(params, cfg)
    backbone_only = {
        k: v for k, v in blobs.items()
        if k.startswith(("conv1", "res"))
    }
    imported = C2.import_base_cnn(backbone_only, "resnet50")
    np.testing.assert_array_equal(imported["conv1_w"], np.asarray(params["conv1_w"]))
    np.testing.assert_array_equal(
        imported["res4_2_branch2b_w"], np.asarray(params["res4_2_branch2b_w"])
    )
