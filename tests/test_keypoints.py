"""Keypoint R-CNN: head ops vs torch oracles, heatmap decode semantics,
full-preset forward, and the engine -> COCO keypoints eval path.

The reference repo ships only the evaluator/dataset halves of keypoint
support (``lib/utils/json_dataset_evaluator.py:349-432``,
``lib/data/json_dataset.py:268-314``) and no model; the model layout under
test follows upstream Detectron's keypoint_rcnn_heads (see
config.KeypointConfig)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectorch_tpu.models import heads as heads_mod
from detectorch_tpu.ops.keypoints import heatmaps_to_keypoints


def test_deconv4x4s2_matches_torch():
    """deconv4x4s2 == torch ConvTranspose2d(k=4, s=2, p=1) bit-for-near."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    cin, cout, h, w = 5, 3, 7, 9
    x = rng.randn(2, h, w, cin).astype(np.float32)
    wgt = rng.randn(cin, cout, 4, 4).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)

    ours = heads_mod.deconv4x4s2(
        {"p_w": jnp.asarray(wgt), "p_b": jnp.asarray(b)}, jnp.asarray(x), "p"
    )
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(wgt), torch.from_numpy(b), stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    assert ours.shape == (2, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_bilinear_upsample2x_matches_torch():
    """Fixed bilinear filler == torch depthwise ConvTranspose2d with the
    same (0.25, 0.75, 0.75, 0.25) kernel (Caffe2 BilinearInterpolation)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    c, h, w = 4, 6, 5
    x = rng.randn(1, h, w, c).astype(np.float32)
    ours = heads_mod.bilinear_upsample2x(jnp.asarray(x))

    f = np.array([0.25, 0.75, 0.75, 0.25], np.float32)
    k = np.outer(f, f)
    wgt = np.tile(k[None, None], (c, 1, 1, 1))  # (C, 1, 4, 4)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(wgt), stride=2, padding=1, groups=c,
    ).permute(0, 2, 3, 1).numpy()
    assert ours.shape == (1, 2 * h, 2 * w, c)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_keypoint_head_shapes():
    p = heads_mod.init_keypoint_head_params(
        num_keypoints=17, num_convs=2, conv_dim=32, in_ch=8
    )
    x = jnp.asarray(np.random.RandomState(2).randn(3, 14, 14, 8), jnp.float32)
    hm = heads_mod.keypoint_head(p, x, num_convs=2)
    assert hm.shape == (3, 56, 56, 17)
    assert hm.dtype == jnp.float32
    assert bool(jnp.isfinite(hm).all())


def test_heatmaps_to_keypoints_decode():
    """Planted argmax peaks decode to the half-bin box mapping with the
    peak logit and its spatial-softmax probability."""
    rng = np.random.RandomState(3)
    k, hw, p = 3, 56, 17
    hm = rng.randn(k, hw, hw, p).astype(np.float32)
    peaks = rng.randint(0, hw, size=(k, p, 2))  # (y, x) per (det, kp)
    for i in range(k):
        for j in range(p):
            hm[i, peaks[i, j, 0], peaks[i, j, 1], j] = 30.0 + i + j * 0.1
    boxes = np.array(
        [[10.0, 20.0, 110.0, 80.0],
         [0.0, 0.0, 55.0, 223.0],
         [5.0, 5.0, 5.5, 5.5]],  # degenerate: width/height clamp to 1
        np.float32,
    )
    out = np.asarray(heatmaps_to_keypoints(jnp.asarray(hm), jnp.asarray(boxes)))
    assert out.shape == (k, p, 4)
    for i in range(k):
        x1, y1, x2, y2 = boxes[i]
        bw, bh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        for j in range(p):
            yi, xi = peaks[i, j]
            np.testing.assert_allclose(
                out[i, j, 0], x1 + (xi + 0.5) * bw / hw, rtol=1e-5
            )
            np.testing.assert_allclose(
                out[i, j, 1], y1 + (yi + 0.5) * bh / hw, rtol=1e-5
            )
            np.testing.assert_allclose(out[i, j, 2], hm[i, yi, xi, j], rtol=1e-6)
            sm = np.exp(hm[i, :, :, j].astype(np.float64) - hm[i, yi, xi, j])
            np.testing.assert_allclose(
                out[i, j, 3], 1.0 / sm.sum(), rtol=1e-4
            )


def _tiny_keypoint_cfg():
    from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig

    cfg = PRESETS["e2e_keypoint_rcnn_R-50-FPN_1x"].replace(
        compute_dtype="float32",
        use_pallas_roi_align=False,
        rpn=RPNConfig(pre_nms_top_n=100, post_nms_top_n=64),
    )
    tcfg = TestConfig(
        target_size=224, max_size=320, max_proposals=64,
        detections_per_img=20, score_thresh=0.0,
    )
    return cfg, tcfg


@pytest.mark.slow
def test_keypoint_preset_forward():
    from detectorch_tpu.models.detector import init_params, make_inference_fn

    cfg, tcfg = _tiny_keypoint_cfg()
    params = init_params(cfg)
    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    img = np.random.RandomState(0).rand(224, 320, 3).astype(np.float32)
    out = fwd(params, img, np.float32(1.0), np.float32(224), np.float32(320))
    kp = np.asarray(out.keypoints)
    n_det = out.detections.boxes.shape[0]
    assert kp.shape == (n_det, 17, 4)
    assert np.isfinite(kp).all()
    # decoded x/y of valid detections land inside their boxes
    valid = np.asarray(out.detections.valid)
    boxes = np.asarray(out.detections.boxes)[valid]
    for b, k in zip(boxes, kp[valid]):
        bw = max(b[2] - b[0], 1.0)
        bh = max(b[3] - b[1], 1.0)
        assert (k[:, 0] >= b[0]).all() and (k[:, 0] <= b[0] + bw).all()
        assert (k[:, 1] >= b[1]).all() and (k[:, 1] <= b[1] + bh).all()


@pytest.mark.slow
def test_keypoint_engine_and_coco_eval(tmp_path):
    """Synthetic person-keypoints dataset -> engine -> COCO keypoints AP:
    the full reference evaluator flow (json_dataset_evaluator.py:349-432)
    with random weights (stats are meaningless; the pipeline must run and
    produce the 10-stat OKS vector and well-formed result dicts)."""
    from detectorch_tpu.data.coco import CocoDataset
    from detectorch_tpu.data.synth import build_synth_coco
    from detectorch_tpu.eval.engine import evaluate_dataset
    from detectorch_tpu.models.detector import init_params

    ann_file, img_dir = build_synth_coco(
        str(tmp_path), n_images=2, height=224, width=288, seed=11,
        with_keypoints=True,
    )
    ds = CocoDataset(ann_file, img_dir)
    assert ds.num_keypoints == 17 and ds.keypoints[0] == "nose"

    cfg, tcfg = _tiny_keypoint_cfg()
    params = init_params(cfg)
    bbox_stats, segm_stats, results = evaluate_dataset(
        cfg, tcfg, params, ds, verbose=False
    )
    assert segm_stats is None
    kps = results["keypoints"]
    assert len(kps) > 0
    for r in kps:
        assert len(r["keypoints"]) == 51
        assert r["category_id"] == 1  # person
        assert all(v == 1 for v in r["keypoints"][2::3])
    stats = results["keypoints_stats"]
    assert stats is not None and len(stats) == 10
    assert np.isfinite(np.asarray(stats)).all()
