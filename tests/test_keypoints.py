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


def test_heatmap_labels_semantics():
    """Detectron keypoints_to_heatmap_labels: floor mapping, right-edge
    clamp, invisible/out-of-roi invalid."""
    from detectorch_tpu.train.sampler import keypoints_to_heatmap_labels

    rois = np.array([[10.0, 20.0, 66.0, 76.0]])  # 56x56 roi: 1 px per bin
    kps = np.array([[
        [10.0, 20.0, 2],   # top-left corner -> bin (0, 0)
        [66.0, 76.0, 2],   # EXACT right/bottom edge -> clamped to (55, 55)
        [38.2, 47.9, 2],   # interior: floor(28.2), floor(27.9)
        [38.2, 47.9, 0],   # same point, unlabeled -> invalid
        [5.0, 47.9, 1],    # left of roi -> invalid
        [66.5, 47.9, 2],   # STRICTLY beyond the right edge -> invalid
                           # (upstream clamps only kp_x == roi_x2)
    ]])
    labels, valid = keypoints_to_heatmap_labels(kps, rois, 56)
    assert labels.shape == (1, 6) and valid.shape == (1, 6)
    assert valid[0].tolist() == [True, True, True, False, False, False]
    assert labels[0, 0] == 0
    assert labels[0, 1] == 55 * 56 + 55
    assert labels[0, 2] == 27 * 56 + 28


def test_keypoint_flip():
    """flip_keypoints: left/right swap + visible-x mirror; unlabeled rows
    untouched; double flip is the identity."""
    from detectorch_tpu.data.coco import flip_keypoints

    width = 100
    # 4-keypoint toy: [nose, left_eye, right_eye, unlabeled left_ear]
    perm = np.array([0, 2, 1, 3])
    kps = np.array([[
        [50.0, 10.0, 2],
        [40.0, 12.0, 2],
        [60.0, 12.0, 1],
        [0.0, 0.0, 0],
    ]])
    f = flip_keypoints(kps, perm, width)
    np.testing.assert_allclose(f[0, 0], [49.0, 10.0, 2])   # nose mirrors
    np.testing.assert_allclose(f[0, 1], [39.0, 12.0, 1])   # was right_eye
    np.testing.assert_allclose(f[0, 2], [59.0, 12.0, 2])   # was left_eye
    np.testing.assert_allclose(f[0, 3], [0.0, 0.0, 0])     # unlabeled: zero
    np.testing.assert_allclose(flip_keypoints(f, perm, width), kps)


def test_sample_rois_keypoint_targets():
    """sample_rois emits kp_labels/kp_valid for fg rows when the entry has
    gt keypoints; the gt roi's own keypoints land in their exact bins."""
    from detectorch_tpu.config import SamplerConfig
    from detectorch_tpu.data.coco import RoidbEntry
    from detectorch_tpu.train.sampler import (
        keypoints_to_heatmap_labels,
        sample_rois,
    )

    boxes = np.array([[10.0, 10.0, 90.0, 120.0]], np.float32)
    kps = np.zeros((1, 17, 3), np.float32)
    rng = np.random.RandomState(0)
    kps[0, :, 0] = rng.uniform(15, 85, 17)
    kps[0, :, 1] = rng.uniform(15, 115, 17)
    kps[0, :, 2] = 2
    entry = RoidbEntry(
        image_id=1, file_path="x", height=130, width=100,
        boxes=boxes, gt_classes=np.array([1], np.int32),
        is_crowd=np.zeros(1, np.uint8),
        max_overlaps=np.ones(1, np.float32),
        max_classes=np.array([1], np.int32),
        box_to_gt_ind_map=np.zeros(1, np.int32),
        gt_keypoints=kps,
    )
    cfg = SamplerConfig(rois_per_image=8, fg_fraction=0.5)
    out = sample_rois(entry, 1.0, np.random.RandomState(1), cfg,
                      num_classes=2, compact_targets=True)
    assert out["kp_labels"].shape == (8, 17)
    assert out["kp_valid"].shape == (8, 17)
    assert out["kp_valid"][0].all()       # the gt roi itself is fg
    want, _ = keypoints_to_heatmap_labels(kps, boxes, 56)
    np.testing.assert_array_equal(out["kp_labels"][0], want[0])
    assert not out["kp_valid"][out["labels"] == 0].any()  # bg rows empty


def test_keypoint_loss_overfits():
    """keypoint_loss is differentiable through the head: plain SGD drives
    a tiny trunk to place probability mass on the target bins."""
    from detectorch_tpu.train.losses import keypoint_loss

    rng = np.random.RandomState(4)
    n, p_kp = 4, 5
    params = heads_mod.init_keypoint_head_params(
        num_keypoints=p_kp, num_convs=1, conv_dim=16, in_ch=4
    )
    params = {k: jnp.asarray(v) for k, v in params.items()}
    feats = jnp.asarray(rng.randn(n, 14, 14, 4), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 56 * 56, (n, p_kp)), jnp.int32)
    valid = jnp.ones((n, p_kp), bool)

    def loss_fn(prm):
        hm = heads_mod.keypoint_head(prm, feats, num_convs=1)
        return keypoint_loss(hm, labels, valid)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(80):
        l, g = grad_fn(params)
        losses.append(float(l))
        params = jax.tree.map(lambda p, gr: p - 1.0 * gr, params, g)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_synth_keypoint_roidb_and_flip(tmp_path):
    """Synthetic person-keypoints dataset -> gt roidb carries (G, 17, 3)
    keypoints; flipped entries mirror them through the dataset's perm."""
    from detectorch_tpu.data.coco import CocoDataset, extend_with_flipped_entries
    from detectorch_tpu.data.synth import build_synth_coco

    ann_file, img_dir = build_synth_coco(
        str(tmp_path), n_images=3, height=160, width=200, seed=21,
        with_keypoints=True,
    )
    ds = CocoDataset(ann_file, img_dir)
    roidb = ds.get_roidb(gt=True)
    perm = ds.keypoint_flip_perm
    assert perm is not None and perm.shape == (17,)
    assert perm[1] == 2 and perm[2] == 1  # left_eye <-> right_eye
    some = False
    for e in roidb:
        assert e.gt_keypoints is not None
        assert e.gt_keypoints.shape == (len(e.boxes), 17, 3)
        if (e.gt_keypoints[:, :, 2] > 0).any():
            some = True
    assert some  # persons with visible keypoints exist
    both = extend_with_flipped_entries(roidb, perm)
    for orig, flip in zip(both[: len(roidb)], both[len(roidb):]):
        vis = orig.gt_keypoints[:, :, 2] > 0
        if vis.any():
            g, p = np.nonzero(vis)
            i, j = g[0], p[0]
            np.testing.assert_allclose(
                flip.gt_keypoints[i, perm[j], 0],
                orig.width - orig.gt_keypoints[i, j, 0] - 1,
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


@pytest.mark.slow
def test_keypoint_train_step(tmp_path):
    """Full jitted train step on the keypoint preset: synth keypoint
    dataset -> roidb -> sampler -> box + keypoint losses + SGD update.
    loss_kps must be finite, keypoint-head grads non-zero, and a few
    steps on a repeated batch must reduce the total loss."""
    from detectorch_tpu.config import PRESETS, SamplerConfig, SolverConfig
    from detectorch_tpu.data import transforms as T
    from detectorch_tpu.data.coco import roidb_for_training
    from detectorch_tpu.data.synth import build_synth_coco
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.train.sampler import sample_rois
    from detectorch_tpu.train.train_step import make_train_step

    ann_file, img_dir = build_synth_coco(
        str(tmp_path), n_images=3, height=160, width=200, seed=7,
        with_keypoints=True,
    )
    ds, roidb = roidb_for_training(ann_file, img_dir,
                                   require_keypoints=True)
    assert roidb and all(e.gt_keypoints is not None for e in roidb)

    cfg = PRESETS["e2e_keypoint_rcnn_R-50-FPN_1x"].replace(
        compute_dtype="float32", use_pallas_roi_align=False,
    )
    scfg = SamplerConfig(rois_per_image=32, fg_fraction=0.25)
    kp_rows = int(np.round(scfg.fg_fraction * scfg.rois_per_image))
    init_state, make_step = make_train_step(
        cfg, SolverConfig(base_lr=0.01, warmup_iters=0)
    )
    state, tx = init_state(init_params(cfg))
    step_fn = jax.jit(make_step(tx))

    rng = np.random.RandomState(0)
    batch = {k: [] for k in
             ["image", "rois", "labels", "bbox_targets",
              "bbox_inside_weights", "bbox_outside_weights", "valid",
              "kp_labels", "kp_valid"]}
    for e in roidb[:2]:
        im = T.load_image_rgb(e.file_path)
        if e.flipped:
            im = im[:, ::-1]
        image, scale, _ = T.preprocess_image(im, 160, 224,
                                             buckets=((192, 224),))
        blobs = sample_rois(e, scale, rng, scfg, cfg.num_classes)
        batch["image"].append(image)
        for k in ("rois", "labels", "bbox_targets", "bbox_inside_weights",
                  "bbox_outside_weights", "valid"):
            batch[k].append(blobs[k])
        batch["kp_labels"].append(blobs["kp_labels"][:kp_rows])
        batch["kp_valid"].append(blobs["kp_valid"][:kp_rows])
    batch = {k: jnp.asarray(np.stack(v)) for k, v in batch.items()}
    assert bool(batch["kp_valid"].any())  # fg persons with labeled kps

    init_kp_w = np.asarray(state.params["kps_score_lowres_w"]).copy()
    hist = []
    for _ in range(12):
        state, metrics = step_fn(state, batch)
        hist.append({k: float(v) for k, v in metrics.items()})
    assert all(np.isfinite(h["loss_kps"]) for h in hist)
    # classification fits the tiny repeated batch; the keypoint spatial
    # softmax moves off its uniform plateau (log(56*56) ~= 8.05) — full
    # convergence needs a pretrained backbone, out of unit-test scope
    assert hist[-1]["loss_cls"] < 0.05
    assert hist[-1]["loss_kps"] < hist[0]["loss_kps"] - 0.005
    # keypoint head actually received gradient
    assert not np.allclose(
        np.asarray(state.params["kps_score_lowres_w"]), init_kp_w
    )


def test_keypoint_head_torch_mirror():
    """Value-level mirror: our XLA KRCNN head (conv trunk + native deconv
    + fixed-bilinear transposed conv) vs an independent torch transcription
    (tests/torch_mirror.keypoint_logits) on the same weights/inputs."""
    from tests import torch_mirror as TM

    rng = np.random.RandomState(3)
    params = heads_mod.init_keypoint_head_params(
        num_keypoints=17, num_convs=8, conv_dim=512, in_ch=256
    )
    feats = (rng.randn(3, 14, 14, 256) * 2).astype(np.float32)
    ours = np.asarray(
        heads_mod.keypoint_head(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(feats), 8,
        )
    )
    mir = TM.keypoint_logits(params, feats.transpose(0, 3, 1, 2), 8)
    mir = mir.transpose(0, 2, 3, 1)
    assert ours.shape == mir.shape == (3, 56, 56, 17)
    scale = np.abs(mir).max()
    assert np.abs(ours - mir).max() < 2e-2 * scale


def test_flipped_roidb_requires_perm(tmp_path):
    """extend_with_flipped_entries refuses a keypoint roidb without the
    flip permutation instead of silently leaving keypoints unmirrored."""
    from detectorch_tpu.data.coco import CocoDataset, extend_with_flipped_entries
    from detectorch_tpu.data.synth import build_synth_coco

    ann_file, img_dir = build_synth_coco(
        str(tmp_path), n_images=1, height=96, width=128, seed=3,
        with_keypoints=True,
    )
    roidb = CocoDataset(ann_file, img_dir).get_roidb(gt=True)
    with pytest.raises(ValueError, match="keypoint_flip_perm"):
        extend_with_flipped_entries(roidb)


def test_flip_zeroes_unlabeled_keypoints():
    """A stale nonzero x on an unlabeled (v==0) keypoint must not survive
    the flip (upstream keypoint_utils.flip_keypoints zeroes it)."""
    from detectorch_tpu.data.coco import flip_keypoints

    perm = np.array([0, 1])
    kps = np.array([[[30.0, 7.0, 0], [12.0, 5.0, 2]]])
    f = flip_keypoints(kps, perm, 100)
    np.testing.assert_allclose(f[0, 0], [0.0, 7.0, 0])
    np.testing.assert_allclose(f[0, 1], [87.0, 5.0, 2])
