"""Integration: dataset -> engine -> COCO eval, random weights.

Random weights give no meaningful AP — the assertions check the mechanics:
preprocessing buckets, proposal plumbing, result formats, evaluator wiring.
"""

import json
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.config import PRESETS, TestConfig
from detectorch_tpu.data.coco import CocoDataset
from detectorch_tpu.eval.engine import evaluate_dataset
from detectorch_tpu.models.detector import init_params


@pytest.fixture
def tiny_coco(tmp_path, rng):
    import cv2

    imgs, anns = [], []
    for i in range(2):
        h, w = 64, 80
        name = f"im{i}.jpg"
        cv2.imwrite(str(tmp_path / name),
                    (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8))
        imgs.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [10, 10, 30, 30], "area": 900.0, "iscrowd": 0,
                     "segmentation": [[10, 10, 40, 10, 40, 40, 10, 40]]})
    (tmp_path / "ann.json").write_text(json.dumps({
        "images": imgs, "annotations": anns,
        "categories": [{"id": c, "name": f"c{c}"} for c in range(1, 81)],
    }))
    return str(tmp_path / "ann.json"), str(tmp_path)


def test_fast_rcnn_eval_loop(tiny_coco, tmp_path, rng):
    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    # proposal file for Fast R-CNN mode
    props = [np.array([[5, 5, 40, 40], [12, 8, 60, 50]], np.float64)] * 2
    pf = tmp_path / "p.pkl"
    with open(pf, "wb") as f:
        pickle.dump({"boxes": props, "ids": [1, 2]}, f)
    roidb = ds.get_roidb(gt=False, proposal_file=str(pf))

    cfg = PRESETS["fast_rcnn_R-50-C4_2x"].replace(compute_dtype="float32")
    tcfg = TestConfig(
        target_size=64, max_size=96, detections_per_img=5, max_proposals=8,
        score_thresh=0.0,
    )
    params = init_params(cfg, seed=0)
    bbox_stats, segm_stats, info = evaluate_dataset(
        cfg, tcfg, params, ds, roidb=roidb, verbose=False
    )
    assert segm_stats is None
    assert info["images_per_sec"] > 0
    # random weights: results exist and are structurally valid
    for r in info["bbox"]:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert r["category_id"] in ds.contiguous_to_json.values()
    # evaluator produced the 12 standard stats
    assert bbox_stats is not None and len(bbox_stats) == 12


def test_batched_eval_matches_single(tiny_coco, rng):
    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    s1, _, info1 = evaluate_dataset(cfg, tcfg, params, ds, verbose=False)
    s2, _, info2 = evaluate_dataset(
        cfg, tcfg, params, ds, verbose=False, batch_size=2
    )
    assert len(info1["bbox"]) == len(info2["bbox"])
    b1 = sorted(info1["bbox"], key=lambda r: (r["image_id"], -r["score"]))
    b2 = sorted(info2["bbox"], key=lambda r: (r["image_id"], -r["score"]))
    for r1, r2 in zip(b1, b2):
        assert r1["image_id"] == r2["image_id"]
        assert r1["category_id"] == r2["category_id"]
        np.testing.assert_allclose(r1["bbox"], r2["bbox"], rtol=1e-4, atol=1e-3)


def test_eval_single_element_target_sizes_folds(tiny_coco, rng):
    """evaluate_dataset(target_sizes=[s]) is single-scale eval AT SIZE s:
    the 1-element list must fold into test_cfg.target_size before engines
    are built (a bare engine.preprocess call would silently use the
    default size — the bug this test pins)."""
    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    _, _, via_list = evaluate_dataset(
        cfg, tcfg, params, ds, verbose=False, target_sizes=[48]
    )
    _, _, via_cfg = evaluate_dataset(
        cfg, tcfg.replace(target_size=48), params, ds, verbose=False
    )
    assert len(via_list["bbox"]) == len(via_cfg["bbox"])
    a = sorted(via_list["bbox"], key=lambda r: (r["image_id"], -r["score"]))
    b = sorted(via_cfg["bbox"], key=lambda r: (r["image_id"], -r["score"]))
    for r1, r2 in zip(a, b):
        assert r1["image_id"] == r2["image_id"]
        assert r1["category_id"] == r2["category_id"]
        np.testing.assert_allclose(r1["bbox"], r2["bbox"], rtol=1e-5)


def test_mask_rcnn_eval_loop(tiny_coco, rng):
    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    bbox_stats, segm_stats, info = evaluate_dataset(
        cfg, tcfg, params, ds, verbose=False
    )
    assert bbox_stats is not None
    if info["segm"]:
        assert segm_stats is not None
        r = info["segm"][0]
        assert "segmentation" in r and isinstance(r["segmentation"]["counts"], str)


def test_engine_exact_rerun_on_slab_overflow(rng):
    """VERDICT r1 item 7: an extreme-aspect roi overflows the Pallas
    kernel's 64-slab (FPN level rule bounds AREA, not aspect —
    roi_align_kernel.py:17-25); the program must flag roi_align_exact=False
    and the engine's finalize() must re-run the image through the exact
    gather program, yielding detections identical to a pure-gather engine
    (reference semantics anchor: roi_align_forward_cuda.cu:120-155)."""
    from detectorch_tpu.eval.engine import InferenceEngine

    cfg = PRESETS["fast_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    assert cfg.use_pallas_roi_align
    tcfg = TestConfig(
        target_size=64, max_size=288, detections_per_img=5, max_proposals=8,
        score_thresh=0.0, exact_blob_dims=True,
    )
    params = init_params(cfg, seed=0)

    # 60x270 image -> scale 64/60; a 265-wide 6-tall proposal lands on level
    # 2 (tiny area) with a ~283*0.25 = 71-column footprint > the 64 slab
    im = (rng.uniform(size=(60, 270, 3)) * 255).astype(np.uint8)
    proposals = np.array(
        [
            [0.0, 20.0, 265.0, 26.0],     # the slab-overflowing monster
            [10.0, 10.0, 50.0, 50.0],
            [100.0, 5.0, 180.0, 55.0],
            [200.0, 25.0, 260.0, 58.0],
        ]
    )

    fast = InferenceEngine(cfg, tcfg, params)
    args, oh, ow = fast.preprocess(im, proposals)
    out = fast.submit(args)
    # the fast program itself must flag the overflow...
    assert not bool(np.asarray(out.roi_align_exact))
    res = fast.finalize(out, args, oh, ow)

    # ...and finalize's rerun must equal the pure exact-gather engine
    exact = InferenceEngine(
        cfg.replace(use_pallas_roi_align=False), tcfg, params
    )
    res_exact = exact.run_image(im, proposals)
    assert res["boxes"].shape == res_exact["boxes"].shape
    np.testing.assert_array_equal(res["classes"], res_exact["classes"])
    np.testing.assert_allclose(res["scores"], res_exact["scores"], rtol=1e-6)
    np.testing.assert_allclose(res["boxes"], res_exact["boxes"], rtol=1e-6)

    # sanity: a normal-aspect-only image does NOT trigger the rerun
    args2, _, _ = fast.preprocess(im, proposals[1:])
    out2 = fast.submit(args2)
    assert bool(np.asarray(out2.roi_align_exact))


def test_batched_device_preprocess_matches_single(tiny_coco, rng):
    """The packed batched protocol (raw uint8 + tables + meta uploads, one
    packed detections tensor back) must produce the same results as the
    single-image device-preprocess path."""
    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0, device_preprocess=True)
    params = init_params(cfg, seed=0)
    s1, _, info1 = evaluate_dataset(cfg, tcfg, params, ds, verbose=False)
    s2, _, info2 = evaluate_dataset(
        cfg, tcfg, params, ds, verbose=False, batch_size=2
    )
    assert len(info1["bbox"]) == len(info2["bbox"]) > 0
    b1 = sorted(info1["bbox"], key=lambda r: (r["image_id"], -r["score"]))
    b2 = sorted(info2["bbox"], key=lambda r: (r["image_id"], -r["score"]))
    for r1, r2 in zip(b1, b2):
        assert r1["image_id"] == r2["image_id"]
        assert r1["category_id"] == r2["category_id"]
        np.testing.assert_allclose(r1["bbox"], r2["bbox"], rtol=1e-4, atol=1e-3)


def test_evaluate_dataset_engines_reuse(tiny_coco, rng):
    """Passing the same `engines` dict across calls reuses compiled
    programs (the warmup pattern tools/bench_e2e.py relies on)."""
    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5)
    params = init_params(cfg, seed=0)
    engines = {}
    evaluate_dataset(cfg, tcfg, params, ds, limit=2, verbose=False,
                     batch_size=2, engines=engines)
    bkey = ("batched", 2, None)
    batched = engines[bkey]
    n_compiled = len(batched._compiled)
    assert n_compiled >= 1
    _, _, info = evaluate_dataset(cfg, tcfg, params, ds, verbose=False,
                                  batch_size=2, engines=engines)
    assert engines[bkey] is batched
    assert len(batched._compiled) == n_compiled  # no new programs
    assert len(info["bbox"]) > 0
    # a different batch_size must NOT silently reuse the old engine
    # (ADVICE r2: cached engines are keyed by their call parameters)
    evaluate_dataset(cfg, tcfg, params, ds, limit=3, verbose=False,
                     batch_size=3, engines=engines)
    assert ("batched", 3, None) in engines
    assert engines[("batched", 3, None)].batch_size == 3


def test_batched_mask_fetch_dtypes(tiny_coco, rng):
    """The batched engine fetches masks as bf16 by default (halves the
    dominant D2H payload). With mask_fetch_dtype='float32' pinned, the
    batched RLEs are byte-identical to the single-image engine's; the bf16
    default may flip isolated pixels within +-2^-9 of the binarisation
    threshold, never more (here random weights put sigmoid mass right at
    0.5 — the adversarial case; real masks are confident)."""
    from detectorch_tpu.eval import rle as rle_mod

    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    base = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    # random weights put every sigmoid within one bf16 ulp of 0.5 — the
    # degenerate all-pixels-tie case no trained model produces. Push the
    # mask logits to confident values (like real weights) via the bias.
    params = dict(params)
    b = np.asarray(params["mask_fcn_logits_b"]).copy()
    b[0::2] = 3.0
    b[1::2] = -3.0
    params["mask_fcn_logits_b"] = b
    _, _, single = evaluate_dataset(cfg, base, params, ds, verbose=False)
    _, _, exact = evaluate_dataset(
        cfg, base.replace(mask_fetch_dtype="float32"), params, ds,
        verbose=False, batch_size=2,
    )
    _, _, bf16 = evaluate_dataset(
        cfg, base, params, ds, verbose=False, batch_size=2
    )

    def keyed(info):
        return sorted(info["segm"], key=lambda r: (r["image_id"], -r["score"]))

    s, e, b = keyed(single), keyed(exact), keyed(bf16)
    assert len(s) == len(e) == len(b) > 0
    for rs, re_, rb in zip(s, e, b):
        assert rs["segmentation"] == re_["segmentation"]  # fp32: byte-equal
        ms = rle_mod.decode(rs["segmentation"])
        mb = rle_mod.decode(rb["segmentation"])
        inter = np.logical_and(ms, mb).sum()
        union = np.logical_or(ms, mb).sum()
        if union:
            assert inter / union > 0.95, (inter, union)


def test_engine_exact_rerun_on_nms_prefilter_overflow(tiny_coco, rng):
    """With nms_topk_prefilter set and score_thresh=0 every roi is an
    above-threshold candidate for every class, so the prefilter ALWAYS
    overflows: the program must flag nms_exact=False and the engine's
    finalize must re-run through the full-NMS program, matching a
    no-prefilter engine exactly."""
    from detectorch_tpu.eval.engine import InferenceEngine
    from detectorch_tpu.data.transforms import load_image_rgb

    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(
        compute_dtype="float32", use_pallas_roi_align=False,
    )
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=40))
    base = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    im = load_image_rgb(ds.get_roidb(gt=False)[0].file_path)

    fast = InferenceEngine(cfg, base.replace(nms_topk_prefilter=16), params)
    assert fast._needs_exact_check()
    args, oh, ow = fast.preprocess(im)
    out = fast.submit(args)
    # prefilter overflow travels on nms_exact/all_exact; the pure RoIAlign
    # flag stays True (no Pallas slab involved here)
    assert not bool(np.asarray(out.detections.nms_exact))
    assert not bool(np.asarray(out.all_exact))
    assert bool(np.asarray(out.roi_align_exact))
    res = fast.finalize(out, args, oh, ow)

    exact = InferenceEngine(cfg, base, params)
    res_exact = exact.run_image(im)
    np.testing.assert_array_equal(res["classes"], res_exact["classes"])
    np.testing.assert_allclose(res["scores"], res_exact["scores"], rtol=1e-6)
    np.testing.assert_allclose(res["boxes"], res_exact["boxes"], rtol=1e-6)


def test_multiscale_single_size_matches_run_image(tiny_coco, rng):
    """run_image_multiscale([s]) must reduce exactly to run_image: the merge
    program re-runs decode+NMS outside the main program on the same pre-NMS
    tensors, and the standalone mask program recomputes the backbone — both
    must reproduce the in-program results."""
    from detectorch_tpu.data.transforms import load_image_rgb
    from detectorch_tpu.eval.engine import InferenceEngine

    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    eng = InferenceEngine(cfg, tcfg, params)
    im = load_image_rgb(ds.get_roidb(gt=False)[0].file_path)

    single = eng.run_image(im)
    multi = eng.run_image_multiscale(im, [tcfg.target_size])
    np.testing.assert_array_equal(multi["classes"], single["classes"])
    np.testing.assert_allclose(multi["scores"], single["scores"], rtol=1e-6)
    np.testing.assert_allclose(multi["boxes"], single["boxes"], rtol=1e-5,
                               atol=1e-4)
    assert multi["rles"] == single["rles"]


def test_multiscale_two_sizes(tiny_coco, rng):
    """Genuine two-scale union: structurally valid merged detections and
    masks; the union can only add candidates, never lose the single-scale
    winners' classes entirely."""
    from detectorch_tpu.data.transforms import load_image_rgb
    from detectorch_tpu.eval.engine import InferenceEngine

    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    eng = InferenceEngine(cfg, tcfg, params)
    entry = ds.get_roidb(gt=False)[0]
    im = load_image_rgb(entry.file_path)

    res = eng.run_image_multiscale(im, [48, 64])
    assert len(res["boxes"]) > 0
    assert len(res["rles"]) == len(res["boxes"])
    oh, ow = im.shape[:2]
    assert np.all(res["boxes"][:, 0] >= 0) and np.all(res["boxes"][:, 1] >= 0)
    assert np.all(res["boxes"][:, 2] <= ow - 1 + 1e-3)
    assert np.all(res["boxes"][:, 3] <= oh - 1 + 1e-3)
    assert np.all((res["classes"] >= 1) & (res["classes"] < cfg.num_classes))
    # scores sorted-desc property is NOT guaranteed post-union; validity is
    assert np.all(res["scores"] > 0)


def test_evaluate_dataset_multiscale(tiny_coco, rng):
    """Dataset loop in multi-scale mode produces valid COCO results and the
    12-stat vector; --target-sizes in tools/eval_coco.py drives this path."""
    ann, imdir = tiny_coco
    ds = CocoDataset(ann, imdir)
    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    cfg = cfg.replace(rpn=cfg.rpn.__class__(pre_nms_top_n=100, post_nms_top_n=20))
    tcfg = TestConfig(target_size=64, max_size=96, detections_per_img=5,
                      score_thresh=0.0)
    params = init_params(cfg, seed=0)
    stats, _, info = evaluate_dataset(
        cfg, tcfg, params, ds, verbose=False, target_sizes=[48, 64]
    )
    assert stats is not None and len(stats) == 12
    for r in info["bbox"]:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
    with pytest.raises(ValueError):
        evaluate_dataset(cfg, tcfg, params, ds, verbose=False,
                         target_sizes=[48, 64], batch_size=2)
