"""Integration: dataset -> engine -> COCO eval, random weights.

Random weights give no meaningful AP — the assertions check the mechanics:
preprocessing buckets, proposal plumbing, result formats, evaluator wiring.
"""

import json
import pickle

import numpy as np
import pytest

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
