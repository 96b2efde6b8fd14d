"""Tests for eval/results_io.py — COCO results-file writer/loader + the
per-category AP table (reference json_dataset_evaluator.py:40-235)."""

import json
import os
import pickle

import numpy as np

from detectorch_tpu.eval import results_io
from detectorch_tpu.eval.coco_eval import COCO, COCOeval
from tests.test_coco_eval import IMGS, gt_ann, make_gt


def _two_class_setup():
    gt = make_gt(
        IMGS,
        [gt_ann(1, 1, 1, [10, 10, 40, 40]), gt_ann(2, 1, 2, [60, 60, 20, 20])],
    )
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9},
        # class 2 detection at IoU = 14/26 ≈ 0.538: TP only at threshold .50
        {"image_id": 1, "category_id": 2, "bbox": [66, 60, 20, 20], "score": 0.8},
    ]
    return gt, res


def test_results_file_round_trip(tmp_path):
    gt, res = _two_class_setup()
    path = results_io.results_file_path(str(tmp_path), "bbox", "mini", use_salt=False)
    assert path.endswith("bbox_mini_results.json")
    results_io.write_results_file(res, path)
    loaded = results_io.load_results_file(path)
    assert loaded == json.loads(json.dumps(res))
    # salted path embeds a uuid and never collides
    p1 = results_io.results_file_path(str(tmp_path), "segm", "mini")
    p2 = results_io.results_file_path(str(tmp_path), "segm", "mini")
    assert p1 != p2 and "segmentations_mini_results_" in p1


def test_eval_from_file_matches_in_memory(tmp_path):
    gt, res = _two_class_setup()
    ev_file = results_io.evaluate_from_results(
        gt, res, "bbox", str(tmp_path), dataset_name="mini", verbose=False
    )
    dt = gt.load_res(res)
    ev_mem = COCOeval(gt, dt, "bbox")
    ev_mem.evaluate()
    ev_mem.accumulate()
    np.testing.assert_allclose(ev_file.summarize(verbose=False),
                               ev_mem.summarize(verbose=False))
    # the evaluator pickle exists and reloads with the same stats
    pkl = os.path.join(str(tmp_path), "detection_results.pkl")
    with open(pkl, "rb") as f:
        ev_re = pickle.load(f)
    np.testing.assert_allclose(ev_re.stats, ev_file.stats)


def test_per_class_ap_table(tmp_path):
    gt, res = _two_class_setup()
    dt = gt.load_res(res)
    ev = COCOeval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    table = results_io.log_per_class_ap(ev, verbose=False)
    assert set(table) == {"__mean__", "c1", "c2"}
    np.testing.assert_allclose(table["c1"], 1.0, atol=1e-9)  # perfect match
    # class 2 at IoU≈0.538: TP at threshold 0.50 only -> AP = 1/10
    np.testing.assert_allclose(table["c2"], 0.1, atol=1e-7)
    np.testing.assert_allclose(
        table["__mean__"], (table["c1"] + table["c2"]) / 2, atol=1e-9
    )


def test_cleanup_removes_results_file(tmp_path):
    gt, res = _two_class_setup()
    results_io.evaluate_from_results(
        gt, res, "bbox", str(tmp_path), dataset_name="mini",
        use_salt=False, cleanup=True, verbose=False,
    )
    assert not os.path.exists(
        os.path.join(str(tmp_path), "bbox_mini_results.json")
    )
