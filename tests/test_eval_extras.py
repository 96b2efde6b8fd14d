import numpy as np
import jax.numpy as jnp

from detectorch_tpu.eval.coco_eval import (
    COCO, COCOeval, evaluate_box_proposals, _compute_oks,
)
from detectorch_tpu.ops import boxes as B


def test_box_voting_id_weighted_average():
    top = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    top_s = jnp.asarray(np.array([0.9], np.float32))
    allb = np.array([[0, 0, 10, 10], [2, 2, 12, 12], [50, 50, 60, 60]], np.float32)
    alls = np.array([0.9, 0.1, 0.8], np.float32)
    valid = np.array([True, True, True])
    voted, scores = B.box_voting(top, top_s, allb, alls, valid, thresh=0.5)
    voted = np.asarray(voted)
    # weighted avg of boxes 0,1 with weights .9,.1 (box 2 doesn't overlap)
    exp = (0.9 * allb[0] + 0.1 * allb[1]) / 1.0
    np.testing.assert_allclose(voted[0], exp, rtol=1e-5)
    assert float(scores[0]) == np.float32(0.9)  # ID keeps score


def test_box_voting_avg_scoring():
    top = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    allb = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    alls = np.array([0.8, 0.4], np.float32)
    _, scores = B.box_voting(
        top, jnp.asarray([0.8]), allb, alls, np.array([True, True]),
        thresh=0.5, scoring_method="AVG",
    )
    np.testing.assert_allclose(float(scores[0]), 0.6, rtol=1e-5)


def test_box_voting_temp_avg_matches_reference_formula():
    """TEMP_AVG scoring (reference boxes.py:301-312): temperature-smoothed
    2-class probability averaging, checked against a direct numpy
    transcription of the reference loop."""
    rng = np.random.RandomState(3)
    top = np.array([[0, 0, 10, 10], [40, 40, 60, 60]], np.float32)
    allb = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [42, 41, 61, 62], [40, 40, 60, 60]],
        np.float32,
    )
    alls = rng.uniform(0.05, 0.95, 4).astype(np.float32)
    valid = np.ones(4, bool)
    for beta in (1.0, 0.7):
        _, scores = B.box_voting(
            jnp.asarray(top), jnp.asarray([0.9, 0.8]), allb, alls, valid,
            thresh=0.5, scoring_method="TEMP_AVG", beta=beta,
        )
        # reference transcription
        ious = np.asarray(B.bbox_overlaps(top, allb))
        for k in range(2):
            inds = np.where(ious[k] >= 0.5)[0]
            ws = alls[inds]
            P = np.vstack((ws, 1.0 - ws))
            P_max = np.max(P, axis=0)
            X = np.log(P / P_max)
            X_exp = np.exp(X / beta)
            P_temp = X_exp / np.sum(X_exp, axis=0)
            np.testing.assert_allclose(
                float(scores[k]), P_temp[0].mean(), rtol=1e-5
            )


def test_evaluate_box_proposals_perfect_recall():
    gts = [np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float64)]
    props = [np.array([[10, 10, 50, 50], [60, 60, 90, 90], [0, 0, 5, 5]], np.float64)]
    out = evaluate_box_proposals(props, gts)
    assert out["ar"] == 1.0
    assert out["num_pos"] == 2


def test_evaluate_box_proposals_partial():
    gts = [np.array([[0, 0, 99, 99]], np.float64)]
    # proposal with IoU ~0.6: covers [0,0,79,99] -> inter 80x100/union 100x100
    props = [np.array([[0, 0, 79, 99]], np.float64)]
    out = evaluate_box_proposals(props, gts)
    # recall 1 at thr .5,.55,.6; 0 above (iou=0.8*... inter=8000,union=10000=0.8)
    np.testing.assert_allclose(out["ar"], (np.arange(0.5, 0.951, 0.05) <= 0.8).mean())


def test_oks_identical_keypoints():
    kps = []
    for i in range(17):
        kps += [10.0 + i, 20.0 + i, 2]
    gt = {"keypoints": kps, "bbox": [0, 0, 50, 50], "area": 2500.0}
    dt = {"keypoints": kps, "score": 0.9}
    oks = _compute_oks([dt], [gt])
    np.testing.assert_allclose(oks[0, 0], 1.0)


def test_keypoint_eval_end_to_end():
    kps = []
    for i in range(17):
        kps += [10.0 + i * 3, 20.0 + i * 2, 2]
    gt = COCO(dataset={
        "images": [{"id": 1, "height": 100, "width": 100}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [5, 15, 60, 40], "area": 2400.0, "iscrowd": 0,
            "keypoints": kps, "num_keypoints": 17,
        }],
        "categories": [{"id": 1, "name": "person"}],
    })
    res = [{"image_id": 1, "category_id": 1, "keypoints": kps, "score": 0.9,
            "bbox": [5, 15, 60, 40], "area": 2400.0}]
    dt = gt.load_res(res)
    ev = COCOeval(gt, dt, "keypoints")
    ev.evaluate()
    ev.accumulate()
    st = ev.summarize(verbose=False)
    assert len(st) == 10
    np.testing.assert_allclose(st[0], 1.0, atol=1e-9)
