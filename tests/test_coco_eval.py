import numpy as np

from detectorch_tpu.eval import rle as R
from detectorch_tpu.eval.coco_eval import COCO, COCOeval


def make_gt(images, anns, num_cats=2):
    return COCO(dataset={
        "images": images,
        "annotations": anns,
        "categories": [{"id": i + 1, "name": f"c{i+1}"} for i in range(num_cats)],
    })


def gt_ann(aid, img, cat, bbox, crowd=0, segm=None):
    a = {
        "id": aid, "image_id": img, "category_id": cat, "bbox": list(bbox),
        "area": float(bbox[2] * bbox[3]), "iscrowd": crowd,
    }
    if segm is not None:
        a["segmentation"] = segm
    return a


IMGS = [{"id": 1, "height": 100, "width": 100}]


def run_eval(gt, results, iou_type="bbox"):
    dt = gt.load_res(results)
    ev = COCOeval(gt, dt, iou_type)
    ev.evaluate()
    ev.accumulate()
    return ev.summarize(verbose=False)


def test_perfect_detection_ap1():
    gt = make_gt(IMGS, [gt_ann(1, 1, 1, [10, 10, 40, 40])])
    res = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9}]
    st = run_eval(gt, res)
    np.testing.assert_allclose(st[[0, 1, 8]], 1.0, atol=1e-9)


def test_partial_iou_counts_at_matching_thresholds():
    # dt with IoU ~0.6 vs gt: TP at thresholds 0.5, 0.55, 0.6 -> AP = 0.3
    gt = make_gt(IMGS, [gt_ann(1, 1, 1, [0, 0, 50, 100])])
    # overlap 35x100 / union (50+50-35)x100 = 35/65... tune for exactly 0.6:
    # dt [x,0,50,100], inter (50-x), union (50+x) -> iou=0.6 at x=12.5
    res = [{"image_id": 1, "category_id": 1, "bbox": [12.5, 0, 50, 100], "score": 0.9}]
    st = run_eval(gt, res)
    np.testing.assert_allclose(st[0], 0.3, atol=1e-7)
    np.testing.assert_allclose(st[1], 1.0, atol=1e-9)  # AP50


def test_high_scoring_fp_halves_ap():
    gt = make_gt(IMGS, [gt_ann(1, 1, 1, [10, 10, 30, 30])])
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [60, 60, 20, 20], "score": 0.95},
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30], "score": 0.90},
    ]
    st = run_eval(gt, res)
    np.testing.assert_allclose(st[0], 0.5, atol=1e-6)


def test_missed_gt_zero_recall_class():
    gt = make_gt(IMGS, [
        gt_ann(1, 1, 1, [10, 10, 30, 30]),
        gt_ann(2, 1, 2, [50, 50, 30, 30]),
    ])
    res = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30], "score": 0.9}]
    st = run_eval(gt, res)
    np.testing.assert_allclose(st[0], 0.5, atol=1e-6)  # mean over 2 cats


def test_crowd_gt_not_a_fp_sink():
    # dt overlapping a crowd gt is ignored, not counted as FP
    gt = make_gt(IMGS, [
        gt_ann(1, 1, 1, [10, 10, 30, 30]),
        gt_ann(2, 1, 1, [0, 0, 100, 100], crowd=1),
    ])
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30], "score": 0.8},
        {"image_id": 1, "category_id": 1, "bbox": [60, 60, 35, 35], "score": 0.9},
    ]
    st = run_eval(gt, res)
    # the 0.9 dt matches the crowd region (IoU_crowd = 1.0) -> ignored;
    # remaining TP gives AP 1.0
    np.testing.assert_allclose(st[0], 1.0, atol=1e-6)


def test_area_range_assignment():
    # a 20x20=400px object is 'small' (<32^2)
    gt = make_gt(IMGS, [gt_ann(1, 1, 1, [10, 10, 20, 20])])
    res = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9}]
    dt = gt.load_res(res)
    ev = COCOeval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    st = ev.summarize(verbose=False)
    np.testing.assert_allclose(st[3], 1.0, atol=1e-9)   # APs
    assert st[4] == -1.0  # APm: no medium gt
    assert st[5] == -1.0  # APl


def test_segm_eval_with_rle():
    m_gt = np.zeros((100, 100), np.uint8)
    m_gt[20:60, 20:60] = 1
    m_dt = np.zeros((100, 100), np.uint8)
    m_dt[20:60, 20:60] = 1
    gt = make_gt(IMGS, [
        dict(gt_ann(1, 1, 1, [20, 20, 40, 40]),
             segmentation={"size": [100, 100], "counts": R.encode_counts(m_gt)},
             area=1600.0),
    ])
    res = [{
        "image_id": 1, "category_id": 1, "score": 0.9,
        "segmentation": R.encode(m_dt),
    }]
    st = run_eval(gt, res, iou_type="segm")
    np.testing.assert_allclose(st[0], 1.0, atol=1e-9)


def test_segm_eval_partial_overlap():
    m_gt = np.zeros((100, 100), np.uint8)
    m_gt[0:50, 0:100] = 1  # area 5000
    m_dt = np.zeros((100, 100), np.uint8)
    m_dt[15:65, 0:100] = 1  # inter 3500, union 6500 -> iou ~0.538
    gt = make_gt(IMGS, [
        dict(gt_ann(1, 1, 1, [0, 0, 100, 50]),
             segmentation={"size": [100, 100], "counts": R.encode_counts(m_gt)},
             area=5000.0),
    ])
    res = [{"image_id": 1, "category_id": 1, "score": 0.9,
            "segmentation": R.encode(m_dt)}]
    st = run_eval(gt, res, iou_type="segm")
    # TP only at iou thr 0.50 -> AP = 1/10
    np.testing.assert_allclose(st[0], 0.1, atol=1e-6)


def test_maxdets_limits_recall():
    anns = [gt_ann(i + 1, 1, 1, [i * 8.0, 0, 6, 6]) for i in range(5)]
    gt = make_gt(IMGS, anns)
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [i * 8.0, 0, 6, 6],
         "score": 0.9 - i * 0.05}
        for i in range(5)
    ]
    dt = gt.load_res(res)
    ev = COCOeval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    st = ev.summarize(verbose=False)
    np.testing.assert_allclose(st[6], 1.0 / 5.0, atol=1e-6)  # AR@1
    assert st[8] == 1.0  # AR@100
