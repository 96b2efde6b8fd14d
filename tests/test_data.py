import json
import os
import pickle

import numpy as np
import pytest

from detectorch_tpu.data import transforms as T
from detectorch_tpu.data.coco import (
    CocoDataset,
    add_bbox_regression_targets,
    extend_with_flipped_entries,
    filter_for_training,
    roidb_for_training,
)


@pytest.fixture
def coco_dir(tmp_path, rng):
    """Synthetic 2-image COCO dataset with images on disk."""
    import cv2

    imgs = []
    anns = []
    ann_id = 1
    for i, (h, w) in enumerate([(120, 160), (90, 140)]):
        name = f"img{i}.jpg"
        im = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / name), im)
        imgs.append({"id": i + 1, "file_name": name, "height": h, "width": w})
    # image 1: two objects + one crowd
    anns.append({"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [10, 10, 40, 30], "area": 1200.0, "iscrowd": 0,
                 "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]]})
    anns.append({"id": 2, "image_id": 1, "category_id": 3,
                 "bbox": [60, 20, 30, 50], "area": 1500.0, "iscrowd": 0,
                 "segmentation": [[60, 20, 90, 20, 90, 70, 60, 70]]})
    anns.append({"id": 3, "image_id": 1, "category_id": 1,
                 "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 1,
                 "segmentation": {"size": [120, 160], "counts": [0, 120 * 160]}})
    # image 2: one object with an out-of-bounds bbox that must clip
    anns.append({"id": 4, "image_id": 2, "category_id": 3,
                 "bbox": [100, 50, 80, 80], "area": 6400.0, "iscrowd": 0,
                 "segmentation": [[100, 50, 139, 50, 139, 89, 100, 89]]})
    dataset = {
        "images": imgs,
        "annotations": anns,
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 3, "name": "car"},
            {"id": 7, "name": "dog"},
        ],
    }
    path = tmp_path / "annotations.json"
    path.write_text(json.dumps(dataset))
    return str(path), str(tmp_path)


def test_category_mapping(coco_dir):
    ds = CocoDataset(*coco_dir)
    assert ds.classes == ["__background__", "person", "car", "dog"]
    assert ds.json_to_contiguous == {1: 1, 3: 2, 7: 3}
    assert ds.contiguous_to_json[2] == 3


def test_keypoint_metadata(tmp_path):
    import json as _json

    ds_json = {
        "images": [{"id": 1, "file_name": "x.jpg", "height": 10, "width": 10}],
        "annotations": [],
        "categories": [{
            "id": 1, "name": "person",
            "keypoints": ["nose", "left_eye", "right_eye"],
        }],
    }
    p = tmp_path / "kp.json"
    p.write_text(_json.dumps(ds_json))
    ds = CocoDataset(str(p), str(tmp_path))
    assert ds.num_keypoints == 3
    assert ds.keypoints[0] == "nose"
    assert ds.keypoint_flip_map["left_eye"] == "right_eye"


def test_gt_roidb(coco_dir):
    ds = CocoDataset(*coco_dir)
    roidb = ds.get_roidb(gt=True)
    assert len(roidb) == 2
    e = roidb[0]
    assert len(e.boxes) == 3
    # xywh -> xyxy with +1 convention: [10,10,40,30] -> [10,10,49,39]
    np.testing.assert_allclose(e.boxes[0], [10, 10, 49, 39])
    assert e.gt_classes.tolist() == [1, 2, 1]
    assert e.is_crowd.tolist() == [0, 0, 1]
    # crowd gets max_overlap -1
    assert e.max_overlaps[2] == -1.0
    # clipped box on image 2: x2 = min(100+80-1, 139) = 139
    e2 = roidb[1]
    np.testing.assert_allclose(e2.boxes[0], [100, 50, 139, 89])


def test_proposals_from_file(coco_dir, tmp_path, rng):
    ds = CocoDataset(*coco_dir)
    boxes1 = np.array(
        [[10, 10, 49, 39],     # exact gt hit -> overlap 1.0
         [12, 12, 52, 42],     # near gt
         [12, 12, 52, 42],     # duplicate (dropped)
         [0, 0, 1, 1]],        # too small (dropped)
        np.float64,
    )
    boxes2 = np.array([[5, 5, 60, 60]], np.float64)
    pf = tmp_path / "props.pkl"
    with open(pf, "wb") as f:
        pickle.dump({"boxes": [boxes1, boxes2], "ids": [1, 2]}, f)
    roidb = ds.get_roidb(gt=True, proposal_file=str(pf))
    e = roidb[0]
    assert len(e.boxes) == 3 + 2  # 3 gt + 2 surviving proposals
    assert e.gt_classes[3] == 0 and e.gt_classes[4] == 0
    assert e.max_overlaps[3] == 1.0  # exact gt match
    assert e.max_classes[3] == 1
    assert 0 < e.max_overlaps[4] < 1.0


def test_flipped_entries(coco_dir):
    ds = CocoDataset(*coco_dir)
    roidb = ds.get_roidb(gt=True)
    both = extend_with_flipped_entries(roidb)
    assert len(both) == 4
    f = both[2]
    assert f.flipped
    # [10,10,49,39] flips on width 160 to [160-49-1, 10, 160-10-1, 39]
    np.testing.assert_allclose(f.boxes[0], [110, 10, 149, 39])
    # flipped polygon xs
    poly = np.asarray(f.segms[0][0])
    np.testing.assert_allclose(poly[0::2], [149, 109, 109, 149])


def test_training_roidb_pipeline(coco_dir, tmp_path):
    ds, roidb = roidb_for_training(*coco_dir, use_flipped=True)
    assert len(roidb) == 4  # both images valid, + flips
    e = roidb[0]
    assert e.bbox_targets is not None
    # gt boxes regress to themselves: targets 0 with own class label
    np.testing.assert_allclose(e.bbox_targets[0], [1, 0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(e.bbox_targets[1], [2, 0, 0, 0, 0], atol=1e-6)


def test_filter_for_training_drops_empty():
    from detectorch_tpu.data.coco import RoidbEntry

    empty = RoidbEntry(
        image_id=1, file_path="x", height=10, width=10,
        boxes=np.zeros((0, 4), np.float32),
        gt_classes=np.zeros(0, np.int32),
        is_crowd=np.zeros(0, np.uint8),
        max_overlaps=np.zeros(0, np.float32),
        max_classes=np.zeros(0, np.int32),
        box_to_gt_ind_map=np.zeros(0, np.int32),
    )
    assert filter_for_training([empty]) == []


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_compute_scale_matches_reference():
    # 480x640: scale = 800/480 = 1.666..; 1.666*640 = 1066 < 1333 -> ok
    np.testing.assert_allclose(T.compute_scale(480, 640), 800 / 480)
    # 400x1200: 800/400=2 -> 2400 > 1333 -> cap at 1333/1200
    np.testing.assert_allclose(T.compute_scale(400, 1200), 1333 / 1200)


def test_bucket_shape():
    assert T.bucket_shape(800, 1067, buckets=T.DEFAULT_BUCKETS) == (832, 1344)
    assert T.bucket_shape(1333, 800, buckets=T.DEFAULT_BUCKETS) == (1344, 832)
    assert T.bucket_shape(100, 100, buckets=None, stride=32) == (128, 128)
    with pytest.raises(ValueError):
        T.bucket_shape(2000, 2000, buckets=T.DEFAULT_BUCKETS)


def test_preprocess_image(rng):
    im = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
    out, scale, (oh, ow) = T.preprocess_image(im)
    assert out.shape == (832, 1344, 3)
    assert (oh, ow) == (480, 640)
    np.testing.assert_allclose(scale, 800 / 480)
    # padding region is zero
    assert np.abs(out[820:, :]).sum() == 0
    # gray input broadcast
    out2, _, _ = T.preprocess_image(im[:, :, 0])
    assert out2.shape[-1] == 3


def test_preprocess_image_pyramid(rng):
    im = (rng.uniform(size=(300, 400, 3)) * 255).astype(np.uint8)
    levels = T.preprocess_image_pyramid(im, target_sizes=[400, 600, 800])
    assert len(levels) == 3
    scales = [lv[1] for lv in levels]
    np.testing.assert_allclose(scales, [400 / 300, 600 / 300, 800 / 300])
    for (img, scale, (oh, ow)) in levels:
        assert (oh, ow) == (300, 400)
        assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0
        # padded dims cover the scaled image
        assert img.shape[0] >= int(300 * scale) and img.shape[1] >= int(400 * scale)


def test_dedup_and_pad_proposals(rng):
    p = np.array([[0, 0, 64, 64], [0.01, 0, 64, 64], [100, 100, 200, 200]], np.float32)
    uniq, inv = T.dedup_proposals(p, 1.0 / 16)
    assert len(uniq) == 2
    assert inv.tolist() == [0, 0, 1]
    padded, valid = T.pad_proposals(uniq, 5)
    assert padded.shape == (5, 4)
    assert valid.tolist() == [True, True, False, False, False]
