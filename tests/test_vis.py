"""Visualisation renderer tests: both backends write a real file.

The reference's `vis_one_image` (lib/utils/vis.py:251-392) is a matplotlib
renderer saving pdf/jpg with polygonised masks; `vis_one_image_opencv`
(:201-248) draws directly on the image. We test both of ours render a
synthetic detection set with masks and produce non-empty output, and that
the matplotlib path honours the reference's "nothing above thresh -> no
file" early return (:263-264).
"""

import os

import numpy as np
import pytest

from detectorch_tpu.eval import rle as rle_mod
from detectorch_tpu.utils.vis import (
    vis_one_image,
    vis_one_image_matplotlib,
    vis_one_image_opencv,
)


@pytest.fixture
def dets():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    boxes = np.array([[10, 10, 70, 60], [80, 30, 150, 110]], np.float32)
    scores = np.array([0.95, 0.8], np.float32)
    classes = np.array([1, 17], np.int64)
    masks = []
    for x1, y1, x2, y2 in boxes.astype(int):
        m = np.zeros((120, 160), np.uint8)
        m[y1 + 5:y2 - 5, x1 + 5:x2 - 5] = 1
        masks.append(rle_mod.encode(np.asfortranarray(m)))
    return img, boxes, scores, classes, masks


def test_opencv_renderer_draws(dets):
    img, boxes, scores, classes, rles = dets
    out = vis_one_image_opencv(img, boxes, scores, classes, rles, thresh=0.5)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()  # something was drawn


def test_opencv_renderer_saves(dets, tmp_path):
    img, boxes, scores, classes, rles = dets
    path = str(tmp_path / "out.jpg")
    vis_one_image(img, boxes, scores, classes, rles, thresh=0.5,
                  output_path=path)
    assert os.path.getsize(path) > 1000


def test_opencv_renderer_draws_keypoints(dets):
    """Skeleton rendering (reference vis.py:140-196): keypoints above the
    logit threshold change pixels; all below threshold change nothing."""
    from detectorch_tpu.utils.vis import vis_keypoints

    img, boxes, scores, classes, _ = dets
    rng = np.random.RandomState(5)
    kps = np.zeros((2, 17, 4), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        kps[i, :, 0] = rng.uniform(x1, x2, 17)
        kps[i, :, 1] = rng.uniform(y1, y2, 17)
        kps[i, :, 2] = 5.0  # logit above kp_thresh=2
        kps[i, :, 3] = 0.9
    out = vis_one_image_opencv(
        img, boxes, scores, classes, keypoints=kps, thresh=0.5,
    )
    assert (out != img).any()

    cold = kps.copy()
    cold[:, :, 2] = -5.0  # everything below threshold: no skeleton at all
    unchanged = vis_keypoints(img, cold[0])
    assert (unchanged == img).all()


@pytest.mark.parametrize("ext", ["pdf", "png"])
def test_matplotlib_renderer_saves(dets, tmp_path, ext):
    img, boxes, scores, classes, rles = dets
    saved = vis_one_image_matplotlib(
        img, boxes, scores, classes, rles, thresh=0.5,
        output_dir=str(tmp_path), im_name="sample", ext=ext,
    )
    assert saved == str(tmp_path / f"sample.{ext}")
    assert os.path.getsize(saved) > 1000
    if ext == "pdf":
        with open(saved, "rb") as f:
            assert f.read(5) == b"%PDF-"


def test_matplotlib_renderer_draws_keypoints(dets, tmp_path):
    """The matplotlib backend renders keypoint skeletons too (demo parity
    with the cv2 backend): passing keypoints must change the raster."""
    img, boxes, scores, classes, rles = dets
    # person-keypoint payload: (N, 17, 4) rows [x, y, logit, prob], all
    # confidently above kp_thresh, spread inside each box
    rng = np.random.RandomState(7)
    kps = np.zeros((len(boxes), 17, 4), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        kps[i, :, 0] = rng.uniform(x1, x2, 17)
        kps[i, :, 1] = rng.uniform(y1, y2, 17)
        kps[i, :, 2] = 10.0
        kps[i, :, 3] = 0.99
    with_kp = vis_one_image_matplotlib(
        img, boxes, scores, classes, rles, kps, thresh=0.5,
        output_dir=str(tmp_path), im_name="kp", ext="png",
    )
    without = vis_one_image_matplotlib(
        img, boxes, scores, classes, rles, thresh=0.5,
        output_dir=str(tmp_path), im_name="nokp", ext="png",
    )
    import cv2

    a = cv2.imread(with_kp)
    b = cv2.imread(without)
    assert a.shape == b.shape and (a != b).any()


def test_matplotlib_below_thresh_writes_nothing(dets, tmp_path):
    img, boxes, scores, classes, rles = dets
    saved = vis_one_image_matplotlib(
        img, boxes, scores, classes, rles, thresh=0.99,
        output_dir=str(tmp_path), im_name="sample",
    )
    assert saved is None
    assert not os.listdir(tmp_path)
