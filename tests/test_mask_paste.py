import numpy as np

from detectorch_tpu.eval import mask_paste as MP
from detectorch_tpu.eval import rle as R


def test_full_mask_fills_box():
    masks = np.ones((1, 14, 14), np.float32)
    boxes = np.array([[20.0, 30.0, 60.0, 70.0]])
    rles = MP.segm_results(masks, boxes, 100, 100, 14)
    m = R.decode(rles[0])
    # interior of the box must be filled
    assert m[50, 40] == 1
    # well outside must be empty
    assert m[10, 10] == 0 and m[90, 90] == 0
    # mask roughly matches box area (expanded by (M+2)/M and binarized)
    assert 0.8 * 41 * 41 < m.sum() < 1.4 * 47 * 47


def test_mask_clips_at_image_boundary():
    masks = np.ones((1, 14, 14), np.float32)
    boxes = np.array([[-10.0, -10.0, 20.0, 20.0]])  # extends past top-left
    rles = MP.segm_results(masks, boxes, 50, 50, 14)
    m = R.decode(rles[0])
    assert m.shape == (50, 50)
    assert m[0, 0] == 1  # clipped corner still painted
    assert m[49, 49] == 0


def test_empty_mask_is_empty():
    masks = np.zeros((2, 28, 28), np.float32)
    boxes = np.array([[10.0, 10.0, 30.0, 30.0], [5.0, 5.0, 20.0, 20.0]])
    rles = MP.segm_results(masks, boxes, 40, 40, 28)
    assert R.area(rles[0]) == 0 and R.area(rles[1]) == 0


def test_reference_padding_geometry():
    # a one-hot center pixel: after 1-px pad + expand-box the painted area
    # must sit near the box center
    masks = np.zeros((1, 14, 14), np.float32)
    masks[0, 7, 7] = 1.0
    boxes = np.array([[30.0, 30.0, 58.0, 58.0]])  # 28x28 box, 2x upsample
    out = MP.segm_results(masks, boxes, 100, 100, 14, encode=False)
    ys, xs = np.nonzero(out[0])
    assert len(ys) > 0
    assert abs(ys.mean() - 45) < 4 and abs(xs.mean() - 45) < 4
