import numpy as np
import jax.numpy as jnp

from detectorch_tpu.ops import boxes as B
from tests.oracles import np_bbox_transform


def random_boxes(rng, n, size=600.0):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, size / 2, n)
    h = rng.uniform(1, size / 2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_bbox_transform_matches_reference(rng):
    boxes = random_boxes(rng, 64)
    deltas = rng.randn(64, 4 * 5).astype(np.float32) * 2.0
    expected = np_bbox_transform(boxes, deltas, (10.0, 10.0, 5.0, 5.0))
    got = B.bbox_transform(jnp.asarray(boxes), jnp.asarray(deltas), (10.0, 10.0, 5.0, 5.0))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-3)


def test_bbox_transform_exp_clip(rng):
    boxes = random_boxes(rng, 4)
    deltas = np.full((4, 4), 100.0, np.float32)  # huge dw/dh must clip
    got = np.asarray(B.bbox_transform(boxes, deltas))
    assert np.all(np.isfinite(got))
    expected = np_bbox_transform(boxes, deltas)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bbox_transform_inv_roundtrip(rng):
    src = random_boxes(rng, 32)
    dst = random_boxes(rng, 32)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = B.bbox_transform_inv(src, dst, w)
    rec = B.bbox_transform(src, np.asarray(deltas), w)
    np.testing.assert_allclose(np.asarray(rec), dst, rtol=1e-4, atol=1e-2)


def test_xywh_roundtrip(rng):
    b = random_boxes(rng, 16)
    np.testing.assert_allclose(
        np.asarray(B.xywh_to_xyxy(B.xyxy_to_xywh(b))), b, rtol=1e-6
    )


def test_clip_boxes_tiled(rng):
    b = rng.uniform(-200, 900, (8, 12)).astype(np.float32)  # 3 tiled boxes
    got = np.asarray(B.clip_boxes(b, 480.0, 640.0))
    assert got[:, 0::4].max() <= 639.0 and got[:, 0::4].min() >= 0.0
    assert got[:, 1::4].max() <= 479.0
    # interior values untouched
    inside = np.clip(b, 0, None)
    inside[:, 0::4] = np.clip(b[:, 0::4], 0, 639)
    inside[:, 1::4] = np.clip(b[:, 1::4], 0, 479)
    inside[:, 2::4] = np.clip(b[:, 2::4], 0, 639)
    inside[:, 3::4] = np.clip(b[:, 3::4], 0, 479)
    np.testing.assert_allclose(got, inside, rtol=1e-6)


def test_bbox_overlaps_plus_one_convention():
    a = np.array([[0.0, 0.0, 9.0, 9.0]], np.float32)  # 10x10 = 100 px
    b = np.array([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 14.0, 14.0], [20.0, 20.0, 30.0, 30.0]], np.float32)
    got = np.asarray(B.bbox_overlaps(a, b))
    # identical
    assert got[0, 0] == 1.0
    # overlap region 5..9 inclusive = 5x5=25; union 100+100-25
    np.testing.assert_allclose(got[0, 1], 25.0 / 175.0, rtol=1e-6)
    assert got[0, 2] == 0.0


def test_flip_boxes_involution(rng):
    b = random_boxes(rng, 16, size=300.0)
    f2 = B.flip_boxes(np.asarray(B.flip_boxes(b, 640.0)), 640.0)
    np.testing.assert_allclose(np.asarray(f2), b, rtol=1e-5, atol=1e-3)


def test_filter_boxes_mask():
    boxes = np.array(
        [
            [0, 0, 100, 100],  # fine
            [0, 0, 2, 2],      # too small for min_size=10
            [630, 470, 700, 500],  # center outside 640x480
        ],
        np.float32,
    )
    m = np.asarray(B.filter_boxes_mask(boxes, 10.0, 1.0, 480.0, 640.0))
    assert m.tolist() == [True, False, False]


def test_expand_boxes():
    b = np.array([[10.0, 20.0, 30.0, 60.0]], np.float32)
    got = np.asarray(B.expand_boxes(b, 2.0))
    np.testing.assert_allclose(got, [[0.0, 0.0, 40.0, 80.0]], rtol=1e-6)
