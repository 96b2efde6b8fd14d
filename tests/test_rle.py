import numpy as np

from detectorch_tpu.eval import rle as R


def random_mask(rng, h=40, w=30, p=0.3):
    return (rng.uniform(size=(h, w)) < p).astype(np.uint8)


def test_counts_roundtrip(rng):
    for _ in range(5):
        m = random_mask(rng)
        c = R.encode_counts(m)
        np.testing.assert_array_equal(R.decode_counts(c, *m.shape), m)


def test_counts_start_with_zero_run():
    m = np.ones((3, 3), np.uint8)
    c = R.encode_counts(m)
    assert c[0] == 0 and c[1] == 9


def test_string_codec_known_values():
    # varint spec hand-checks: single 5-bit chunks map to chr(48+v)
    assert R.counts_to_string([1, 3]) == "13"
    assert R.string_to_counts("13") == [1, 3]
    # maskApi only applies second-order differences from index 3 onward
    # (rleToString's `if i > 2`), so [5,3,5,3] -> [5,3,5,0] -> "5350"
    assert R.counts_to_string([5, 3, 5, 3]) == "5350"
    assert R.string_to_counts("5350") == [5, 3, 5, 3]


def test_string_codec_roundtrip(rng):
    for _ in range(5):
        m = random_mask(rng, 57, 43)
        rle = R.encode(m)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(R.decode(rle), m)


def test_string_codec_negative_diffs():
    counts = [10, 2, 1, 50, 3, 1]  # forces negative second-order diffs
    s = R.counts_to_string(counts)
    assert R.string_to_counts(s) == counts


def test_area_and_bbox(rng):
    m = np.zeros((20, 30), np.uint8)
    m[5:10, 8:20] = 1
    rle = R.encode(m)
    assert R.area(rle) == 5 * 12
    np.testing.assert_array_equal(R.to_bbox(rle), [8, 5, 12, 5])


def test_rle_iou_matches_dense(rng):
    masks_a = [random_mask(rng, 25, 25) for _ in range(3)]
    masks_b = [random_mask(rng, 25, 25) for _ in range(2)]
    dts = [R.encode(m) for m in masks_a]
    gts = [R.encode(m) for m in masks_b]
    got = R.rle_iou(dts, gts, [False, False])
    for i, ma in enumerate(masks_a):
        for j, mb in enumerate(masks_b):
            inter = np.logical_and(ma, mb).sum()
            union = np.logical_or(ma, mb).sum()
            np.testing.assert_allclose(got[i, j], inter / union, rtol=1e-9)


def test_rle_iou_crowd_semantics(rng):
    a = np.zeros((10, 10), np.uint8)
    a[0:5, 0:5] = 1          # dt area 25
    b = np.ones((10, 10), np.uint8)  # crowd gt covers everything
    got = R.rle_iou([R.encode(a)], [R.encode(b)], [True])
    np.testing.assert_allclose(got[0, 0], 1.0)  # inter/dt_area
    got = R.rle_iou([R.encode(a)], [R.encode(b)], [False])
    np.testing.assert_allclose(got[0, 0], 0.25)


def test_polygons_to_mask_square():
    m = R.polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.sum() >= 36  # at least the 6x6 interior (+ boundary conventions)


def test_segmentation_to_rle_variants(rng):
    m = random_mask(rng, 15, 18)
    counts = R.encode_counts(m)
    # uncompressed dict form
    out = R.segmentation_to_rle({"size": [15, 18], "counts": counts}, 15, 18)
    np.testing.assert_array_equal(R.decode(out), m)
    # compressed passthrough
    out2 = R.segmentation_to_rle(R.encode(m), 15, 18)
    np.testing.assert_array_equal(R.decode(out2), m)


def test_merge_union(rng):
    a = random_mask(rng, 12, 12)
    b = random_mask(rng, 12, 12)
    merged = R.merge_union([R.encode(a), R.encode(b)])
    np.testing.assert_array_equal(R.decode(merged), np.logical_or(a, b).astype(np.uint8))
