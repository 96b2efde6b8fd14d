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


def test_native_matches_python(rng):
    """When the C++ extension is built, its results must match the pure
    Python implementations exactly."""
    try:
        import detectorch_tpu_rle_native as native
    except ImportError:
        import pytest

        pytest.skip("native extension not built")
    for _ in range(3):
        a = [R.encode_counts(random_mask(rng, 33, 47)) for _ in range(3)]
        b = [R.encode_counts(random_mask(rng, 33, 47)) for _ in range(2)]
        crowd = [False, True]
        got = native.iou_matrix(
            [np.asarray(x, np.int64) for x in a],
            [np.asarray(x, np.int64) for x in b],
            crowd,
        )
        exp = np.zeros((3, 2))
        for i in range(3):
            for j in range(2):
                ia = R._one_intervals(a[i])
                ib = R._one_intervals(b[j])
                inter = R._interval_intersection(ia, ib)
                da = (ia[:, 1] - ia[:, 0]).sum()
                db = (ib[:, 1] - ib[:, 0]).sum()
                denom = da if crowd[j] else da + db - inter
                exp[i, j] = inter / denom if denom else 0.0
        np.testing.assert_allclose(got, exp, rtol=1e-12)
        # codec equality
        for c in a:
            s_py = "".join(
                R.counts_to_string.__wrapped__(c)
                if hasattr(R.counts_to_string, "__wrapped__")
                else _python_counts_to_string(c)
            )
            assert native.counts_to_string(np.asarray(c, np.int64)) == s_py
            assert native.string_to_counts(s_py).tolist() == list(c)


def _python_counts_to_string(counts):
    s = []
    cnts = list(counts)
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return "".join(s)


def test_merge_union(rng):
    a = random_mask(rng, 12, 12)
    b = random_mask(rng, 12, 12)
    merged = R.merge_union([R.encode(a), R.encode(b)])
    np.testing.assert_array_equal(R.decode(merged), np.logical_or(a, b).astype(np.uint8))


def test_encode_pasted_matches_canvas_encode(rng):
    """Strip/native paste-encode must be byte-identical to encoding the full
    pasted canvas (the hot path of segm_results; result_utils.py:218-221)."""
    for _ in range(100):
        im_h, im_w = rng.randint(5, 100), rng.randint(5, 100)
        bh, bw = rng.randint(1, im_h + 1), rng.randint(1, im_w + 1)
        x0 = rng.randint(0, im_w - bw + 1)
        y0 = rng.randint(0, im_h - bh + 1)
        patch = (rng.rand(bh, bw) > rng.uniform(0.02, 0.98)).astype(np.uint8)
        canvas = np.zeros((im_h, im_w), np.uint8)
        canvas[y0:y0 + bh, x0:x0 + bw] = patch
        assert R.encode(canvas) == R.encode_pasted(patch, x0, y0, im_h, im_w)
    # edges: full-canvas patch, all-ones (column-wrap run merging), empty
    full = np.ones((7, 4), np.uint8)
    assert R.encode(full) == R.encode_pasted(full, 0, 0, 7, 4)
    assert R.encode(np.zeros((6, 9), np.uint8)) == R.encode_pasted(
        np.zeros((0, 0), np.uint8), 0, 0, 6, 9
    )


def test_encode_pasted_python_fallback(rng, monkeypatch):
    monkeypatch.setattr(R, "_native", None)
    for _ in range(30):
        im_h, im_w = rng.randint(5, 60), rng.randint(5, 60)
        bh, bw = rng.randint(1, im_h + 1), rng.randint(1, im_w + 1)
        x0 = rng.randint(0, im_w - bw + 1)
        y0 = rng.randint(0, im_h - bh + 1)
        patch = (rng.rand(bh, bw) > 0.5).astype(np.uint8)
        canvas = np.zeros((im_h, im_w), np.uint8)
        canvas[y0:y0 + bh, x0:x0 + bw] = patch
        assert R.encode(canvas) == R.encode_pasted(patch, x0, y0, im_h, im_w)
