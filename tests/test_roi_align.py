import numpy as np
import jax

from detectorch_tpu.ops import roi_align as R
from tests.oracles import np_roi_align


def make_case(rng, h=24, w=32, c=8, n=12, img_scale=16.0):
    feats = rng.randn(h, w, c).astype(np.float32)
    x1 = rng.uniform(0, w * img_scale * 0.8, n)
    y1 = rng.uniform(0, h * img_scale * 0.8, n)
    x2 = x1 + rng.uniform(4, w * img_scale * 0.5, n)
    y2 = y1 + rng.uniform(4, h * img_scale * 0.5, n)
    rois = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
    return feats, rois


def check_against_oracle(got_nhwc, feats_hwc, rois, ph, pw, scale, sr):
    expected = np_roi_align(
        feats_hwc.transpose(2, 0, 1).astype(np.float64), rois, ph, pw, scale, sr
    )
    got = np.asarray(got_nhwc).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_gather_matches_cpp_oracle_sr2(rng):
    feats, rois = make_case(rng)
    got = R.roi_align_gather(feats, rois, 7, 7, 1.0 / 16, sampling_ratio=2)
    check_against_oracle(got, feats, rois, 7, 7, 1.0 / 16, 2)


def test_gather_matches_cpp_oracle_adaptive(rng):
    feats, rois = make_case(rng)
    got = R.roi_align_gather(feats, rois, 7, 7, 1.0 / 16, sampling_ratio=0, max_grid=8)
    check_against_oracle(got, feats, rois, 7, 7, 1.0 / 16, 0)


def test_matmul_matches_cpp_oracle_sr2(rng):
    feats, rois = make_case(rng)
    got = R.roi_align_matmul(feats, rois, 7, 7, 1.0 / 16, sampling_ratio=2)
    check_against_oracle(got, feats, rois, 7, 7, 1.0 / 16, 2)


def test_matmul_matches_cpp_oracle_adaptive(rng):
    feats, rois = make_case(rng)
    got = R.roi_align_matmul(feats, rois, 14, 14, 1.0 / 16, sampling_ratio=0, max_grid=8)
    check_against_oracle(got, feats, rois, 14, 14, 1.0 / 16, 0)


def test_malformed_roi_forced_1x1(rng):
    feats, _ = make_case(rng)
    rois = np.array([[100.0, 100.0, 100.0, 100.0]], np.float32)  # zero size
    for fn in (R.roi_align_gather, R.roi_align_matmul):
        got = fn(feats, rois, 7, 7, 1.0 / 16, sampling_ratio=2)
        check_against_oracle(got, feats, rois, 7, 7, 1.0 / 16, 2)


def test_roi_partially_outside(rng):
    feats, _ = make_case(rng)
    # extends past the image: out-of-range samples contribute zero but count
    rois = np.array([[-50.0, -50.0, 600.0, 500.0]], np.float32)
    for fn in (R.roi_align_gather, R.roi_align_matmul):
        got = fn(feats, rois, 7, 7, 1.0 / 16, sampling_ratio=2)
        check_against_oracle(got, feats, rois, 7, 7, 1.0 / 16, 2)


def test_multilevel_atlas_matches_per_level(rng):
    # two levels with different shapes packed into one atlas
    h2, w2, c = 16, 20, 8
    h3, w3 = 8, 10
    f2 = rng.randn(h2, w2, c).astype(np.float32)
    f3 = rng.randn(h3, w3, c).astype(np.float32)
    atlas = np.zeros((2, h2, w2, c), np.float32)
    atlas[0] = f2
    atlas[1, :h3, :w3] = f3
    rois = np.array(
        [[10, 10, 60, 60], [5, 5, 120, 100], [0, 0, 30, 40]], np.float32
    )
    levels = np.array([0, 1, 0], np.int32)
    got = R.multilevel_roi_align_gather(
        atlas, rois, levels,
        level_scales=(0.25, 0.125),
        level_shapes=((h2, w2), (h3, w3)),
        pooled_h=7, pooled_w=7, sampling_ratio=2,
    )
    exp0 = np_roi_align(f2.transpose(2, 0, 1), rois[[0]], 7, 7, 0.25, 2)
    exp1 = np_roi_align(f3.transpose(2, 0, 1), rois[[1]], 7, 7, 0.125, 2)
    exp2 = np_roi_align(f2.transpose(2, 0, 1), rois[[2]], 7, 7, 0.25, 2)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got[0], exp0[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], exp1[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[2], exp2[0], rtol=1e-4, atol=1e-4)


def test_multilevel_list_matches_per_level(rng):
    # production (row-concatenated) variant, 3 levels of different shapes
    shapes = [(16, 20), (8, 10), (4, 5)]
    c = 8
    feats = [rng.randn(h, w, c).astype(np.float32) for h, w in shapes]
    scales = (0.25, 0.125, 0.0625)
    rois = np.array(
        [[10, 10, 60, 60], [5, 5, 120, 100], [0, 0, 30, 40], [2, 2, 70, 50]],
        np.float32,
    )
    levels = np.array([0, 1, 2, 0], np.int32)
    got = np.asarray(
        R.multilevel_roi_align(
            feats, rois, levels, scales, pooled_h=7, pooled_w=7, sampling_ratio=2
        )
    ).transpose(0, 3, 1, 2)
    for i in range(len(rois)):
        lvl = levels[i]
        exp = np_roi_align(
            feats[lvl].transpose(2, 0, 1), rois[[i]], 7, 7, scales[lvl], 2
        )
        np.testing.assert_allclose(got[i], exp[0], rtol=1e-4, atol=1e-4)


def test_roi_align_differentiable(rng):
    feats, rois = make_case(rng, n=4)

    def loss(f):
        out = R.roi_align_gather(f, rois, 7, 7, 1.0 / 16, sampling_ratio=2)
        return (out ** 2).sum()

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one coordinate
    eps = 1e-3
    i, j, k = 5, 7, 2
    fp = feats.copy(); fp[i, j, k] += eps
    fm = feats.copy(); fm[i, j, k] -= eps
    num = (loss(fp) - loss(fm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[i, j, k], num, rtol=1e-2, atol=1e-2)


def test_dispatcher_auto(rng):
    feats, rois = make_case(rng, c=8)
    a = R.roi_align(feats, rois, 7, 7, 1.0 / 16, 2, method="gather")
    b = R.roi_align(feats, rois, 7, 7, 1.0 / 16, 2, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_matmul_roi_chunking_exact(rng):
    # N > roi_chunk exercises the lax.map chunked path (incl. the padded
    # tail chunk); results must be bit-identical to the unchunked form.
    feats, rois = make_case(rng, n=37)
    a = R.roi_align_matmul(feats, rois, 7, 7, 1.0 / 16, 2, roi_chunk=16)
    b = R.roi_align_matmul(feats, rois, 7, 7, 1.0 / 16, 2, roi_chunk=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_feature_grad_matmul_matches_gather_vjp(rng):
    """multilevel_roi_align_feature_grad (separable-matmul backward) must
    equal the gather formulation's VJP at the fp32/HIGHEST tier — including
    level masking, chunking (N > roi_chunk), and out-of-image samples."""
    import jax.numpy as jnp

    shapes = [(16, 20), (8, 10), (4, 5)]
    c = 8
    feats = [rng.randn(h, w, c).astype(np.float32) for h, w in shapes]
    scales = (0.25, 0.125, 0.0625)
    n = 9
    rois = np.stack([
        rng.uniform(-8, 30, n), rng.uniform(-8, 30, n),
        rng.uniform(32, 80, n), rng.uniform(32, 80, n),
    ], axis=1).astype(np.float32)
    levels = rng.randint(0, 3, n).astype(np.int32)
    g = rng.randn(n, 7, 7, c).astype(np.float32)

    jf = [jnp.asarray(f) for f in feats]
    _, vjp = jax.vjp(
        lambda fl: R.multilevel_roi_align(
            fl, jnp.asarray(rois), jnp.asarray(levels), scales, 7, 7, 2),
        jf,
    )
    (want,) = vjp(jnp.asarray(g))

    got = R.multilevel_roi_align_feature_grad(
        jnp.asarray(g), [f.shape for f in feats], jnp.asarray(rois),
        jnp.asarray(levels), scales, 7, 7, 2,
        roi_chunk=4,  # forces the chunked-scan path incl. the padded tail
        tmp_dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # the production bf16 tier: same answer to ~bf16 rounding of the weights
    fast = R.multilevel_roi_align_feature_grad(
        jnp.asarray(g), [f.shape for f in feats], jnp.asarray(rois),
        jnp.asarray(levels), scales, 7, 7, 2,
    )
    for a, b in zip(fast, want):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-2)
