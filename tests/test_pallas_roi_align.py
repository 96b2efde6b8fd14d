"""Pallas RoIAlign kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.ops.pallas.roi_align_kernel import multilevel_roi_align_pallas
from detectorch_tpu.ops.roi_align import multilevel_roi_align


def make_levels(rng, shapes=((32, 48), (16, 24), (8, 12)), c=8):
    return [rng.randn(h, w, c).astype(np.float32) for h, w in shapes]


def test_pallas_matches_reference(rng):
    feats = make_levels(rng)
    scales = (0.25, 0.125, 0.0625)
    # square-ish rois that fit the slab on their level
    rois = np.array(
        [
            [10, 10, 60, 70],
            [4, 8, 100, 90],
            [0, 0, 180, 120],
            [40, 16, 52, 30],
        ],
        np.float32,
    )
    levels = np.array([0, 1, 2, 0], np.int32)
    got, fits = multilevel_roi_align_pallas(
        feats, rois, levels, scales, 7, 7, sampling_ratio=2,
        slab=32, interpret=True,
    )
    assert np.asarray(fits).all()
    exp = multilevel_roi_align(feats, rois, levels, scales, 7, 7, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-4, atol=1e-4)


def test_fwd_precision_modes(rng):
    """'bf16x3' (3 exact bf16 weight terms x bf16 slab) must sit at ~ulp of
    'exact' (fp32/HIGHEST) when features are bf16 — the products are exact in
    both, only fp32 accumulation order differs. 'bf16' is a loose fast tier."""
    import jax.numpy as jnp

    feats32 = make_levels(rng)
    feats = [jnp.asarray(f, jnp.bfloat16) for f in feats32]
    scales = (0.25, 0.125, 0.0625)
    rois = np.array(
        [[10, 10, 60, 70], [4, 8, 100, 90], [0, 0, 180, 120], [40, 16, 52, 30]],
        np.float32,
    )
    levels = np.array([0, 1, 2, 0], np.int32)
    outs = {}
    for fp in ("exact", "bf16x3", "bf16"):
        out, fits = multilevel_roi_align_pallas(
            feats, rois, levels, scales, 7, 7, sampling_ratio=2,
            slab=32, interpret=True, fwd_precision=fp,
        )
        assert np.asarray(fits).all()
        outs[fp] = np.asarray(out)
    np.testing.assert_allclose(outs["bf16x3"], outs["exact"], rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(outs["bf16"], outs["exact"], rtol=2e-2, atol=2e-2)
    # and the exact tier still matches the gather reference on the same bf16 inputs
    exp = multilevel_roi_align(feats, rois, levels, scales, 7, 7, 2)
    np.testing.assert_allclose(
        outs["exact"], np.asarray(exp, np.float32), rtol=1e-2, atol=1e-2)


def test_pallas_mask_resolution(rng):
    feats = make_levels(rng)
    scales = (0.25, 0.125, 0.0625)
    rois = np.array([[8, 8, 90, 100], [30, 20, 110, 95]], np.float32)
    levels = np.array([1, 1], np.int32)
    got, fits = multilevel_roi_align_pallas(
        feats, rois, levels, scales, 14, 14, sampling_ratio=2,
        slab=32, interpret=True,
    )
    assert np.asarray(fits).all()
    exp = multilevel_roi_align(feats, rois, levels, scales, 14, 14, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-4, atol=1e-4)


def test_pallas_roi_partially_outside(rng):
    feats = make_levels(rng)
    scales = (0.25, 0.125, 0.0625)
    rois = np.array([[-20, -20, 60, 50]], np.float32)  # crosses the top-left
    levels = np.array([0], np.int32)
    got, fits = multilevel_roi_align_pallas(
        feats, rois, levels, scales, 7, 7, sampling_ratio=2,
        slab=32, interpret=True,
    )
    assert np.asarray(fits).all()
    exp = multilevel_roi_align(feats, rois, levels, scales, 7, 7, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-4, atol=1e-4)


def test_pallas_reports_oversized_footprint(rng):
    feats = make_levels(rng)
    scales = (0.25, 0.125, 0.0625)
    # extreme aspect ratio: 360px wide at level 0 -> 90 feature px > slab 32
    rois = np.array([[0, 0, 360, 12]], np.float32)
    levels = np.array([0], np.int32)
    _, fits = multilevel_roi_align_pallas(
        feats, rois, levels, scales, 7, 7, sampling_ratio=2,
        slab=32, interpret=True,
    )
    assert not np.asarray(fits).any()


def test_slab_fits_matches_kernel_fits(rng):
    """The standalone slab_fits (the training paths' frac_rois_overflowed
    source) must agree with the fits mask the kernel itself computes, for
    in-slab, partially-outside, and oversized rois alike."""
    from detectorch_tpu.ops.pallas.roi_align_kernel import slab_fits

    feats = make_levels(rng)
    scales = (0.25, 0.125, 0.0625)
    rois = np.array(
        [
            [10, 10, 60, 70],       # in-slab
            [4, 8, 100, 90],        # in-slab, level 1
            [-20, -20, 60, 50],     # crosses the top-left
            [0, 0, 360, 12],        # 30:1 aspect -> overflows slab 32
            [40, 16, 52, 30],       # small
        ],
        np.float32,
    )
    levels = np.array([0, 1, 0, 0, 0], np.int32)
    _, kernel_fits = multilevel_roi_align_pallas(
        feats, rois, levels, scales, 7, 7, sampling_ratio=2,
        slab=32, interpret=True,
    )
    standalone = slab_fits(
        rois, levels, [f.shape[:2] for f in feats], scales, 7, 7,
        sampling_ratio=2, slab=32,
    )
    np.testing.assert_array_equal(np.asarray(standalone),
                                  np.asarray(kernel_fits))
    assert list(np.asarray(standalone)) == [True, True, True, False, True]


@pytest.mark.parametrize("bwd", ["gather", "slab"])
def test_fused_train_roi_align_grad_matches_gather(rng, bwd):
    """make_multilevel_roi_align_fused: Pallas forward + exact VJPs.
    The gradient wrt the feature maps must equal differentiating the gather
    formulation directly (bwd='gather' IS that VJP; bwd='slab' is the
    slab-domain Pallas kernel, exact for in-slab rois), and the forward
    must match the gather values for in-slab rois."""
    import jax
    import jax.numpy as jnp

    from detectorch_tpu.ops.roi_align import make_multilevel_roi_align_fused

    feats = make_levels(rng)
    scales = (0.25, 0.125, 0.0625)
    rois = np.array(
        [[8, 8, 80, 60], [40, 20, 120, 90], [4, 4, 30, 30]], np.float32
    )
    levels = np.array([0, 1, 0], np.int32)
    fused = make_multilevel_roi_align_fused(scales, 7, 7, 2, bwd=bwd)

    def loss_fused(fl):
        return jnp.sum(fused(fl, jnp.asarray(rois), jnp.asarray(levels)) ** 2)

    def loss_gather(fl):
        return jnp.sum(multilevel_roi_align(
            fl, jnp.asarray(rois), jnp.asarray(levels), scales, 7, 7, 2
        ) ** 2)

    out_f = fused([jnp.asarray(f) for f in feats],
                  jnp.asarray(rois), jnp.asarray(levels))
    out_g = multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois),
        jnp.asarray(levels), scales, 7, 7, 2)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_g),
                               rtol=1e-5, atol=1e-5)

    jf = [jnp.asarray(f) for f in feats]
    g_f = jax.grad(loss_fused)(jf)
    g_g = jax.grad(loss_gather)(jf)
    for a, b in zip(g_f, g_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_train_fwd_tier_keeps_exact_vjp(rng):
    """The training wrapper's VJP differentiates the exact formulation
    regardless of the forward tier: gradients under fwd_precision='bf16x3'
    must be BIT-IDENTICAL to 'exact' (same custom_vjp backward), while the
    forwards differ only by accumulation order on bf16 features."""
    import jax
    import jax.numpy as jnp

    from detectorch_tpu.ops.roi_align import make_multilevel_roi_align_fused

    feats = [jnp.asarray(f, jnp.bfloat16) for f in make_levels(rng)]
    scales = (0.25, 0.125, 0.0625)
    rois = jnp.asarray(
        [[8, 8, 80, 60], [40, 20, 120, 90], [4, 4, 30, 30]], jnp.float32)
    levels = jnp.asarray([0, 1, 0], jnp.int32)

    outs, grads = {}, {}
    for fp in ("exact", "bf16x3"):
        fused = make_multilevel_roi_align_fused(
            scales, 7, 7, 2, bwd="gather", fwd_precision=fp)

        def loss(fl):
            return jnp.sum(fused(fl, rois, levels).astype(jnp.float32) ** 2)

        outs[fp] = np.asarray(fused(feats, rois, levels), np.float32)
        grads[fp] = [np.asarray(g, np.float32)
                     for g in jax.grad(loss)(feats)]
    np.testing.assert_allclose(outs["bf16x3"], outs["exact"],
                               rtol=2e-6, atol=2e-6)
    # the cotangent of sum(out**2) is 2*out — it differs between tiers by
    # the forward's ~ulp delta, so grads match to that tolerance (the VJP
    # rule itself is the identical exact formulation)
    for a, b in zip(grads["bf16x3"], grads["exact"]):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-4)


def _gather_vjp_grads(feats, rois, levels, scales, ph, g):
    """Exact feature cotangent via differentiating the gather formulation."""
    import jax
    import jax.numpy as jnp

    def pooled(fl):
        return multilevel_roi_align(
            fl, jnp.asarray(rois), jnp.asarray(levels), scales, ph, ph, 2)

    _, vjp = jax.vjp(pooled, [jnp.asarray(f) for f in feats])
    (gf,) = vjp(jnp.asarray(g))
    return gf


@pytest.mark.parametrize("ph", [7, 14])
def test_slab_grad_matches_gather_vjp(rng, ph):
    """The slab-domain Pallas backward equals the exact gather VJP for
    in-slab rois (fp32/HIGHEST per-roi matmuls; only summation order
    differs)."""
    from detectorch_tpu.ops.pallas.roi_align_kernel import (
        multilevel_roi_align_slab_grad,
        slab_fits,
    )

    feats = make_levels(rng)
    scales = (0.25, 0.125, 0.0625)
    rois = np.array(
        [[8, 8, 80, 60], [40, 20, 120, 90], [4, 4, 34, 30],
         [16, 12, 70, 88], [30, 30, 96, 80]],
        np.float32,
    )
    levels = np.array([0, 1, 0, 1, 2], np.int32)
    assert np.asarray(slab_fits(
        rois, levels, [f.shape[:2] for f in feats], scales, ph, ph, 2,
        slab=32)).all()
    g = rng.randn(len(rois), ph, ph, feats[0].shape[-1]).astype(np.float32)
    got = multilevel_roi_align_slab_grad(
        g, [f.shape for f in feats], rois, levels, scales, ph, ph, 2,
        slab=32, interpret=True,
    )
    exp = _gather_vjp_grads(feats, rois, levels, scales, ph, g)
    for a, b in zip(got, exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_slab_grad_vmapped_matches_per_image(rng):
    """vmap of the slab backward (the e2e train path batches per image)
    equals the per-image results — exercises the carry accumulator's reset
    across the prepended batch grid dim."""
    import jax
    import jax.numpy as jnp

    from detectorch_tpu.ops.pallas.roi_align_kernel import (
        multilevel_roi_align_slab_grad,
    )

    scales = (0.25, 0.125, 0.0625)
    bsz, n, ph = 3, 6, 7
    feats_b = [np.stack([f, f * 0 + 1.0, f * 2.0])
               for f in make_levels(rng)]
    rois_b = np.stack([
        np.array([[8, 8, 80, 60], [40, 20, 120, 90], [4, 4, 34, 30],
                  [16, 12, 70, 88], [30, 30, 96, 80], [10, 40, 80, 100]],
                 np.float32) + 2.0 * b
        for b in range(bsz)
    ])
    levels_b = np.stack([
        np.array([0, 1, 0, 1, 2, 1], np.int32) for _ in range(bsz)
    ])
    g_b = rng.randn(bsz, n, ph, ph, feats_b[0].shape[-1]).astype(np.float32)
    shapes = [f.shape[1:] for f in feats_b]

    def one(r, lv, g):
        return multilevel_roi_align_slab_grad(
            g, shapes, r, lv, scales, ph, ph, 2, slab=32, interpret=True)

    got = jax.vmap(one)(jnp.asarray(rois_b), jnp.asarray(levels_b),
                        jnp.asarray(g_b))
    for b in range(bsz):
        exp = one(rois_b[b], levels_b[b], g_b[b])
        for a, e in zip(got, exp):
            np.testing.assert_allclose(np.asarray(a[b]), np.asarray(e),
                                       rtol=1e-5, atol=1e-6)
