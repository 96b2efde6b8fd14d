"""End-to-end single-image smoke tests for every README preset, random
weights, tiny inputs. Verifies the whole program traces, runs, and produces
well-formed padded outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig
from detectorch_tpu.models.detector import init_params, make_inference_fn


def small_cfg(name):
    cfg = PRESETS[name]
    # shrink padded-shape knobs so CPU tests stay fast
    cfg = cfg.replace(
        rpn=RPNConfig(pre_nms_top_n=200, post_nms_top_n=50),
        compute_dtype="float32",
    )
    return cfg


TEST_CFG = TestConfig(detections_per_img=10, max_proposals=50)


@pytest.mark.parametrize("name", list(PRESETS))
def test_preset_end_to_end(name, rng):
    cfg = small_cfg(name)
    params = init_params(cfg, seed=0)
    fwd = jax.jit(make_inference_fn(cfg, TEST_CFG))

    h = w = 128  # divisible by 32
    image = rng.randn(h, w, 3).astype(np.float32) * 10
    if cfg.use_rpn:
        out = fwd(params, image, jnp.float32(1.6), jnp.float32(80.0), jnp.float32(80.0))
    else:
        proposals = np.stack(
            [
                rng.uniform(0, w / 2, 50),
                rng.uniform(0, h / 2, 50),
                rng.uniform(w / 2, w - 1, 50),
                rng.uniform(h / 2, h - 1, 50),
            ],
            axis=1,
        ).astype(np.float32)
        out = fwd(
            params, image, jnp.float32(1.6), jnp.float32(80.0), jnp.float32(80.0),
            proposals, np.ones(50, bool),
        )

    dets = out.detections
    k = TEST_CFG.detections_per_img + TEST_CFG.detections_tie_slack
    assert dets.boxes.shape == (k, 4)
    assert dets.scores.shape == (k,)
    assert dets.classes.shape == (k,)
    b = np.asarray(dets.boxes)
    assert np.isfinite(b).all()
    v = np.asarray(dets.valid)
    if v.any():
        # boxes clipped to original image, classes in range
        assert b[v].min() >= 0.0 and b[v].max() <= 80.0
        c = np.asarray(dets.classes)[v]
        assert (c >= 1).all() and (c <= 80).all()
        s = np.asarray(dets.scores)[v]
        assert (s > TEST_CFG.score_thresh).all()
    if cfg.use_mask:
        m = cfg.mask.resolution
        assert out.masks.shape == (k, m, m)
        mm = np.asarray(out.masks)
        assert np.isfinite(mm).all() and mm.min() >= 0.0 and mm.max() <= 1.0


def test_pallas_roi_align_path_matches_gather(rng):
    base = small_cfg("e2e_mask_rcnn_R-50-FPN_2x")
    params = init_params(base, seed=0)
    image = rng.randn(96, 128, 3).astype(np.float32) * 10
    args = (image, jnp.float32(1.0), jnp.float32(96.0), jnp.float32(128.0))
    a = jax.jit(make_inference_fn(base, TEST_CFG))(params, *args)
    cfg_p = base.replace(use_pallas_roi_align=True)
    b = jax.jit(make_inference_fn(cfg_p, TEST_CFG))(params, *args)
    # random test rois are square-ish: pallas path must agree with gather
    np.testing.assert_allclose(
        np.asarray(a.cls_scores), np.asarray(b.cls_scores), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.detections.boxes), np.asarray(b.detections.boxes),
        rtol=1e-3, atol=0.1,
    )
    np.testing.assert_allclose(
        np.asarray(a.masks), np.asarray(b.masks), rtol=1e-2, atol=1e-3
    )


def test_proposals_respect_scaled_image_bounds(rng):
    """Anchors over the shape-bucket padding must not emit proposals: clip/
    filter bounds are the actual resized-image dims (reference blob dims),
    not the bucket. Image here occupies 64x64 of a 96x128 bucket."""
    cfg = small_cfg("e2e_faster_rcnn_R-50-FPN_2x")
    params = init_params(cfg, seed=0)
    fwd = jax.jit(make_inference_fn(cfg, TEST_CFG))
    image = np.zeros((96, 128, 3), np.float32)
    image[:64, :64] = rng.randn(64, 64, 3) * 10
    out = fwd(params, image, jnp.float32(2.0), jnp.float32(32.0), jnp.float32(32.0))
    valid = np.asarray(out.roi_valid)
    rois = np.asarray(out.rois)[valid]
    if len(rois):
        cx = (rois[:, 0] + rois[:, 2] + 1) / 2
        cy = (rois[:, 1] + rois[:, 3] + 1) / 2
        # FPN bounds: ceil32(round(32*2)) = 64
        assert cx.max() < 64.0 and cy.max() < 64.0
        assert rois[:, 2].max() <= 63.0 and rois[:, 3].max() <= 63.0


def test_detector_deterministic(rng):
    cfg = small_cfg("e2e_faster_rcnn_R-50-FPN_2x")
    params = init_params(cfg, seed=0)
    fwd = jax.jit(make_inference_fn(cfg, TEST_CFG))
    image = rng.randn(96, 128, 3).astype(np.float32) * 10
    a = fwd(params, image, jnp.float32(1.0), jnp.float32(96.0), jnp.float32(128.0))
    b = fwd(params, image, jnp.float32(1.0), jnp.float32(96.0), jnp.float32(128.0))
    np.testing.assert_array_equal(np.asarray(a.detections.boxes), np.asarray(b.detections.boxes))
    np.testing.assert_array_equal(np.asarray(a.detections.scores), np.asarray(b.detections.scores))
