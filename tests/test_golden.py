"""Golden regression test: fixed input + fixed seed -> stored detections.

The reference's de-facto integration test is golden-number COCO evaluation
(SURVEY §4); without the weights/data in this container, this pins the full
Mask R-CNN FPN program's output on a deterministic synthetic input so any
silent numeric regression in the pipeline trips CI. Regenerate with:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               import tests.test_golden as g; g.regen()"
(import-style execution, matching how pytest runs it — the __main__ path
produces subtly different XLA numerics).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig
from detectorch_tpu.models.detector import init_params, make_inference_fn

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mask_fpn_small.npz")


def _run():
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"].replace(
        compute_dtype="float32",
        rpn=RPNConfig(pre_nms_top_n=300, post_nms_top_n=64),
    )
    tcfg = TestConfig(detections_per_img=16, score_thresh=0.0)
    params = init_params(cfg, seed=123)
    rng = np.random.RandomState(5)
    image = (rng.randn(96, 128, 3) * 12).astype(np.float32)
    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    out = fwd(params, image, jnp.float32(1.2), jnp.float32(80.0), jnp.float32(106.0))
    # NOTE: with random weights the per-class scores are near-ties, so the
    # final top-K ordering is not stable across XLA builds; pin the
    # deterministic quantities instead: proposals, score/delta statistics,
    # and the detection score multiset.
    return {
        "rois": np.asarray(out.rois),
        "roi_valid": np.asarray(out.roi_valid),
        "cls_mean": np.asarray(out.cls_scores).mean(axis=0),
        "delta_std": np.asarray(out.bbox_deltas).std(),
        "det_scores_sorted": np.sort(
            np.asarray(out.detections.scores)[np.asarray(out.detections.valid)]
        ),
        "n_valid": np.asarray(out.detections.valid).sum(),
    }


def test_golden_mask_fpn():
    got = _run()
    assert os.path.exists(GOLDEN), "golden file missing — run: python tests/test_golden.py regen"
    exp = np.load(GOLDEN)
    np.testing.assert_array_equal(got["roi_valid"], exp["roi_valid"])
    np.testing.assert_allclose(got["rois"], exp["rois"], rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(got["cls_mean"], exp["cls_mean"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got["delta_std"], exp["delta_std"], rtol=1e-3)
    np.testing.assert_allclose(
        got["det_scores_sorted"], exp["det_scores_sorted"], rtol=1e-3, atol=1e-5
    )
    assert got["n_valid"] == exp["n_valid"]


def regen():
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **_run())
    print(f"wrote {GOLDEN}")
