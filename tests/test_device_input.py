"""Device-side preprocessing (data/device_input.py) vs the host cv2 path.

The host path is the parity-anchored one (cv2 INTER_LINEAR like reference
blob.py:57-87); the device path must reproduce it to float32 associativity
and produce identical end detections through the engine.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.data import transforms as T
from detectorch_tpu.data.device_input import device_preprocess, prepare_raw


def _host_blob(im, tcfg_kw=None):
    kw = dict(target_size=800, max_size=1333, pad_stride=32,
              buckets=T.DEFAULT_BUCKETS)
    kw.update(tcfg_kw or {})
    return T.preprocess_image(im, **kw)


@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (333, 500), (100, 1000)])
def test_resize_matches_cv2(rng, hw):
    im = rng.randint(0, 256, (*hw, 3)).astype(np.uint8)
    host, scale, _ = _host_blob(im)
    raw, m = prepare_raw(im)
    assert m["scale"] == scale
    t = m["tables"]
    dev = np.asarray(
        device_preprocess(
            raw, t["y_i0"], t["y_w1"], t["x_i0"], t["x_w1"],
            m["raw_h"], m["raw_w"], m["rsz_h"], m["rsz_w"],
        )
    )
    assert dev.shape == host.shape
    # valid region: float32-associativity agreement with cv2 on 0..255 pixels
    np.testing.assert_allclose(dev, host, atol=2e-2, rtol=0)
    # padding is exactly 0.0 (like the reference's zero-pad), not -mean
    rh, rw = m["rsz_h"], m["rsz_w"]
    assert (dev[rh:] == 0).all() and (dev[:, rw:] == 0).all()


def test_resized_dims_match_cv2(rng):
    # cv2 dsize uses round-half-to-even of src*scale; sweep odd sizes
    import cv2

    for h, w in [(427, 640), (481, 321), (639, 426), (213, 320)]:
        im = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        scale = T.compute_scale(h, w)
        ref = cv2.resize(im.astype(np.float32), None, None, fx=scale, fy=scale,
                         interpolation=cv2.INTER_LINEAR)
        _, m = prepare_raw(im)
        assert (m["rsz_h"], m["rsz_w"]) == ref.shape[:2]


def test_grayscale_broadcast(rng):
    im = rng.randint(0, 256, (240, 320)).astype(np.uint8)
    raw, m = prepare_raw(im)
    assert raw.shape[-1] == 3


def test_engine_device_preprocess_equals_host(rng):
    """Full-engine equivalence: same image through device_preprocess=True
    and =False produces the same detections (boxes to float tolerance,
    identical classes)."""
    from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig
    from detectorch_tpu.eval.engine import InferenceEngine
    from detectorch_tpu.models.detector import init_params

    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(
        rpn=RPNConfig(pre_nms_top_n=128, post_nms_top_n=64),
    )
    params = init_params(cfg, seed=3)
    im = rng.randint(0, 256, (200, 300, 3)).astype(np.uint8)

    host = InferenceEngine(cfg, TestConfig(detections_per_img=20), params)
    dev = InferenceEngine(
        cfg, TestConfig(detections_per_img=20, device_preprocess=True), params
    )
    rh = host.run_image(im)
    rd = dev.run_image(im)
    assert len(rh["scores"]) == len(rd["scores"])
    if len(rh["scores"]):
        np.testing.assert_array_equal(rh["classes"], rd["classes"])
        np.testing.assert_allclose(rd["boxes"], rh["boxes"], atol=0.1)
        np.testing.assert_allclose(rd["scores"], rh["scores"], atol=2e-3)
