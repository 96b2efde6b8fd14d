"""Sharding tests on the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.config import PRESETS, RPNConfig, TestConfig
from detectorch_tpu.models.detector import init_params
from detectorch_tpu.parallel import mesh as M


def small_cfg():
    return PRESETS["e2e_faster_rcnn_R-50-FPN_2x"].replace(
        rpn=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16),
        compute_dtype="float32",
    )


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = M.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = M.make_mesh(data_parallel=4, model_parallel=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_batched_inference_data_parallel(rng):
    cfg = small_cfg()
    tcfg = TestConfig(detections_per_img=5)
    params = init_params(cfg, seed=0)
    mesh = M.make_mesh()  # 8-way data parallel
    fn = M.make_batched_inference_fn(cfg, tcfg, mesh)

    b = 8
    images = (rng.randn(b, 64, 96, 3) * 10).astype(np.float32)
    scales = np.full(b, 1.0, np.float32)
    ohs = np.full(b, 64.0, np.float32)
    ows = np.full(b, 96.0, np.float32)
    sp = M.shard_params(params, mesh)
    sharded = M.shard_batch(mesh, images, scales, ohs, ows)
    out = fn(sp, *sharded)
    assert out.detections.boxes.shape == (b, 5 + tcfg.detections_tie_slack, 4)
    assert np.isfinite(np.asarray(out.detections.boxes)).all()

    # per-device results must equal single-device results
    single = M.make_batched_inference_fn(
        cfg, tcfg, M.make_mesh(devices=jax.devices()[:1])
    )
    out1 = single(params, images, scales, ohs, ows)
    np.testing.assert_allclose(
        np.asarray(out.detections.scores), np.asarray(out1.detections.scores),
        rtol=1e-4, atol=1e-5,
    )


def test_model_axis_fc_sharding(rng):
    cfg = small_cfg()
    tcfg = TestConfig(detections_per_img=5)
    params = init_params(cfg, seed=0)
    mesh = M.make_mesh(data_parallel=4, model_parallel=2)
    sp = M.shard_params(params, mesh)
    # fc6_w must actually be sharded over 'model'
    shard = sp["fc6_w"].sharding
    assert shard.spec == jax.sharding.PartitionSpec("model", None)
    fn = M.make_batched_inference_fn(cfg, tcfg, mesh)
    b = 4
    images = (rng.randn(b, 64, 64, 3) * 10).astype(np.float32)
    out = fn(
        sp, images, np.ones(b, np.float32),
        np.full(b, 64.0, np.float32), np.full(b, 64.0, np.float32),
    )
    assert np.isfinite(np.asarray(out.detections.scores)).all()
