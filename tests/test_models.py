import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)
import torch
import torch.nn.functional as F

from detectorch_tpu.models import resnet as RN
from detectorch_tpu.models import fpn as FPN
from detectorch_tpu.models import heads as HD


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_conv_stride2_pad1_matches_torch(rng):
    # XLA 'SAME' would misplace stride-2 windows on even sizes; explicit
    # padding must reproduce torch geometry exactly.
    for h, w in [(16, 16), (15, 17), (14, 15)]:
        x = rng.randn(1, h, w, 8).astype(np.float32)
        k = rng.randn(3, 3, 8, 4).astype(np.float32)
        got = np.asarray(RN.conv(jnp.asarray(x), jnp.asarray(k), stride=2, pad=1))
        exp = F.conv2d(
            t(x).permute(0, 3, 1, 2), t(k).permute(3, 2, 0, 1), stride=2, padding=1
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


def test_conv7x7_stride2_matches_torch(rng):
    x = rng.randn(1, 33, 35, 3).astype(np.float32)
    k = rng.randn(7, 7, 3, 16).astype(np.float32)
    got = np.asarray(RN.conv(jnp.asarray(x), jnp.asarray(k), stride=2, pad=3))
    exp = F.conv2d(
        t(x).permute(0, 3, 1, 2), t(k).permute(3, 2, 0, 1), stride=2, padding=3
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch(rng):
    for h, w in [(16, 16), (15, 17)]:
        x = rng.randn(1, h, w, 4).astype(np.float32)
        got = np.asarray(RN.max_pool_3x3s2(jnp.asarray(x)))
        exp = F.max_pool2d(t(x).permute(0, 3, 1, 2), 3, stride=2, padding=1)
        exp = exp.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def _torch_bottleneck(params, x_nchw, prefix, stride, has_proj):
    """Reference-geometry bottleneck in torch: stride on branch2a (caffe2
    placement, reference detector.py:174-179), affine BN."""

    def cb(x, name, stride=1, pad=0):
        w = t(params[f"{name}_w"]).permute(3, 2, 0, 1)
        x = F.conv2d(x, w, stride=stride, padding=pad)
        s = t(params[f"{name}_bn_s"]).view(1, -1, 1, 1)
        b = t(params[f"{name}_bn_b"]).view(1, -1, 1, 1)
        return x * s + b

    shortcut = x_nchw
    if has_proj:
        shortcut = cb(x_nchw, f"{prefix}_branch1", stride=stride)
    out = F.relu(cb(x_nchw, f"{prefix}_branch2a", stride=stride))
    out = F.relu(cb(out, f"{prefix}_branch2b", stride=1, pad=1))
    out = cb(out, f"{prefix}_branch2c")
    return F.relu(out + shortcut)


def test_bottleneck_matches_torch(rng):
    params = RN.init_resnet_params("resnet50")
    # randomize the bn scales so affine isn't identity
    for k in list(params):
        if k.endswith("_bn_s"):
            params[k] = rng.uniform(0.5, 1.5, params[k].shape).astype(np.float32)
        if k.endswith("_bn_b"):
            params[k] = rng.randn(*params[k].shape).astype(np.float32) * 0.1
    x = rng.randn(1, 9, 11, 256).astype(np.float32)
    got = np.asarray(
        RN.bottleneck(params, jnp.asarray(x), "res3_0", stride=2, has_proj=True)
    )
    exp = _torch_bottleneck(params, t(x).permute(0, 3, 1, 2), "res3_0", 2, True)
    exp = exp.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=1e-3)


def test_c4_body_output_shape():
    params = RN.init_resnet_params("resnet50")
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    out = RN.c4_body(params, x)
    assert out.shape == (1, 14, 14, 1024)  # stride 16


def test_multilevel_body_shapes():
    params = RN.init_resnet_params("resnet50")
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    feats = RN.multilevel_body(params, x)
    assert feats["c2"].shape == (1, 16, 24, 256)
    assert feats["c3"].shape == (1, 8, 12, 512)
    assert feats["c4"].shape == (1, 4, 6, 1024)
    assert feats["c5"].shape == (1, 2, 3, 2048)


def test_fpn_neck_matches_torch(rng):
    params = FPN.init_fpn_params("resnet50")
    feats = {
        "c2": rng.randn(1, 16, 24, 256).astype(np.float32),
        "c3": rng.randn(1, 8, 12, 512).astype(np.float32),
        "c4": rng.randn(1, 4, 6, 1024).astype(np.float32),
        "c5": rng.randn(1, 2, 3, 2048).astype(np.float32),
    }
    got = FPN.fpn_neck(params, {k: jnp.asarray(v) for k, v in feats.items()})
    assert [g.shape for g in got] == [
        (1, 16, 24, 256), (1, 8, 12, 256), (1, 4, 6, 256), (1, 2, 3, 256)
    ]

    # torch mirror (reference fpn_body.forward, detector.py:35-52)
    names = ["res2_2", "res3_3", "res4_5", "res5_2"]
    lat = []
    for i, c in enumerate(["c2", "c3", "c4", "c5"]):
        suffix = "_sum" if i == 3 else "_sum_lateral"
        w = t(params[f"fpn_inner_{names[i]}{suffix}_w"]).permute(3, 2, 0, 1)
        b = t(params[f"fpn_inner_{names[i]}{suffix}_b"])
        lat.append(F.conv2d(t(feats[c]).permute(0, 3, 1, 2), w, b))
    for i in range(2, -1, -1):
        lat[i] = lat[i] + F.interpolate(lat[i + 1], scale_factor=2, mode="nearest")
    for i in range(4):
        w = t(params[f"fpn_{names[i]}_sum_w"]).permute(3, 2, 0, 1)
        b = t(params[f"fpn_{names[i]}_sum_b"])
        exp = F.conv2d(lat[i], w, b, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got[i]), exp, rtol=1e-3, atol=1e-4)


def test_p6_subsample():
    x = jnp.asarray(np.arange(32, dtype=np.float32).reshape(1, 4, 4, 2))
    p6 = FPN.subsample2x(x)
    assert p6.shape == (1, 2, 2, 2)
    # max_pool2d(kernel 1, stride 2) == strided slice
    np.testing.assert_array_equal(np.asarray(p6), np.asarray(x)[:, ::2, ::2, :])


def test_deconv_matches_torch(rng):
    p = {
        "conv5_mask_w": rng.randn(16, 8, 2, 2).astype(np.float32),
        "conv5_mask_b": rng.randn(8).astype(np.float32),
    }
    x = rng.randn(3, 7, 7, 16).astype(np.float32)
    got = np.asarray(HD.deconv2x2(p, jnp.asarray(x), "conv5_mask"))
    exp = F.conv_transpose2d(
        t(x).permute(0, 3, 1, 2), t(p["conv5_mask_w"]), t(p["conv5_mask_b"]), stride=2
    ).permute(0, 2, 3, 1).numpy()
    assert got.shape == (3, 14, 14, 8)
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=1e-4)


def test_mlp_box_head_matches_torch(rng):
    p = HD.init_box_head_params("mlp")
    x = rng.randn(5, 7, 7, 256).astype(np.float32)
    got = np.asarray(HD.mlp_box_head(p, jnp.asarray(x), jnp.float32))
    # torch mirror flattens (C,H,W)-major; permute weights like the importer
    w6 = t(p["fc6_w"])  # ours expects HWC-major flatten already
    xt = t(x).reshape(5, -1)
    exp = F.relu(F.linear(xt, w6, t(p["fc6_b"])))
    exp = F.relu(F.linear(exp, t(p["fc7_w"]), t(p["fc7_b"]))).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=1e-4)


def test_res5_box_head_shape(rng):
    p = RN.init_resnet_params("resnet50")
    x = rng.randn(6, 14, 14, 1024).astype(np.float32)
    out = HD.res5_box_head(p, jnp.asarray(x))
    assert out.shape == (6, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_head_shapes(rng):
    pf = HD.init_mask_head_params("1up4convs")
    x = rng.randn(4, 14, 14, 256).astype(np.float32)
    out = HD.mask_head(pf, jnp.asarray(x), "1up4convs")
    assert out.shape == (4, 28, 28, 81)
    got = np.asarray(out)
    assert ((got >= 0) & (got <= 1)).all()

    pc = {**RN.init_resnet_params("resnet50"), **HD.init_mask_head_params("upshare")}
    x = rng.randn(4, 14, 14, 1024).astype(np.float32)
    out = HD.mask_head(pc, jnp.asarray(x), "upshare")
    assert out.shape == (4, 14, 14, 81)


def test_stem_s2d_matches_plain(rng):
    """The space-to-depth stem is the SAME function as the plain stem —
    every product term of the 7x7/2 conv1 is preserved under the 2x2
    space-to-depth + 4x4/1 rewrite (models/resnet.stem_s2d derivation),
    at even and odd spatial sizes."""
    import jax.numpy as jnp

    from detectorch_tpu.models import resnet

    p = {
        "conv1_w": rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1,
        "res_conv1_bn_s": rng.randn(64).astype(np.float32),
        "res_conv1_bn_b": rng.randn(64).astype(np.float32),
    }
    for h, w in ((64, 96), (63, 95), (66, 94)):
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        plain = resnet.stem(p, x)
        s2d = resnet.stem(p, x, s2d=True)
        assert plain.shape == s2d.shape, (h, w, plain.shape, s2d.shape)
        np.testing.assert_allclose(
            np.asarray(s2d), np.asarray(plain), rtol=1e-5, atol=1e-5)
