"""Functional ResNet-50/101 backbone, caffe2-Detectron flavour, NHWC.

Mirrors what the reference assembles from torchvision + stride swaps
(reference ``lib/model/detector.py:169-191``):

  * bottleneck stride-2 sits on the 1x1 ``branch2a`` conv (and the
    ``branch1`` projection), NOT on the 3x3 — the caffe2 placement the
    reference patches torchvision into (detector.py:174-179);
  * BatchNorm is affine-only (caffe2 exports no running stats; the reference
    keeps the model in eval() forever, detector.py:231) — represented here as
    per-channel scale/bias ``*_bn_s``/``*_bn_b`` and exactly foldable into
    the preceding conv by ``checkpoint.fold_bn``;
  * explicit (1,1)/(3,3) paddings everywhere: XLA 'SAME' places stride-2
    windows differently from torch/caffe2 on even sizes, which silently
    shifts every feature map by one pixel.

Parameters live in a flat ``{caffe2_blob_name: array}`` dict with conv
weights in HWIO layout, so the caffe2 ``.pkl`` importer is a rename-free
transpose and every blob is auditable against the reference
(``detector.py:289-374``, ``lib/utils/utils.py:44-71``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}
# stage name -> (caffe2 prefix, out channels of branch2c)
STAGES = (("res2", 256), ("res3", 512), ("res4", 1024), ("res5", 2048))

Params = Dict[str, jax.Array]


def conv(x, w, stride: int = 1, pad: int = 0):
    """NHWC conv with explicit symmetric padding (torch/caffe2 geometry)."""
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def affine(x, s, b):
    """Frozen-BN channelwise scale+bias (caffe2 AffineChannel)."""
    return x * s.astype(x.dtype) + b.astype(x.dtype)


def conv_bn(params: Params, x, name: str, stride: int = 1, pad: int = 0):
    x = conv(x, params[f"{name}_w"], stride, pad)
    return affine(x, params[f"{name}_bn_s"], params[f"{name}_bn_b"])


def max_pool_3x3s2(x):
    """torch MaxPool2d(3, stride=2, padding=1) with explicit padding."""
    # NOTE: init must be -inf (representable in bf16 too) — a finite init
    # defeats XLA's reduce-window-max autodiff pattern
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def bottleneck(params: Params, x, prefix: str, stride: int, has_proj: bool):
    """res{s}_{i}: branch2a(1x1, stride)+bn+relu -> branch2b(3x3)+bn+relu ->
    branch2c(1x1)+bn, plus branch1 projection; relu(sum)."""
    shortcut = x
    if has_proj:
        shortcut = conv_bn(params, x, f"{prefix}_branch1", stride=stride)
    out = conv_bn(params, x, f"{prefix}_branch2a", stride=stride)
    out = jax.nn.relu(out)
    out = conv_bn(params, out, f"{prefix}_branch2b", stride=1, pad=1)
    out = jax.nn.relu(out)
    out = conv_bn(params, out, f"{prefix}_branch2c")
    return jax.nn.relu(out + shortcut)


def stage(params: Params, x, name: str, n_blocks: int, stride: int):
    for i in range(n_blocks):
        x = bottleneck(
            params, x, f"{name}_{i}", stride=stride if i == 0 else 1, has_proj=(i == 0)
        )
    return x


def stem(params: Params, x, s2d: bool = False):
    """conv1 7x7/2 pad 3 + frozen BN (res_conv1_bn) + relu + maxpool 3x3/2.

    s2d=True evaluates conv1 as a 4x4/1 conv on 2x2 space-to-depth input —
    the MLPerf-ResNet TPU stem: identical math (every product term
    preserved; see the index derivation in stem_s2d), but the image enters
    the conv at C=12 instead of C=3, so the lane-padded (C->128)
    full-resolution activation XLA materialises shrinks 4x. Checkpoints
    and gradients stay in the canonical 7x7 layout — the weight transform
    runs inside the traced program on 48 KB."""
    if s2d:
        return stem_s2d(params, x)
    x = conv(x, params["conv1_w"], stride=2, pad=3)
    x = affine(x, params["res_conv1_bn_s"], params["res_conv1_bn_b"])
    x = jax.nn.relu(x)
    return max_pool_3x3s2(x)


def stem_s2d(params: Params, x):
    """Space-to-depth stem, exactly equivalent to `stem`.

    Derivation: out[y, x] = sum_{dy, dx in [0,7)} W[dy, dx] * I[2y+dy-3,
    2x+dx-3]. Shift J[h+4] = I[h] and split dy+1 = 2j + a (a in {0,1},
    j in [0,4)): the tap index becomes J[2(y+j) + a] — i.e. a 4x4 VALID
    stride-1 conv over the 2x2 space-to-depth of J, with the 7x7 kernel
    zero-padded to 8x8 at the LOW edge (Wp[1:8, 1:8] = W) and its 2x2
    phase folded into input channels. Output rows = ceil(H/2), matching
    the strided conv. Equality pinned by
    tests/test_models.py::test_stem_s2d_matches_plain."""
    n, h, w, _ = x.shape
    pb = 2 * ((h + 1) // 2) - h + 2
    pr = 2 * ((w + 1) // 2) - w + 2
    j = jnp.pad(x, ((0, 0), (4, pb), (4, pr), (0, 0)))
    r, c = j.shape[1:3]
    j2 = j.reshape(n, r // 2, 2, c // 2, 2, 3)
    j2 = j2.transpose(0, 1, 3, 2, 4, 5).reshape(n, r // 2, c // 2, 12)
    w1 = params["conv1_w"]
    wp = jnp.zeros((8, 8) + w1.shape[2:], w1.dtype).at[1:8, 1:8].set(w1)
    w2 = wp.reshape(4, 2, 4, 2, *w1.shape[2:])
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, w1.shape[3])
    y = jax.lax.conv_general_dilated(
        j2, w2.astype(j2.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = affine(y, params["res_conv1_bn_s"], params["res_conv1_bn_b"])
    y = jax.nn.relu(y)
    return max_pool_3x3s2(y)


def c4_body(params: Params, x, arch: str = "resnet50", s2d: bool = False):
    """conv1..res4 — the C4 conv body (reference conv_body_layers
    ['conv1','bn1','relu','maxpool','layer1','layer2','layer3']).
    Output stride 16, 1024 channels."""
    blocks = STAGE_BLOCKS[arch]
    x = stem(params, x, s2d=s2d)
    x = stage(params, x, "res2", blocks[0], stride=1)
    x = stage(params, x, "res3", blocks[1], stride=2)
    x = stage(params, x, "res4", blocks[2], stride=2)
    return x


def c5_head(params: Params, x, arch: str = "resnet50", stride: int = 2):
    """res5 applied to RoI features (the C4 box/mask conv head,
    reference conv_head_layers ['layer4','avgpool'] minus the pool)."""
    return stage(params, x, "res5", STAGE_BLOCKS[arch][3], stride=stride)


def multilevel_body(params: Params, x, arch: str = "resnet50",
                    s2d: bool = False):
    """conv1..res5 returning {c2,c3,c4,c5} for the FPN neck."""
    blocks = STAGE_BLOCKS[arch]
    x = stem(params, x, s2d=s2d)
    c2 = stage(params, x, "res2", blocks[0], stride=1)
    c3 = stage(params, c2, "res3", blocks[1], stride=2)
    c4 = stage(params, c3, "res4", blocks[2], stride=2)
    c5 = stage(params, c4, "res5", blocks[3], stride=2)
    return {"c2": c2, "c3": c3, "c4": c4, "c5": c5}


def last_block_name(arch: str, stage_idx: int) -> str:
    """e.g. (resnet50, 2) -> 'res4_5' — used in FPN blob names."""
    name, _ = STAGES[stage_idx]
    return f"{name}_{STAGE_BLOCKS[arch][stage_idx] - 1}"


# ---------------------------------------------------------------------------
# Random init (same blob names as the checkpoint importer produces)
# ---------------------------------------------------------------------------


def _he(rng: np.random.RandomState, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return (rng.randn(kh, kw, cin, cout) * np.sqrt(2.0 / fan_in)).astype(np.float32)


def init_resnet_params(
    arch: str = "resnet50", include_c5: bool = True, seed: int = 0
) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    p: Dict[str, np.ndarray] = {}

    def add_conv_bn(name, kh, kw, cin, cout):
        p[f"{name}_w"] = _he(rng, kh, kw, cin, cout)
        # zero-init the residual-closing BN scale (branch2c) so the random
        # network is near-identity and activations stay bounded — real
        # checkpoints overwrite these anyway
        scale = 0.0 if name.endswith("branch2c") else 1.0
        p[f"{name}_bn_s"] = np.full(cout, scale, np.float32)
        p[f"{name}_bn_b"] = np.zeros(cout, np.float32)

    p["conv1_w"] = _he(rng, 7, 7, 3, 64)
    p["res_conv1_bn_s"] = np.ones(64, np.float32)
    p["res_conv1_bn_b"] = np.zeros(64, np.float32)

    blocks = STAGE_BLOCKS[arch]
    in_ch = 64
    n_stages = 4 if include_c5 else 3
    for si in range(n_stages):
        name, out_ch = STAGES[si]
        mid = out_ch // 4
        for i in range(blocks[si]):
            prefix = f"{name}_{i}"
            if i == 0:
                add_conv_bn(f"{prefix}_branch1", 1, 1, in_ch, out_ch)
            add_conv_bn(f"{prefix}_branch2a", 1, 1, in_ch if i == 0 else out_ch, mid)
            add_conv_bn(f"{prefix}_branch2b", 3, 3, mid, mid)
            add_conv_bn(f"{prefix}_branch2c", 1, 1, mid, out_ch)
        in_ch = out_ch
    return p
