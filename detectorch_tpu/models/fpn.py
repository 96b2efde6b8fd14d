"""FPN neck: laterals + nearest top-down + 3x3 output convs (+ P6).

Reference ``lib/model/detector.py:12-52`` (fpn_body) and ``:248-250`` (extra
P6 level = stride-2 subsample of P5 with kernel 1). Blob names follow the
Detectron convention the reference importer reconstructs at
``detector.py:352-367``:

  fpn_inner_res{2,3,4}_{last}_sum_lateral_{w,b}, fpn_inner_res5_{last}_sum_{w,b}
  fpn_res{s}_{last}_sum_{w,b}
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from detectorch_tpu.models.resnet import conv, last_block_name


def _lateral_name(arch: str, stage_idx: int) -> str:
    blk = last_block_name(arch, stage_idx)
    suffix = "_sum" if stage_idx == 3 else "_sum_lateral"
    return f"fpn_inner_{blk}{suffix}"


def _output_name(arch: str, stage_idx: int) -> str:
    return f"fpn_{last_block_name(arch, stage_idx)}_sum"


def upsample2x_nearest(x):
    """2x nearest upsample (reference torch.nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def subsample2x(x):
    """P6 = max_pool2d(P5, kernel 1, stride 2) == strided subsample
    (reference detector.py:250)."""
    return x[:, ::2, ::2, :]


def fpn_neck(params, feats: Dict[str, jax.Array], arch: str = "resnet50"):
    """feats: {c2..c5} NHWC. Returns [P2, P3, P4, P5] (finest first)."""
    cs = [feats["c2"], feats["c3"], feats["c4"], feats["c5"]]
    lateral = []
    for i, c in enumerate(cs):
        name = _lateral_name(arch, i)
        y = conv(c, params[f"{name}_w"]) + params[f"{name}_b"].astype(c.dtype)
        lateral.append(y)
    # top-down pass (reference detector.py:46-47)
    for i in range(len(lateral) - 2, -1, -1):
        lateral[i] = lateral[i] + upsample2x_nearest(lateral[i + 1])
    outs = []
    for i, l in enumerate(lateral):
        name = _output_name(arch, i)
        outs.append(conv(l, params[f"{name}_w"], pad=1) + params[f"{name}_b"].astype(l.dtype))
    return outs


def init_fpn_params(arch: str = "resnet50", channels: int = 256, seed: int = 1):
    rng = np.random.RandomState(seed)
    p = {}
    in_ch = [256, 512, 1024, 2048]
    for i in range(4):
        ln = _lateral_name(arch, i)
        p[f"{ln}_w"] = (rng.randn(1, 1, in_ch[i], channels) * 0.01).astype(np.float32)
        p[f"{ln}_b"] = np.zeros(channels, np.float32)
        on = _output_name(arch, i)
        p[f"{on}_w"] = (rng.randn(3, 3, channels, channels) * 0.01).astype(np.float32)
        p[f"{on}_b"] = np.zeros(channels, np.float32)
    return p
