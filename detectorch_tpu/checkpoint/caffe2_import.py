"""caffe2 Detectron ``.pkl`` checkpoint importer -> flat JAX param dict.

Reference: ``lib/model/detector.py:289-374`` (load_pretrained_weights) and
``lib/utils/utils.py:44-71`` (torchvision->caffe2 name translation). Our
parameters are *already* keyed by caffe2 blob names (see models/resnet.py),
so importing reduces to layout conversion:

  * conv weights: caffe2 OIHW -> HWIO transpose;
  * ``conv1_w``: BGR -> RGB channel flip on the input axis (the caffe2
    models were trained on BGR images; reference detector.py:305-306);
  * ``fc6_w``: caffe2 expects a (C, H, W)-major flatten of the 7x7x256 RoI
    feature; our NHWC flatten is (H, W, C)-major, so the columns are
    permuted here once at import;
  * ``conv5_mask_w`` (deconv): caffe2 (C_in, C_out, kh, kw) — matches our
    ``heads.deconv2x2`` layout, kept as-is;
  * BN: caffe2 exports affine-only ``_bn_s``/``_bn_b`` — loaded directly
    (and optionally folded into the conv weights by `fold_bn`, the
    XLA-idiomatic equivalent of the reference's frozen eval-mode BN).
"""

from __future__ import annotations

import pickle
from typing import Dict

import numpy as np

from detectorch_tpu.config import ModelConfig
from detectorch_tpu.models import resnet as resnet_mod


def load_caffe2_pkl(path: str) -> Dict[str, np.ndarray]:
    """Read a Detectron pkl (reference detector.py:293-296). Returns the raw
    blob dict (unwraps the {'blobs': ...} envelope if present)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if isinstance(data, dict) and "blobs" in data:
        data = data["blobs"]
    return {k: np.asarray(v) for k, v in data.items() if not k.endswith("_momentum")}


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 4, w.shape
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32)


def import_params(
    blobs: Dict[str, np.ndarray],
    cfg: ModelConfig,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Convert a caffe2 blob dict into this framework's param dict for `cfg`.

    Uses a randomly-initialised skeleton of the exact blob set the model
    needs, then fills every entry from `blobs` with layout conversion.
    Raises KeyError on missing blobs when strict.
    """
    from detectorch_tpu.models.detector import init_params

    skeleton = init_params(cfg)
    out: Dict[str, np.ndarray] = {}
    for name, ref in skeleton.items():
        if name not in blobs:
            if strict:
                raise KeyError(f"checkpoint missing blob: {name}")
            out[name] = np.asarray(ref)
            continue
        w = np.asarray(blobs[name]).astype(np.float32)
        if name == "conv1_w":
            w = _conv_to_hwio(w[:, (2, 1, 0), :, :])  # BGR -> RGB
        elif name == "fc6_w":
            # (1024, C*H*W) -> columns permuted to (H, W, C)-major
            o = w.shape[0]
            w = w.reshape(o, 256, cfg.roi_size, cfg.roi_size)
            w = np.ascontiguousarray(w.transpose(0, 2, 3, 1)).reshape(o, -1)
        elif name in ("conv5_mask_w", "kps_score_lowres_w"):
            pass  # ConvTranspose blobs: native (C_in, C_out, kh, kw) layout
        elif w.ndim == 4:
            w = _conv_to_hwio(w)
        ref_shape = tuple(np.asarray(ref).shape)
        if tuple(w.shape) != ref_shape:
            raise ValueError(f"{name}: checkpoint {w.shape} != model {ref_shape}")
        out[name] = w
    return out


def import_base_cnn(blobs: Dict[str, np.ndarray], arch: str = "resnet50"):
    """ImageNet base-CNN import (reference train_fast.py:78-84 path): backbone
    blobs only; heads stay randomly initialised."""
    skeleton = resnet_mod.init_resnet_params(arch, include_c5=True)
    out = {}
    for name, ref in skeleton.items():
        w = np.asarray(blobs[name]).astype(np.float32)
        if name == "conv1_w":
            w = _conv_to_hwio(w[:, (2, 1, 0), :, :])
        elif w.ndim == 4:
            w = _conv_to_hwio(w)
        assert tuple(w.shape) == tuple(np.asarray(ref).shape), name
        out[name] = w
    return out


def fold_bn(params: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold affine BN into the preceding conv: conv(x, W)·s + b == conv(x, W·s) + b.

    Exact for frozen affine BN (the only kind caffe2 Detectron exports).
    Scales become 1 so the model code is unchanged; XLA folds the remaining
    identity-scale + bias into the conv epilogue.
    """
    out = dict(params)
    for name in list(params):
        if not name.endswith("_bn_s"):
            continue
        base = name[: -len("_bn_s")]
        # the stem pair is (conv1_w, res_conv1_bn_s)
        wkey = "conv1_w" if base == "res_conv1" else f"{base}_w"
        if wkey not in params:
            continue
        w = np.asarray(params[wkey])
        s = np.asarray(params[name])
        out[wkey] = (w * s[None, None, None, :]).astype(w.dtype)
        out[name] = np.ones_like(s)
    return out


def export_to_caffe2_layout(params: Dict[str, np.ndarray], cfg: ModelConfig):
    """Inverse of `import_params` (HWIO -> OIHW, RGB -> BGR, fc6 re-permute).

    Used for round-trip tests and for writing checkpoints other Detectron
    tools can read."""
    out = {}
    for name, w in params.items():
        w = np.asarray(w)
        if name == "conv1_w":
            w = w.transpose(3, 2, 0, 1)[:, (2, 1, 0), :, :]
        elif name == "fc6_w":
            o = w.shape[0]
            w = w.reshape(o, cfg.roi_size, cfg.roi_size, 256)
            w = w.transpose(0, 3, 1, 2).reshape(o, -1)
        elif name in ("conv5_mask_w", "kps_score_lowres_w"):
            pass
        elif w.ndim == 4:
            w = w.transpose(3, 2, 0, 1)
        out[name] = np.ascontiguousarray(w)
    return out


def save_caffe2_pkl(params: Dict[str, np.ndarray], cfg: ModelConfig, path: str):
    with open(path, "wb") as f:
        pickle.dump({"blobs": export_to_caffe2_layout(params, cfg)}, f, protocol=2)
