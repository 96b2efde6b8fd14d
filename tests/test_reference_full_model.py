"""THE REFERENCE'S OWN FULL MODEL, EXECUTED — the strongest oracle this
container allows.

``lib/model/detector.py`` is run end to end (conv body -> RPN ->
GenerateProposals -> [collect/distribute] -> RoIAlign -> heads -> mask head)
with three compatibility shims, each individually trusted:

  - ``torchvision.models``  -> tests/torchvision_stub.py (structural ResNet,
    torchvision is not in this image);
  - ``cppcuda_cffi.roialign`` -> tests/oracles.np_roi_align (a transcription
    of the reference's own roi_align_cpu.cpp, already validated against our
    kernels everywhere);
  - cython nms/bbox         -> the numpy oracles (same stubs the other
    reference-oracle tests use).

Crucially, the reference model is weighted via its OWN
``load_pretrained_weights`` (detector.py:289-374) reading a Detectron pkl
WRITTEN BY OUR EXPORTER (checkpoint/caffe2_import.save_caffe2_pkl). A passing
run therefore proves, against executed reference code rather than our reading
of it:

  - every blob name + shape our exporter emits is exactly what Detectron
    checkpoints contain (the loader asserts each one);
  - our importer's layout conventions (OIHW<->HWIO, conv1 BGR flip, fc6
    column permute, ConvTranspose layout) are the exact inverses of what the
    reference applies at load;
  - the assembled models agree at value level on rois, class scores, bbox
    deltas and masks.

Reference anchors: detector.py (model assembly + loader), demo.ipynb /
demo_FPN.ipynb (the drive recipe mirrored here).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # full models, production RPN counts

from detectorch_tpu.checkpoint.caffe2_import import save_caffe2_pkl
from detectorch_tpu.config import PRESETS, TestConfig
from detectorch_tpu.models.detector import init_params, make_inference_fn
from tests.oracles import np_roi_align
from tests.test_reference_oracles import (
    REF_LIB,
    _load_ref_stubbed,
    _np_compat,
    _ref_stub_modules,
)


def _roi_align_forward_cpu(features, rois, output, pooled_h, pooled_w,
                           spatial_scale, sampling_ratio):
    """cppcuda_cffi.roialign.roi_align_forward_cpu signature (reference
    model/roi_align.py:69-84, torch>=1 branch): fills `output` in place.
    rois are (N, 5) [batch_idx, x1, y1, x2, y2]."""
    feats = features.detach().numpy().astype(np.float64)
    r = rois.detach().numpy()
    out = np.zeros((r.shape[0], feats.shape[1], pooled_h, pooled_w))
    for b in np.unique(r[:, 0]).astype(int) if len(r) else []:
        sel = np.where(r[:, 0].astype(int) == b)[0]
        out[sel] = np_roi_align(
            feats[b], r[sel, 1:5], pooled_h, pooled_w,
            float(spatial_scale), int(sampling_ratio),
        )
    output.copy_(torch.from_numpy(out.astype(np.float32)))


def _exec_ref(relpath, name):
    spec = importlib.util.spec_from_file_location(name, f"{REF_LIB}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    with _np_compat():
        spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_env():
    """Load lib/model/detector.py with the full stub environment. Returns
    (detector module, multilevel_rois module)."""
    boxes = _load_ref_stubbed("utils/boxes.py", "fm_boxes")
    anchors = _exec_ref("utils/generate_anchors.py", "fm_anchors")
    uu = _exec_ref("utils/utils.py", "fm_utils_utils")

    holder = {}

    def extra(reg):
        utils_pkg = types.ModuleType("utils")
        for nm, mod in [("boxes", boxes), ("generate_anchors", anchors),
                        ("utils", uu)]:
            setattr(utils_pkg, nm, mod)
            reg(f"utils.{nm}", mod)
        reg("utils", utils_pkg)

        import tests.torchvision_stub as tvs
        tv = types.ModuleType("torchvision")
        tv.models = tvs
        reg("torchvision", tv)
        reg("torchvision.models", tvs)

        ra_mod = types.ModuleType("cppcuda_cffi.roialign")
        ra_mod.roi_align_forward_cpu = _roi_align_forward_cpu
        cp = types.ModuleType("cppcuda_cffi")
        cp.roialign = ra_mod
        reg("cppcuda_cffi", cp)
        reg("cppcuda_cffi.roialign", ra_mod)

        # the model package, loaded with the registrations above active
        ml = _exec_ref("utils/multilevel_rois.py", "fm_multilevel")
        utils_pkg.multilevel_rois = ml
        reg("utils.multilevel_rois", ml)
        holder["ml"] = ml
        model_pkg = types.ModuleType("model")
        for nm, rel in [("roi_align", "model/roi_align.py"),
                        ("generate_proposals", "model/generate_proposals.py"),
                        ("collect_and_distribute_fpn_rpn_proposals",
                         "model/collect_and_distribute_fpn_rpn_proposals.py")]:
            m = _exec_ref(rel, f"fm_{nm}")
            setattr(model_pkg, nm, m)
            reg(f"model.{nm}", m)
        reg("model", model_pkg)

    det = _load_ref_stubbed("model/detector.py", "fm_detector", extra)
    return det, holder["ml"]


def _our_params(preset, seed):
    """init_params + nontrivial BN affines so the frozen-BN plumbing and the
    exporter's _bn_s/_bn_b blobs are genuinely exercised."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    rng = np.random.RandomState(seed)
    cfg = PRESETS[preset].replace(
        compute_dtype="float32", roi_align_precision="highest"
    )
    params = init_params(cfg, seed=seed)
    for k in list(params):
        if k.endswith("_bn_s") and not k.endswith("branch2c_bn_s"):
            params[k] = rng.uniform(0.8, 1.2, params[k].shape).astype(np.float32)
        if k.endswith("_bn_b"):
            params[k] = (rng.randn(*params[k].shape) * 0.02).astype(np.float32)
    return cfg, params


def _run_ours(cfg, tcfg, params, image):
    import jax
    import jax.numpy as jnp

    h, w = image.shape[:2]
    fwd = jax.jit(make_inference_fn(cfg, tcfg))
    return fwd(params, image, jnp.float32(1.0), jnp.float32(h), jnp.float32(w))


def _match_rois(got_rois, ref_rois, atol=0.05, max_shift=8):
    """Bijective nearest-neighbour matching of roi rows.

    The reference sorts collected proposals with unstable sorts
    (collect_and_distribute...:101 torch.sort, generate_proposals.py:80
    argsort), so EXACT fp32 score ties land in arbitrary order — and scores
    that differ only in the 7th digit can flip order between torch and XLA
    conv arithmetic. Both manifest as adjacent swaps of the same roi set
    (observed: 3 swapped pairs out of 1000, all within one rank). We
    therefore demand: same multiset of rois (within atol), a true
    permutation, and near-diagonal placement (|perm[i]-i| <= max_shift)."""
    from scipy.spatial import cKDTree

    assert len(got_rois) == len(ref_rois), (len(got_rois), len(ref_rois))
    dist, perm = cKDTree(ref_rois).query(got_rois)
    assert dist.max() < atol, dist.max()
    assert len(np.unique(perm)) == len(perm), "not a bijection"
    assert np.abs(perm - np.arange(len(perm))).max() <= max_shift
    return perm


def _compare_common(out, ref_cls, ref_bbox, ref_rois):
    got_valid = np.asarray(out.roi_valid)
    got_rois = np.asarray(out.rois)[got_valid]
    perm = _match_rois(got_rois, ref_rois)
    np.testing.assert_allclose(got_rois, ref_rois[perm], rtol=1e-3, atol=0.05)
    # atol 6e-3: rois can differ by up to ~7e-3 px between the two fp32
    # pipelines; with RANDOM probe weights the fc6 12544-dim dot amplifies
    # that into ~4e-3 absolute on a handful of softmax entries (observed: one
    # roi of 1000, 9/81000 entries at atol 2e-3). Trained weights are far
    # smoother; the AP-parity matrix covers exactness with real postprocess.
    got_cls = np.asarray(out.cls_scores)[got_valid]
    np.testing.assert_allclose(got_cls, ref_cls[perm], rtol=5e-2, atol=6e-3)
    # deltas are raw linear outputs on the same amplified features (observed
    # 30/324000 entries at 2e-2, max 3.8e-2, all on that one roi); 5e-2 in
    # delta units is ~5e-3 of a roi dimension after the /10 regression weights
    got_bbox = np.asarray(out.bbox_deltas)[got_valid]
    np.testing.assert_allclose(got_bbox, ref_bbox[perm], rtol=5e-2, atol=5e-2)


def test_reference_full_model_c4_mask_rcnn(ref_env, tmp_path):
    """e2e_mask_rcnn_R-50-C4_2x vs the executed reference detector built with
    demo.ipynb's exact constructor defaults, weighted from our exported pkl,
    at the reference's production RPN counts (6000->1000)."""
    ref_det, _ = ref_env
    cfg, params = _our_params("e2e_mask_rcnn_R-50-C4_2x", seed=5)
    assert cfg.rpn.pre_nms_top_n == 6000 and cfg.rpn.post_nms_top_n == 1000
    pkl = str(tmp_path / "ours_c4.pkl")
    save_caffe2_pkl(params, cfg, pkl)

    with _np_compat(), _ref_stub_modules():
        model = ref_det.detector(
            arch="resnet50",
            detector_pkl_file=pkl,
            use_rpn_head=True,
            use_mask_head=True,
        )  # demo.ipynb defaults: C4 body, layer4+avgpool head, upshare mask

    rng = np.random.RandomState(3)
    image = (rng.randn(320, 448, 3) * 8).astype(np.float32)
    img_t = torch.from_numpy(image).permute(2, 0, 1)[None].contiguous()

    with torch.no_grad(), _np_compat(), _ref_stub_modules():
        ref_cls, ref_bbox, ref_rois, ref_feats = model(
            img_t, scaling_factor=1.0
        )

    tcfg = TestConfig(detections_per_img=20)
    out = _run_ours(cfg, tcfg, params, image)
    _compare_common(out, ref_cls.numpy(), ref_bbox.numpy(), ref_rois.numpy())

    # mask branch on OUR final detections through the REFERENCE mask head
    d = out.detections
    ok = np.asarray(d.valid)
    if not ok.any():
        pytest.skip("no detections with this seed")
    det_boxes = np.asarray(d.boxes)[ok]
    det_classes = np.asarray(d.classes)[ok]
    got_masks = np.asarray(out.masks)[ok]
    with torch.no_grad(), _np_compat(), _ref_stub_modules():
        probs = model.mask_head(
            ref_feats, torch.from_numpy(det_boxes).float()
        ).numpy()  # (K, 81, 14, 14)
    exp = np.stack([probs[i, det_classes[i]] for i in range(len(det_classes))])
    np.testing.assert_allclose(got_masks, exp, rtol=5e-2, atol=5e-3)


def test_reference_full_model_fpn_mask_rcnn(ref_env, tmp_path):
    """The flagship e2e_mask_rcnn_R-50-FPN_2x vs the executed reference
    detector built with demo_FPN.ipynb's exact constructor arguments, at the
    reference's production per-level RPN counts (1000/1000, collect 1000)."""
    ref_det, ref_ml = ref_env
    cfg, params = _our_params("e2e_mask_rcnn_R-50-FPN_2x", seed=11)
    assert cfg.rpn.pre_nms_top_n == 1000 and cfg.rpn.post_nms_top_n == 1000
    pkl = str(tmp_path / "ours_fpn.pkl")
    save_caffe2_pkl(params, cfg, pkl)

    with _np_compat(), _ref_stub_modules():
        model = ref_det.detector(
            arch="resnet50",
            detector_pkl_file=pkl,
            conv_body_layers=["conv1", "bn1", "relu", "maxpool",
                              "layer1", "layer2", "layer3", "layer4"],
            conv_head_layers="two_layer_mlp",
            fpn_layers=["layer1", "layer2", "layer3", "layer4"],
            fpn_extra_lvl=True,
            roi_height=7,
            roi_width=7,
            roi_spatial_scale=[0.25, 0.125, 0.0625, 0.03125],
            roi_sampling_ratio=2,
            use_rpn_head=True,
            use_mask_head=True,
            mask_head_type="1up4convs",
        )  # demo_FPN.ipynb construction (arch swapped to the flagship R-50)

    rng = np.random.RandomState(7)
    image = (rng.randn(320, 448, 3) * 8).astype(np.float32)
    img_t = torch.from_numpy(image).permute(2, 0, 1)[None].contiguous()

    with torch.no_grad(), _np_compat(), _ref_stub_modules():
        ref_cls, ref_bbox, ref_rois, ref_feats = model(
            img_t, scaling_factor=1.0
        )

    tcfg = TestConfig(detections_per_img=20)
    out = _run_ours(cfg, tcfg, params, image)
    _compare_common(out, ref_cls.numpy(), ref_bbox.numpy(), ref_rois.numpy())

    # mask branch on OUR final detections, routed through the REFERENCE's
    # add_multilevel_rois_for_test + mask_head (demo_FPN.ipynb cell)
    d = out.detections
    ok = np.asarray(d.valid)
    if not ok.any():
        pytest.skip("no detections with this seed")
    det_boxes = np.asarray(d.boxes)[ok]
    det_classes = np.asarray(d.classes)[ok]
    got_masks = np.asarray(out.masks)[ok]
    with torch.no_grad(), _np_compat(), _ref_stub_modules():
        ml = ref_ml.add_multilevel_rois_for_test(
            {"rois": det_boxes.astype(np.float32)}, "rois"
        )
        per_level = []
        for k in ml:
            if "rois_fpn" in k:
                per_level.append(
                    torch.from_numpy(np.asarray(ml[k], np.float32))
                    if len(ml[k]) else None
                )
        restore = torch.from_numpy(
            np.asarray(ml["rois_idx_restore_int32"])
        ).long()
        probs = model.mask_head(ref_feats, per_level, restore).numpy()
    exp = np.stack([probs[i, det_classes[i]] for i in range(len(det_classes))])
    np.testing.assert_allclose(got_masks, exp, rtol=5e-2, atol=5e-3)


def test_reference_full_model_fast_rcnn_fpn(ref_env, tmp_path):
    """fast_rcnn_R-50-FPN_2x (no RPN, precomputed proposals — the
    eval_fast_FPN.ipynb drive): the reference detector consumes the same
    dedup'd scaled proposals through collect-free multilevel RoIAlign +
    two_layer_mlp; covers our proposals-input (Fast R-CNN) mode."""
    import jax
    import jax.numpy as jnp

    ref_det, ref_ml = ref_env
    cfg, params = _our_params("fast_rcnn_R-50-FPN_2x", seed=23)
    assert not cfg.use_rpn
    pkl = str(tmp_path / "ours_fast_fpn.pkl")
    save_caffe2_pkl(params, cfg, pkl)

    with _np_compat(), _ref_stub_modules():
        model = ref_det.detector(
            arch="resnet50",
            detector_pkl_file=pkl,
            conv_body_layers=["conv1", "bn1", "relu", "maxpool",
                              "layer1", "layer2", "layer3", "layer4"],
            conv_head_layers="two_layer_mlp",
            fpn_layers=["layer1", "layer2", "layer3", "layer4"],
            fpn_extra_lvl=True,
            roi_height=7,
            roi_width=7,
            roi_spatial_scale=[0.25, 0.125, 0.0625, 0.03125],
            roi_sampling_ratio=2,
            use_rpn_head=False,
            use_mask_head=False,
        )

    rng = np.random.RandomState(19)
    image = (rng.randn(320, 448, 3) * 8).astype(np.float32)
    img_t = torch.from_numpy(image).permute(2, 0, 1)[None].contiguous()

    from detectorch_tpu.data.transforms import dedup_proposals
    from tests.test_reference_oracles import _rand_boxes

    raw = _rand_boxes(rng, 70, 320, 448)
    props, _ = dedup_proposals(raw.astype(np.float32), spatial_scale=0.0625)
    n = len(props)

    # reference drive: per-level roi lists + restore index
    # (preprocess_sample.py:42-45 -> detector.forward rois/roi_original_idx)
    with torch.no_grad(), _np_compat(), _ref_stub_modules():
        ml = ref_ml.add_multilevel_rois_for_test(
            {"rois": props.astype(np.float32)}, "rois"
        )
        per_level = [
            torch.from_numpy(np.asarray(ml[k], np.float32).reshape(-1, 4))
            for k in ["rois_fpn2", "rois_fpn3", "rois_fpn4", "rois_fpn5"]
        ]
        restore = torch.from_numpy(
            np.asarray(ml["rois_idx_restore_int32"])
        ).long()
        ref_cls, ref_bbox, ref_rois, _ = model(
            img_t, rois=per_level, scaling_factor=1.0,
            roi_original_idx=restore,
        )

    tcfg = TestConfig(detections_per_img=20)
    pad = np.zeros((128, 4), np.float32)
    pad[:n] = props
    valid = np.zeros(128, bool)
    valid[:n] = True
    fwd = jax.jit(make_inference_fn(cfg, tcfg, num_proposals=128))
    out = fwd(params, image, jnp.float32(1.0), jnp.float32(320),
              jnp.float32(448), jnp.asarray(pad), jnp.asarray(valid))

    got_valid = np.asarray(out.roi_valid)
    got_rois = np.asarray(out.rois)[got_valid]
    # proposals-in mode: order is the input order on our side; the reference
    # returns them level-grouped then restored — identical order, no ties
    np.testing.assert_allclose(got_rois, ref_rois.numpy(), rtol=0, atol=1e-4)
    got_cls = np.asarray(out.cls_scores)[got_valid]
    np.testing.assert_allclose(got_cls, ref_cls.numpy(), rtol=5e-2, atol=6e-3)
    got_bbox = np.asarray(out.bbox_deltas)[got_valid]
    np.testing.assert_allclose(got_bbox, ref_bbox.numpy(), rtol=5e-2, atol=5e-2)


def test_reference_full_model_fpn_mask_rcnn_r101(ref_env, tmp_path):
    """e2e_mask_rcnn_R-101-FPN_2x — demo_FPN.ipynb's ACTUAL model. Uniquely
    exercises the reference loader's R-101 FPN lateral blob-name derivation
    (detector.py:355-360 walks layer3's 23-block state dict to 'res4_22')
    against our exporter, plus the deeper body at value level."""
    import jax.numpy as jnp

    ref_det, ref_ml = ref_env
    cfg, params = _our_params("e2e_mask_rcnn_R-101-FPN_2x", seed=29)
    assert cfg.arch == "resnet101"
    pkl = str(tmp_path / "ours_fpn101.pkl")
    save_caffe2_pkl(params, cfg, pkl)

    with _np_compat(), _ref_stub_modules():
        model = ref_det.detector(
            arch="resnet101",
            detector_pkl_file=pkl,
            conv_body_layers=["conv1", "bn1", "relu", "maxpool",
                              "layer1", "layer2", "layer3", "layer4"],
            conv_head_layers="two_layer_mlp",
            fpn_layers=["layer1", "layer2", "layer3", "layer4"],
            fpn_extra_lvl=True,
            roi_height=7,
            roi_width=7,
            roi_spatial_scale=[0.25, 0.125, 0.0625, 0.03125],
            roi_sampling_ratio=2,
            use_rpn_head=True,
            use_mask_head=True,
            mask_head_type="1up4convs",
        )

    rng = np.random.RandomState(13)
    image = (rng.randn(256, 384, 3) * 8).astype(np.float32)
    img_t = torch.from_numpy(image).permute(2, 0, 1)[None].contiguous()

    with torch.no_grad(), _np_compat(), _ref_stub_modules():
        ref_cls, ref_bbox, ref_rois, _ = model(img_t, scaling_factor=1.0)

    tcfg = TestConfig(detections_per_img=20)
    out = _run_ours(cfg, tcfg, params, image)
    _compare_common(out, ref_cls.numpy(), ref_bbox.numpy(), ref_rois.numpy())
