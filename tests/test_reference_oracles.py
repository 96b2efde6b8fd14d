"""Tests that import the REFERENCE's own pure-numpy modules as oracles
(VERDICT r1 item 9) — not hand transcriptions.

`/root/reference/lib/utils/{generate_anchors,blob,solver}.py` are importable
library modules (numpy/cv2 only); we exec them by file path under shimmed
`np.float`/`np.int` aliases (removed in numpy>=1.24) and compare our
implementations against the reference code itself.
"""

import contextlib
import importlib.util

import numpy as np
import pytest

REF_UTILS = "/root/reference/lib/utils"


@contextlib.contextmanager
def _np_compat():
    """The 2016-era reference uses the long-removed np.float/np.int aliases."""
    added = []
    for name, typ in [("float", float), ("int", int)]:
        if not hasattr(np, name):
            setattr(np, name, typ)
            added.append(name)
    try:
        yield
    finally:
        for name in added:
            delattr(np, name)


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_oracle_{name}", f"{REF_UTILS}/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    with _np_compat():
        spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_anchors():
    return _load_ref("generate_anchors")


@pytest.fixture(scope="module")
def ref_blob():
    return _load_ref("blob")


@pytest.fixture(scope="module")
def ref_solver():
    return _load_ref("solver")


def test_anchors_match_reference_module(ref_anchors):
    from detectorch_tpu.ops.anchors import generate_anchors

    # C4 config: 15 anchors at stride 16
    with _np_compat():
        exp = ref_anchors.generate_anchors(
            stride=16, sizes=(32, 64, 128, 256, 512), aspect_ratios=(0.5, 1, 2)
        )
    got = generate_anchors(16.0, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    np.testing.assert_array_equal(got, exp.astype(np.float32))

    # FPN: one size per level, stride 2^lvl (reference detector.py:203-207)
    for lvl in range(2, 7):
        stride = 2 ** lvl
        size = 32 * 2 ** (lvl - 2)
        with _np_compat():
            exp = ref_anchors.generate_anchors(
                stride=stride, sizes=(size,), aspect_ratios=(0.5, 1, 2)
            )
        got = generate_anchors(float(stride), (float(size),), (0.5, 1.0, 2.0))
        np.testing.assert_array_equal(got, exp.astype(np.float32), err_msg=f"P{lvl}")


def test_preprocess_matches_reference_blob(ref_blob, rng):
    from detectorch_tpu.data.transforms import PIXEL_MEANS_RGB, preprocess_image

    for h, w in [(427, 640), (640, 480), (1024, 683), (50, 1900)]:
        im = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        with _np_compat():
            ims, scales = ref_blob.prep_im_for_blob(
                im.astype(np.float32), pixel_means=list(PIXEL_MEANS_RGB),
                target_sizes=[800], max_size=1333,
            )
            ref_nchw = ref_blob.im_list_to_blob(
                ims, fpn_on=True, fpn_coarsest_stride=32
            )
        got, scale, (oh, ow) = preprocess_image(
            im, target_size=800, max_size=1333, pad_stride=32, buckets=None
        )
        assert scale == scales[0], (h, w)
        assert (oh, ow) == (h, w)
        got_nchw = got.transpose(2, 0, 1)[None]
        assert got_nchw.shape == ref_nchw.shape, (h, w)
        np.testing.assert_allclose(got_nchw, ref_nchw, atol=1e-4, err_msg=f"{h}x{w}")


def test_rois_blob_matches_reference(ref_blob, rng):
    from tests.test_boxes import random_boxes

    rois = random_boxes(rng, 30, size=500.0)
    with _np_compat():
        blob = ref_blob.get_rois_blob(rois, 1.25)
    np.testing.assert_allclose(blob[:, 1:], rois * 1.25, rtol=1e-6)
    np.testing.assert_array_equal(blob[:, 0], 0)


def test_lr_schedule_matches_reference_solver(ref_solver):
    from detectorch_tpu.config import SolverConfig
    from detectorch_tpu.train.solver import get_lr_at_iter

    cfg = SolverConfig()
    iters = [0, 1, 250, 499, 500, 501, 20000, 239999, 240000, 300000, 319999,
             320000, 359999]
    for it in iters:
        with _np_compat():
            exp = ref_solver.get_lr_at_iter(it)
        got = float(get_lr_at_iter(it, cfg))
        np.testing.assert_allclose(got, exp, rtol=1e-6, err_msg=f"iter {it}")


# ---------------------------------------------------------------------------
# Cython/torch-blocked reference modules, importable via sys.modules stubs
# (VERDICT r2 item 3). The stubs substitute ONLY the compiled extensions the
# 2016 repo can't build here: utils_cython.* (backed by the quarantined numpy
# transcriptions in tests/oracles.py), pycocotools.mask (backed by our
# byte-compatible RLE codec), and inert placeholders for torch extension
# modules loss.py imports but the tested functions never touch. Everything
# under test below is the REFERENCE'S OWN executed code.
# ---------------------------------------------------------------------------

import copy
import sys
import types

REF_LIB = "/root/reference/lib"


def _np_bbox_overlaps(boxes, query_boxes):
    """Vectorised numpy transcription of cython_bbox.pyx:32-73 (+1 areas),
    independent of detectorch_tpu (kept separate so stub-backed reference
    runs are not circular with the jnp implementation they test)."""
    boxes = np.asarray(boxes, np.float64)
    query = np.asarray(query_boxes, np.float64)
    qa = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    iw = (np.minimum(boxes[:, None, 2], query[None, :, 2])
          - np.maximum(boxes[:, None, 0], query[None, :, 0]) + 1)
    ih = (np.minimum(boxes[:, None, 3], query[None, :, 3])
          - np.maximum(boxes[:, None, 1], query[None, :, 1]) + 1)
    iw = np.maximum(iw, 0)
    ih = np.maximum(ih, 0)
    inter = iw * ih
    ba = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    ua = ba[:, None] + qa[None, :] - inter
    ovr = np.where(inter > 0, inter / np.where(ua == 0, 1, ua), 0.0)
    return ovr


def _pycoco_bb_iou(dt, gt, iscrowd):
    """Transcription of maskApi bbIou (xywh boxes, NO +1 convention;
    crowd gt uses the detection area as the union) — the pycocotools
    `mask.iou` overload json_dataset._filter_crowd_proposals calls.
    Independent of detectorch_tpu so the stub-backed reference run is
    not circular with the implementation it tests."""
    dt = np.asarray(dt, np.float64).reshape(-1, 4)
    gt = np.asarray(gt, np.float64).reshape(-1, 4)
    out = np.zeros((len(dt), len(gt)))
    for j in range(len(gt)):
        gx2, gy2 = gt[j, 0] + gt[j, 2], gt[j, 1] + gt[j, 3]
        ga = gt[j, 2] * gt[j, 3]
        for i in range(len(dt)):
            w = min(dt[i, 0] + dt[i, 2], gx2) - max(dt[i, 0], gt[j, 0])
            h = min(dt[i, 1] + dt[i, 3], gy2) - max(dt[i, 1], gt[j, 1])
            if w <= 0 or h <= 0:
                continue
            inter = w * h
            da = dt[i, 2] * dt[i, 3]
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union
    return out


class _PycocoCocoShim:
    """The pycocotools.coco.COCO API subset json_dataset.py consumes
    (getCatIds/loadCats/getImgIds/loadImgs/getAnnIds/loadAnns), backed by
    OUR native COCO index (eval/coco_eval.py) — so the reference data
    pipeline runs on the index implementation this framework ships."""

    def __init__(self, annotation_file):
        from detectorch_tpu.eval.coco_eval import COCO

        self._c = COCO(annotation_file)

    def getCatIds(self):
        return list(self._c.get_cat_ids())

    def loadCats(self, ids):
        return [copy.deepcopy(self._c.cats[i]) for i in ids]

    def getImgIds(self):
        return list(self._c.get_img_ids())

    def loadImgs(self, ids):
        return [copy.deepcopy(self._c.imgs[i]) for i in ids]

    def getAnnIds(self, imgIds=None, iscrowd=None):
        assert iscrowd is None  # the only form json_dataset.py uses
        ids = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        return [a["id"] for i in ids for a in self._c.load_anns_for_image(i)]

    def loadAnns(self, ids):
        return [copy.deepcopy(self._c.anns[i]) for i in ids]


@contextlib.contextmanager
def _ref_stub_modules():
    from tests import oracles

    saved = {}

    def reg(name, mod):
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod

    cy_nms = types.ModuleType("utils_cython.cython_nms")
    cy_nms.nms = lambda dets, thresh: oracles.np_nms(
        np.asarray(dets), thresh, kind="stable"
    )

    def _soft(dets, sigma, Nt, threshold, method):
        out, keep = oracles.np_soft_nms(
            np.asarray(dets, np.float32), float(sigma), float(Nt),
            float(threshold), int(method),
        )
        return out.astype(np.float32), keep

    cy_nms.soft_nms = _soft
    cy_bbox = types.ModuleType("utils_cython.cython_bbox")
    cy_bbox.bbox_overlaps = _np_bbox_overlaps
    cy_pkg = types.ModuleType("utils_cython")
    cy_pkg.cython_nms = cy_nms
    cy_pkg.cython_bbox = cy_bbox
    reg("utils_cython", cy_pkg)
    reg("utils_cython.cython_nms", cy_nms)
    reg("utils_cython.cython_bbox", cy_bbox)

    from detectorch_tpu.eval import rle as rle_mod

    def _mask_encode(arr):
        arr = np.asarray(arr)
        assert arr.ndim == 3
        out = []
        for i in range(arr.shape[2]):
            r = rle_mod.encode(np.asfortranarray(arr[:, :, i]))
            counts = r["counts"]
            if isinstance(counts, str):
                counts = counts.encode("ascii")
            out.append({"size": r["size"], "counts": counts})
        return out

    mask_stub = types.ModuleType("pycocotools.mask")
    mask_stub.encode = _mask_encode
    mask_stub.decode = lambda r: rle_mod.decode(r)
    mask_stub.iou = _pycoco_bb_iou
    coco_mod = types.ModuleType("pycocotools.coco")
    coco_mod.COCO = _PycocoCocoShim
    coco_pkg = types.ModuleType("pycocotools")
    coco_pkg.mask = mask_stub
    coco_pkg.coco = coco_mod
    reg("pycocotools", coco_pkg)
    reg("pycocotools.mask", mask_stub)
    reg("pycocotools.coco", coco_mod)

    try:
        yield reg
    finally:
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


def _load_ref_stubbed(relpath, name, extra=None):
    """Exec a reference module by path with the stub modules registered."""
    with _ref_stub_modules() as reg:
        if extra:
            extra(reg)
        spec = importlib.util.spec_from_file_location(
            f"ref_stub_{name}", f"{REF_LIB}/{relpath}"
        )
        mod = importlib.util.module_from_spec(spec)
        with _np_compat():
            spec.loader.exec_module(mod)
        return mod


@pytest.fixture(scope="module")
def ref_boxes():
    return _load_ref_stubbed("utils/boxes.py", "boxes")


def _with_utils_pkg(ref_boxes_mod):
    """Register a fake `utils` package exposing the loaded reference boxes
    (result_utils.py / multilevel_rois.py do `import utils.boxes`)."""

    def extra(reg):
        utils_pkg = types.ModuleType("utils")
        utils_pkg.boxes = ref_boxes_mod
        reg("utils", utils_pkg)
        reg("utils.boxes", ref_boxes_mod)

    return extra


@pytest.fixture(scope="module")
def ref_result_utils(ref_boxes):
    return _load_ref_stubbed(
        "utils/result_utils.py", "result_utils", _with_utils_pkg(ref_boxes)
    )


@pytest.fixture(scope="module")
def ref_multilevel(ref_boxes):
    return _load_ref_stubbed(
        "utils/multilevel_rois.py", "multilevel_rois", _with_utils_pkg(ref_boxes)
    )


@pytest.fixture(scope="module")
def ref_sample_rois():
    return _load_ref_stubbed("utils/fast_rcnn_sample_rois.py", "sample_rois")


@pytest.fixture(scope="module")
def ref_loss():
    def extra(reg):
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        reg("torchvision", tv)
        reg("torchvision.models", tv.models)
        for name, attrs in [
            ("model.roi_align", {"RoIAlign": object}),
            ("model.generate_proposals", {"GenerateProposals": object}),
            ("utils.utils", {"isnan": lambda x: False,
                             "infbreak": lambda *a: None,
                             "printmax": lambda *a: None}),
        ]:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            pkg_name = name.split(".")[0]
            pkg = sys.modules.get(pkg_name) or types.ModuleType(pkg_name)
            setattr(pkg, name.split(".")[1], m)
            reg(pkg_name, pkg)
            reg(name, m)

    return _load_ref_stubbed("model/loss.py", "loss", extra)


@pytest.fixture(scope="module")
def ref_utils_mod():
    return _load_ref_stubbed("utils/utils.py", "utils_utils")


def _rand_boxes(rng, n, im_h=480, im_w=640):
    x1 = rng.uniform(0, im_w - 20, n)
    y1 = rng.uniform(0, im_h - 20, n)
    w = rng.uniform(4, 200, n)
    h = rng.uniform(4, 200, n)
    return np.stack(
        [x1, y1, np.minimum(x1 + w, im_w - 1), np.minimum(y1 + h, im_h - 1)],
        axis=1,
    ).astype(np.float32)


def test_bbox_transform_matches_reference_boxes_py(ref_boxes, rng):
    """Our delta decode vs the reference's own bbox_transform
    (boxes.py:168-208), incl. the 4.1352 exp clip on huge deltas."""
    from detectorch_tpu.ops import boxes as our

    base = _rand_boxes(rng, 64)
    deltas = rng.randn(64, 4 * 5).astype(np.float32)
    deltas[:4] *= 10.0  # exercise the exp clip
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        with _np_compat():
            exp = ref_boxes.bbox_transform(base, deltas, weights)
        got = np.asarray(our.bbox_transform(base, deltas, weights))
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-2)


def test_bbox_transform_inv_matches_reference_boxes_py(ref_boxes, rng):
    from detectorch_tpu.ops import boxes as our

    base = _rand_boxes(rng, 64)
    gt = _rand_boxes(rng, 64)
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        with _np_compat():
            exp = ref_boxes.bbox_transform_inv(base, gt, weights)
        got = np.asarray(our.bbox_transform_inv(base, gt, weights))
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)


def test_clip_tiled_boxes_matches_reference(ref_boxes, rng):
    from detectorch_tpu.ops import boxes as our

    tiled = np.concatenate(
        [_rand_boxes(rng, 40) + rng.uniform(-100, 100, (40, 4)) for _ in range(3)],
        axis=1,
    )
    with _np_compat():
        exp = ref_boxes.clip_tiled_boxes(tiled.copy(), (480, 640, 3))
    got = np.asarray(our.clip_boxes(tiled.reshape(40, 3, 4), 480.0, 640.0))
    np.testing.assert_allclose(got.reshape(40, -1), exp, rtol=1e-6)


@pytest.mark.parametrize("method,beta", [
    ("ID", 1.0), ("TEMP_AVG", 1.0), ("TEMP_AVG", 2.0), ("AVG", 1.0),
    ("IOU_AVG", 1.0), ("GENERALIZED_AVG", 2.0), ("QUASI_SUM", 1.0),
])
def test_box_voting_matches_reference(ref_boxes, rng, method, beta):
    """Our fixed-shape box_voting vs the reference's loop implementation
    (boxes.py:280-329), all scoring methods."""
    from detectorch_tpu.ops import boxes as our

    all_boxes = _rand_boxes(rng, 60)
    # clustered: make voters overlap the tops
    all_boxes[30:] = all_boxes[:30] + rng.uniform(-8, 8, (30, 4)).astype(np.float32)
    all_scores = rng.uniform(0.05, 0.95, 60).astype(np.float32)
    top_idx = np.argsort(-all_scores)[:10]
    top = np.hstack([all_boxes[top_idx], all_scores[top_idx, None]])
    alld = np.hstack([all_boxes, all_scores[:, None]])
    with _np_compat():
        exp = ref_boxes.box_voting(top.copy(), alld, 0.5,
                                   scoring_method=method, beta=beta)
    got_boxes, got_scores = our.box_voting(
        all_boxes[top_idx], all_scores[top_idx], all_boxes, all_scores,
        np.ones(60, bool), 0.5, method, beta,
    )
    np.testing.assert_allclose(np.asarray(got_boxes), exp[:, :4],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_scores), exp[:, 4],
                               rtol=1e-4, atol=1e-5)


def _fake_head_outputs(rng, n=120, num_classes=81, im_h=480, im_w=640):
    """Random per-roi head outputs with a few strong classes so NMS and the
    global cap both engage."""
    rois = _rand_boxes(rng, n, im_h, im_w)
    logits = rng.randn(n, num_classes).astype(np.float32) * 2.0
    strong = rng.randint(1, num_classes, n)
    logits[np.arange(n), strong] += 4.0
    scores = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    deltas = (rng.randn(n, 4 * num_classes).astype(np.float32) * 0.3)
    return rois, scores, deltas


@pytest.mark.parametrize("soft", [False, True])
def test_postprocess_matches_reference_result_utils(
    ref_result_utils, rng, soft
):
    """Full decode+per-class-NMS+global-cap vs the reference's own
    postprocess_output / box_results_with_nms_and_limit (result_utils.py:
    76-168) executed with numpy-oracle cython stubs. This replaces the
    hand transcription in tests/torch_mirror.py as the unit-level oracle."""
    import torch

    from detectorch_tpu.config import TestConfig
    from detectorch_tpu.eval.postprocess import postprocess_detections

    rois, scores, deltas = _fake_head_outputs(rng)
    n = len(rois)
    im_scale = 1.6
    with _np_compat():
        exp_scores, exp_boxes, cls_boxes = ref_result_utils.postprocess_output(
            torch.from_numpy(rois * im_scale)[None],
            torch.tensor(im_scale),
            torch.tensor([480.0, 640.0]),
            torch.from_numpy(scores),
            torch.from_numpy(deltas),
        )
        if soft:
            # postprocess_output hard-wires greedy NMS; call the inner
            # function directly for the soft-NMS variant
            pred = ref_result_utils.box_utils.bbox_transform(
                rois, deltas, (10.0, 10.0, 5.0, 5.0)
            )
            pred = ref_result_utils.box_utils.clip_tiled_boxes(
                pred, (480, 640, 3)
            )
            exp_scores, exp_boxes, cls_boxes = (
                ref_result_utils.box_results_with_nms_and_limit(
                    scores, pred, do_soft_nms=True
                )
            )

    tcfg = TestConfig(soft_nms=soft)
    det = postprocess_detections(
        scores, deltas, rois * im_scale, np.ones(n, bool),
        im_scale, 480.0, 640.0, tcfg,
    )
    ok = np.asarray(det.valid)
    got_scores = np.asarray(det.scores)[ok]
    got_boxes = np.asarray(det.boxes)[ok]
    got_cls = np.asarray(det.classes)[ok]
    assert len(got_scores) == len(exp_scores)
    # reference output is class-major; ours too (top_k over class-major flat)
    exp_cls = np.concatenate(
        [np.full(len(cls_boxes[j]), j) for j in range(1, 81)]
    )
    order = np.lexsort((exp_scores, exp_cls))
    gorder = np.lexsort((got_scores, got_cls))
    np.testing.assert_array_equal(got_cls[gorder], exp_cls[order])
    np.testing.assert_allclose(got_scores[gorder], exp_scores[order],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_boxes[gorder], exp_boxes[order],
                               rtol=1e-3, atol=0.15)


def test_segm_results_matches_reference(ref_result_utils, rng):
    """Mask paste + RLE vs the reference's segm_results (result_utils.py:
    170-228) with our codec behind the pycocotools stub; byte-identical
    counts prove paste geometry, binarize, 1px pad and expand all agree."""
    from detectorch_tpu.eval import mask_paste

    M = 14
    k = 12
    boxes = _rand_boxes(rng, k, 240, 320)
    classes = rng.randint(1, 81, k)
    masks_full = rng.uniform(0, 1, (k, 81, M, M)).astype(np.float32)
    # reference consumes class-major detections; build cls_boxes to match
    cls_boxes = [[] for _ in range(81)]
    order = np.argsort(classes, kind="stable")
    for i in order:
        cls_boxes[classes[i]].append(
            np.hstack([boxes[i], [0.9]]).astype(np.float32)
        )
    cls_boxes = [
        np.array(v, np.float32).reshape(-1, 5) for v in cls_boxes
    ]
    with _np_compat():
        exp = ref_result_utils.segm_results(
            cls_boxes, masks_full[order], boxes[order], 240, 320, M=M
        )
    exp_flat = [r for j in range(1, 81) for r in exp[j]]

    got = mask_paste.segm_results(
        masks_full[order, classes[order]], boxes[order], 240, 320, M
    )
    assert len(got) == len(exp_flat) == k
    for g, e in zip(got, exp_flat):
        assert g["size"] == e["size"]
        gc = g["counts"]
        assert (gc if isinstance(gc, str) else gc.decode()) == e["counts"]


def test_fpn_level_mapping_matches_reference(ref_multilevel, rng):
    from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels

    boxes = np.concatenate([
        _rand_boxes(rng, 50, 800, 1333),
        # edge sizes around the 224 canonical scale and tiny/huge extremes
        np.array([[0, 0, 223, 223], [0, 0, 224, 224], [0, 0, 1, 1],
                  [0, 0, 1332, 799], [10, 10, 10 + 111, 10 + 447]], np.float32),
    ])
    with _np_compat():
        exp = ref_multilevel.map_rois_to_fpn_levels(boxes, 2, 5)
    got = np.asarray(map_rois_to_fpn_levels(boxes, 2, 5))
    np.testing.assert_array_equal(got, exp.astype(np.int32))


def test_multilevel_blob_restore_roundtrip(ref_multilevel, rng):
    """The reference's level-splitting restore-index machinery really is a
    permutation inverse (our design folds this into gather offsets; this
    pins the semantics our folded form must preserve)."""
    # 4-col rois: the reference's test-time caller passes xyxy without the
    # batch column (preprocess_sample.py:43-45; the :53 slice variant is
    # commented out, and add_multilevel_roi_blobs' sanity assert is
    # hard-wired to 4 columns)
    rois = _rand_boxes(rng, 40, 800, 1333)
    blobs = {"rois": rois}
    with _np_compat():
        ref_multilevel.add_multilevel_rois_for_test(blobs, "rois")
    stacked = np.vstack([blobs[f"rois_fpn{l}"] for l in range(2, 6)])
    restore = blobs["rois_idx_restore_int32"]
    np.testing.assert_array_equal(stacked[restore], rois)


def test_fast_rcnn_sample_rois_matches_reference(ref_sample_rois, rng):
    """Seeded sampling: the reference's fast_rcnn_sample_rois and our
    train/sampler.py draw identical fg/bg choices from the same legacy
    MT19937 stream and produce identical labels/targets/weights."""
    from detectorch_tpu.data.coco import RoidbEntry
    from detectorch_tpu.train.sampler import SamplerConfig, sample_rois

    n = 300
    boxes = _rand_boxes(rng, n)
    max_overlaps = rng.uniform(0, 1, n).astype(np.float32)
    max_classes = rng.randint(1, 81, n)
    compact = np.zeros((n, 5), np.float32)
    compact[:, 0] = max_classes
    compact[:, 1:] = rng.randn(n, 4) * 0.2
    roidb = {
        "max_overlaps": max_overlaps,
        "max_classes": max_classes.copy(),
        "boxes": boxes,
        "gt_classes": np.zeros(n, np.int32),
        "box_to_gt_ind_map": np.zeros(n, np.int32),
        "bbox_targets": compact,
    }
    im_scale = 1.5
    np.random.seed(1234)
    with _np_compat():
        exp = ref_sample_rois.fast_rcnn_sample_rois(roidb, im_scale, 0)

    entry = RoidbEntry(
        image_id=0, file_path="", height=480, width=640, boxes=boxes,
        gt_classes=np.zeros(n, np.int32), is_crowd=np.zeros(n, np.uint8),
        max_overlaps=max_overlaps, max_classes=max_classes.copy(),
        box_to_gt_ind_map=np.zeros(n, np.int32), bbox_targets=compact,
    )
    got = sample_rois(entry, im_scale, np.random.RandomState(1234),
                      SamplerConfig())
    nv = int(got["valid"].sum())
    assert nv == exp["rois"].shape[0]
    np.testing.assert_array_equal(got["labels"][:nv], exp["labels_int32"])
    np.testing.assert_allclose(got["rois"][:nv], exp["rois"][:, 1:], rtol=1e-6)
    np.testing.assert_allclose(got["bbox_targets"][:nv], exp["bbox_targets"],
                               rtol=1e-6)
    np.testing.assert_array_equal(got["bbox_inside_weights"][:nv],
                                  exp["bbox_inside_weights"])
    np.testing.assert_array_equal(got["bbox_outside_weights"][:nv],
                                  exp["bbox_outside_weights"])


def test_smooth_l1_and_accuracy_match_reference_loss(ref_loss, rng):
    """Our jnp losses vs the reference's own torch smooth_L1/accuracy
    (loss.py:13-26) executed here (torch is in the image)."""
    import torch

    from detectorch_tpu.train.losses import accuracy, smooth_l1

    n, d = 64, 324
    pred = rng.randn(n, d).astype(np.float32)
    targ = rng.randn(n, d).astype(np.float32)
    a_in = (rng.uniform(0, 1, (n, d)) > 0.5).astype(np.float32)
    a_out = (rng.uniform(0, 1, (n, d)) > 0.3).astype(np.float32)
    for beta in [1.0, 0.5]:
        exp = ref_loss.smooth_L1(
            torch.from_numpy(pred), torch.from_numpy(targ),
            torch.from_numpy(a_in), torch.from_numpy(a_out), beta=beta,
        ).item()
        got = float(smooth_l1(pred, targ, a_in, a_out, beta=beta))
        np.testing.assert_allclose(got, exp, rtol=1e-5)

    logits = rng.randn(n, 81).astype(np.float32)
    labels = rng.randint(0, 81, n)
    exp = ref_loss.accuracy(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(accuracy(logits, labels))
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_parse_th_to_caffe2_matches_our_blob_names(ref_utils_mod):
    """Every backbone blob name our skeleton uses is exactly what the
    reference's parse_th_to_caffe2 (utils.py:44-71) produces from the
    corresponding torchvision parameter name — executed, not transcribed."""
    from detectorch_tpu.models.resnet import init_resnet_params

    skeleton = init_resnet_params("resnet50", include_c5=True)
    blocks = [3, 4, 6, 3]
    produced = set()
    # stem: conv1.weight / bn1.{weight,bias}
    produced.add(ref_utils_mod.parse_th_to_caffe2(["conv1", "weight"]))
    produced.add(ref_utils_mod.parse_th_to_caffe2(["bn1", "weight"]))
    produced.add(ref_utils_mod.parse_th_to_caffe2(["bn1", "bias"]))
    for stage, nb in enumerate(blocks, start=1):
        for b in range(nb):
            for conv in ["conv1", "conv2", "conv3"]:
                produced.add(ref_utils_mod.parse_th_to_caffe2(
                    [f"layer{stage}", str(b), conv, "weight"]))
            for bn in ["bn1", "bn2", "bn3"]:
                for p in ["weight", "bias"]:
                    produced.add(ref_utils_mod.parse_th_to_caffe2(
                        [f"layer{stage}", str(b), bn, p]))
            if b == 0:
                produced.add(ref_utils_mod.parse_th_to_caffe2(
                    [f"layer{stage}", str(b), "downsample", "0", "weight"]))
                for p, suffix in [("weight", None), ("bias", None)]:
                    produced.add(ref_utils_mod.parse_th_to_caffe2(
                        [f"layer{stage}", str(b), "downsample", "1", p]))
    assert produced == set(skeleton.keys())


# ---------------------------------------------------------------------------
# Data layer: the reference's OWN json_dataset.py / roidb.py executed end to
# end (previously blocked by pycocotools; now backed by our native COCO
# index via _PycocoCocoShim) and compared entry-by-entry against
# detectorch_tpu.data.coco on the same synthetic COCO set + proposal file.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_json_dataset(ref_boxes):
    return _load_ref_stubbed(
        "data/json_dataset.py", "json_dataset", _with_utils_pkg(ref_boxes)
    )


@pytest.fixture(scope="module")
def ref_segms():
    return _load_ref_stubbed("utils/segms.py", "segms")


@pytest.fixture(scope="module")
def ref_roidb_mod(ref_boxes, ref_segms, ref_json_dataset):
    def extra(reg):
        utils_pkg = types.ModuleType("utils")
        utils_pkg.boxes = ref_boxes
        utils_pkg.segms = ref_segms
        reg("utils", utils_pkg)
        reg("utils.boxes", ref_boxes)
        reg("utils.segms", ref_segms)
        data_pkg = types.ModuleType("data")
        data_pkg.json_dataset = ref_json_dataset
        reg("data", data_pkg)
        reg("data.json_dataset", ref_json_dataset)

    return _load_ref_stubbed("data/roidb.py", "roidb", extra)


@pytest.fixture(scope="module")
def data_oracle_set(tmp_path_factory):
    """Small synthetic COCO set + proposal pickle shared by the data-layer
    oracle tests (6 images, crowd every 8th annotation)."""
    from detectorch_tpu.data.synth import build_synth_coco, write_proposals_pkl

    root = str(tmp_path_factory.mktemp("ref_data_oracle"))
    ann, imdir = build_synth_coco(root, n_images=6, height=160, width=224,
                                  seed=11, max_objects=4)
    prop = write_proposals_pkl(ann, f"{root}/props.pkl",
                               per_image_random=20, jitters_per_gt=4, seed=2)
    return ann, imdir, prop


@pytest.fixture(scope="module")
def kp_oracle_set(tmp_path_factory):
    from detectorch_tpu.data.synth import build_synth_coco

    root = str(tmp_path_factory.mktemp("ref_kp_oracle"))
    return build_synth_coco(root, n_images=4, height=160, width=224,
                            seed=13, max_objects=3, with_keypoints=True)


def _entry_pairs(ref_roidb, our_roidb):
    assert len(ref_roidb) == len(our_roidb)
    return zip(ref_roidb, our_roidb)


def _assert_entries_equal(r, o, check_targets=False):
    assert r["height"] == o.height and r["width"] == o.width
    np.testing.assert_array_equal(r["boxes"], o.boxes)
    np.testing.assert_array_equal(r["gt_classes"], o.gt_classes)
    np.testing.assert_array_equal(
        np.asarray(r["is_crowd"], np.uint8), o.is_crowd
    )
    np.testing.assert_array_equal(r["box_to_gt_ind_map"], o.box_to_gt_ind_map)
    np.testing.assert_array_equal(r["max_classes"], o.max_classes)
    np.testing.assert_array_equal(r["max_overlaps"], o.max_overlaps)
    assert len(r["segms"]) == len(o.segms)
    for rs, os_ in zip(r["segms"], o.segms):
        for rp, op in zip(rs, os_):
            np.testing.assert_allclose(rp, op)
    if check_targets:
        np.testing.assert_array_equal(r["bbox_targets"], o.bbox_targets)


def test_jsondataset_metadata_matches_reference(ref_json_dataset, data_oracle_set):
    """Class list, category id maps and (absent) keypoint metadata of the
    executed reference JsonDataset vs ours, on the same json."""
    from detectorch_tpu.data.coco import CocoDataset

    ann, imdir, _ = data_oracle_set
    ref = ref_json_dataset.JsonDataset(ann, imdir)
    ours = CocoDataset(ann, imdir)
    assert ref.classes == ours.classes
    assert ref.num_classes == ours.num_classes
    assert ref.json_category_id_to_contiguous_id == ours.json_to_contiguous
    assert ref.contiguous_category_id_to_json_id == ours.contiguous_to_json
    assert ref.keypoints is None and ours.keypoints is None


def test_get_roidb_gt_matches_reference(ref_json_dataset, data_oracle_set):
    """gt roidb (sanitised boxes, classes, crowd flags, class assignments,
    polygon segms) — reference pipeline executed vs ours, field by field."""
    from detectorch_tpu.data.coco import CocoDataset

    ann, imdir, _ = data_oracle_set
    with _np_compat():
        ref = ref_json_dataset.JsonDataset(ann, imdir).get_roidb(gt=True)
    ours = CocoDataset(ann, imdir).get_roidb(gt=True)
    n_boxes = 0
    for r, o in _entry_pairs(ref, ours):
        _assert_entries_equal(r, o)
        n_boxes += len(o.boxes)
    assert n_boxes > 0


def test_get_roidb_proposals_matches_reference(ref_json_dataset, data_oracle_set):
    """Proposal-file path: clip, dedup, min-size filter, overlap merge,
    crowd filtering (through the executed pycocotools-iou semantics) and
    final class assignments all equal."""
    from detectorch_tpu.data.coco import CocoDataset

    ann, imdir, prop = data_oracle_set
    with _np_compat():
        ref = ref_json_dataset.JsonDataset(ann, imdir).get_roidb(
            gt=True, proposal_file=prop, crowd_filter_thresh=0.7
        )
    ours = CocoDataset(ann, imdir).get_roidb(
        gt=True, proposal_file=prop, crowd_filter_thresh=0.7
    )
    some_proposals = some_filtered = False
    for r, o in _entry_pairs(ref, ours):
        _assert_entries_equal(r, o)
        some_proposals |= (o.gt_classes == 0).any()
        some_filtered |= (o.max_overlaps == -1).any()
    assert some_proposals, "proposal file contributed no boxes"
    assert some_filtered, "crowd filter never fired — weak fixture"


def test_roidb_for_training_matches_reference(ref_roidb_mod, data_oracle_set):
    """The full training-roidb pipeline — flips (boxes AND polygon segms via
    the reference's executed segm_utils.flip_segms), validity filtering and
    bbox regression targets — reference vs ours."""
    from detectorch_tpu.data.coco import roidb_for_training

    ann, imdir, prop = data_oracle_set
    with _np_compat():
        ref = ref_roidb_mod.roidb_for_training(
            ann, imdir, (prop,), train_crowd_filter_thresh=0.7
        )
    _, ours = roidb_for_training(ann, imdir, proposal_file=prop,
                                 crowd_filter_thresh=0.7)
    assert len(ref) == len(ours)
    n_flipped = 0
    for r, o in _entry_pairs(ref, ours):
        assert bool(r["flipped"]) == o.flipped
        n_flipped += o.flipped
        _assert_entries_equal(r, o, check_targets=True)
    assert n_flipped > 0


def test_keypoint_roidb_matches_reference(ref_json_dataset, kp_oracle_set):
    """Keypoint dataset init (names, count, flip map) and per-gt keypoint
    arrays — the reference stores (3, P) per object (json_dataset.py:297-314),
    ours the (P, 3) transpose — plus has_visible_keypoints."""
    from detectorch_tpu.data.coco import CocoDataset

    ann, imdir = kp_oracle_set
    ref_ds = ref_json_dataset.JsonDataset(ann, imdir)
    ours_ds = CocoDataset(ann, imdir)
    assert ref_ds.keypoints == ours_ds.keypoints
    assert ref_ds.num_keypoints == ours_ds.num_keypoints == 17
    assert ref_ds.keypoint_flip_map == ours_ds.keypoint_flip_map
    with _np_compat():
        ref = ref_ds.get_roidb(gt=True)
    ours = ours_ds.get_roidb(gt=True)
    saw_visible = False
    for r, o in _entry_pairs(ref, ours):
        np.testing.assert_array_equal(r["boxes"], o.boxes)
        assert o.gt_keypoints is not None
        np.testing.assert_array_equal(
            r["gt_keypoints"].transpose(0, 2, 1).astype(np.float64),
            o.gt_keypoints.astype(np.float64),
        )
        has_vis = (o.gt_keypoints[:, :, 2] > 0).any()
        assert bool(r["has_visible_keypoints"]) == bool(has_vis)
        saw_visible |= bool(has_vis)
    assert saw_visible


@pytest.fixture(scope="module")
def ref_jde(ref_boxes):
    """The reference's json_dataset_evaluator.py, executed. Needs
    utils.io.save_object (stubbed: unused by the function under test) and
    pycocotools.cocoeval (inert placeholder, imported at module top only)."""

    def extra(reg):
        _with_utils_pkg(ref_boxes)(reg)
        io_mod = types.ModuleType("utils.io")
        io_mod.save_object = lambda obj, path: None
        sys.modules["utils"].io = io_mod
        reg("utils.io", io_mod)
        ce = types.ModuleType("pycocotools.cocoeval")
        ce.COCOeval = object
        sys.modules["pycocotools"].cocoeval = ce
        reg("pycocotools.cocoeval", ce)

    return _load_ref_stubbed(
        "utils/json_dataset_evaluator.py", "json_dataset_evaluator", extra
    )


@pytest.mark.parametrize("area,limit", [
    ("all", None), ("all", 30), ("small", None), ("medium", None),
    ("large", None), ("96-128", None),
])
def test_proposal_recall_matches_reference(ref_jde, ref_json_dataset,
                                           data_oracle_set, area, limit):
    """evaluate_box_proposals — the reference's own evaluator run on the
    executed reference roidb vs ours on our roidb: identical recall curve,
    AR, num_pos and sorted gt-overlap vector, across area bins and a
    proposal limit (seg-area binning, inclusive bounds, num_pos
    denominator — each of which an earlier draft of ours got wrong)."""
    from detectorch_tpu.data.coco import CocoDataset
    from detectorch_tpu.eval.coco_eval import evaluate_box_proposals

    ann, imdir, prop = data_oracle_set
    with _np_compat():
        ref_roidb = ref_json_dataset.JsonDataset(ann, imdir).get_roidb(
            gt=True, proposal_file=prop, crowd_filter_thresh=0.7
        )
        exp = ref_jde.evaluate_box_proposals(
            None, ref_roidb, area=area, limit=limit
        )

    ours_roidb = CocoDataset(ann, imdir).get_roidb(
        gt=True, proposal_file=prop, crowd_filter_thresh=0.7
    )
    props, gts, seg_areas = [], [], []
    for e in ours_roidb:
        gt_inds = np.where((e.gt_classes > 0) & (e.is_crowd == 0))[0]
        non_gt = np.where(e.gt_classes == 0)[0]
        props.append(e.boxes[non_gt])
        gts.append(e.boxes[gt_inds])
        seg_areas.append(e.seg_areas[gt_inds])
    got = evaluate_box_proposals(
        props, gts, area=area, limit=limit, gt_seg_areas_per_image=seg_areas
    )
    assert got["num_pos"] == exp["num_pos"]
    np.testing.assert_array_equal(got["gt_overlaps"], exp["gt_overlaps"])
    np.testing.assert_array_equal(got["recalls"], exp["recalls"])
    np.testing.assert_allclose(got["ar"], exp["ar"], rtol=0, atol=0)


# ---------------------------------------------------------------------------
# preprocess_sample / colormap / dummy_datasets — the last importable
# reference modules, executed
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_preproc_sample(ref_boxes):
    """The reference's utils/preprocess_sample.py (the eval notebooks'
    actual sample transform), executed with its real blob / sample-rois /
    multilevel dependencies loaded."""
    blob = _load_ref("blob")
    sr = _load_ref_stubbed("utils/fast_rcnn_sample_rois.py", "ps_sample_rois")
    ml = _load_ref_stubbed(
        "utils/multilevel_rois.py", "ps_multilevel", _with_utils_pkg(ref_boxes)
    )

    def extra(reg):
        utils_pkg = types.ModuleType("utils")
        for nm, mod in [("blob", blob), ("fast_rcnn_sample_rois", sr),
                        ("multilevel_rois", ml)]:
            setattr(utils_pkg, nm, mod)
            reg(f"utils.{nm}", mod)
        reg("utils", utils_pkg)

    return _load_ref_stubbed(
        "utils/preprocess_sample.py", "preprocess_sample", extra
    )


def test_preprocess_sample_c4_matches_reference(ref_preproc_sample, rng):
    """Fast R-CNN test-mode sample prep, C4: image blob, scale factors and
    dedup'd scaled proposals vs the executed reference transform
    (preprocess_sample.py:25-56, eval_fast.ipynb drive)."""
    from detectorch_tpu.data.transforms import (
        PIXEL_MEANS_RGB, dedup_proposals, preprocess_image,
    )

    im = rng.randint(0, 255, (427, 640, 3)).astype(np.float32)
    boxes = _rand_boxes(rng, 60, 427, 640)
    # force feature-roi aliasing so dedup actually removes rows
    boxes = np.vstack([boxes, boxes[:10] + 0.2])
    sample = {"image": im.copy(), "dbentry": {"boxes": boxes.copy()}}
    ps = ref_preproc_sample.preprocess_sample()
    with _np_compat():
        out = ps(sample)

    got_img, scale, (oh, ow) = preprocess_image(
        im, pad_stride=1, buckets=None
    )
    assert scale == float(out["scaling_factors"])
    np.testing.assert_array_equal(
        np.asarray(out["original_im_size"]), [427, 640, 3]
    )
    ref_img = out["image"].numpy()  # (1, 3, H, W)
    np.testing.assert_allclose(
        got_img.transpose(2, 0, 1)[None], ref_img, atol=1e-4
    )
    got_rois, _ = dedup_proposals(boxes * scale, spatial_scale=0.0625)
    ref_rois = out["rois"].numpy()
    assert len(got_rois) < len(boxes)  # dedup really fired
    np.testing.assert_allclose(got_rois, ref_rois, rtol=0, atol=0)


def test_preprocess_sample_fpn_matches_reference(ref_preproc_sample, rng):
    """Fast R-CNN test-mode sample prep, FPN: stride-32 blob padding plus the
    per-level roi distribution keys (preprocess_sample.py:40-45,
    eval_fast_FPN.ipynb drive) vs our preprocess + level routing."""
    import jax.numpy as jnp

    from detectorch_tpu.data.transforms import (
        dedup_proposals, preprocess_image,
    )
    from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels

    im = rng.randint(0, 255, (480, 603, 3)).astype(np.float32)
    boxes = _rand_boxes(rng, 80, 480, 603)
    sample = {"image": im.copy(), "dbentry": {"boxes": boxes.copy()}}
    ps = ref_preproc_sample.preprocess_sample(target_sizes=[800], fpn_on=True)
    with _np_compat():
        out = ps(sample)

    got_img, scale, _ = preprocess_image(im, pad_stride=32, buckets=None)
    np.testing.assert_allclose(
        got_img.transpose(2, 0, 1)[None], out["image"].numpy(), atol=1e-4
    )
    props, _ = dedup_proposals(boxes * scale, spatial_scale=0.0625)
    levels = np.asarray(
        map_rois_to_fpn_levels(jnp.asarray(props, jnp.float32), 2, 5, 224, 4)
    )
    order = []
    for lvl in range(2, 6):
        ref_lvl = out[f"rois_fpn{lvl}"].numpy()
        sel = np.where(levels == lvl)[0]
        np.testing.assert_allclose(props[sel], ref_lvl, rtol=0, atol=0)
        order.append(sel)
    restore = np.argsort(np.concatenate(order))
    np.testing.assert_array_equal(
        restore, out["rois_idx_restore_int32"].numpy().astype(np.int64)
    )


@pytest.fixture(scope="module")
def ref_colormap():
    return _load_ref("colormap")


def test_colormap_matches_reference(ref_colormap):
    from detectorch_tpu.utils.colormap import colormap

    for rgb in (False, True):
        with _np_compat():
            exp = ref_colormap.colormap(rgb=rgb)
        np.testing.assert_allclose(colormap(rgb=rgb), exp, rtol=0, atol=0)


@pytest.fixture(scope="module")
def ref_dummy_datasets():
    def extra(reg):
        coll = _load_ref_stubbed("utils/collections.py", "dd_collections")
        utils_pkg = types.ModuleType("utils")
        utils_pkg.collections = coll
        reg("utils", utils_pkg)
        reg("utils.collections", coll)

    return _load_ref_stubbed("utils/dummy_datasets.py", "dummy_datasets", extra)


def test_dummy_dataset_matches_reference(ref_dummy_datasets):
    from detectorch_tpu.utils.dummy_datasets import get_coco_dataset

    with _np_compat():
        ref_ds = ref_dummy_datasets.get_coco_dataset()
    ours = get_coco_dataset()
    assert list(ref_ds.classes.values()) == list(ours.classes)
    assert len(ref_ds.classes) == ours.num_classes == 81


@pytest.fixture(scope="module")
def ref_training_stats():
    """The reference's utils/training_stats.py executed with its real
    logging/timer dependencies."""
    logging_mod = _load_ref("logging")
    timer_mod = _load_ref("timer")

    def extra(reg):
        utils_pkg = types.ModuleType("utils")
        utils_pkg.logging = logging_mod
        utils_pkg.timer = timer_mod
        reg("utils", utils_pkg)
        reg("utils.logging", logging_mod)
        reg("utils.timer", timer_mod)

    return _load_ref_stubbed(
        "utils/training_stats.py", "training_stats", extra
    )


def test_training_stats_match_reference(ref_training_stats, rng):
    """Median-window smoothing, total-loss tracking and ETA vs the executed
    reference TrainingStats (training_stats.py:35-114, logging.py
    SmoothedValue) over a 60-iteration seeded loss/metric stream."""
    from detectorch_tpu.utils.stats import TrainingStats

    losses = ["loss_cls", "loss_bbox"]
    metrics = ["accuracy_cls"]
    max_iter = 90
    with _np_compat():
        ref = ref_training_stats.TrainingStats(metrics, losses, max_iter)
    ours = TrainingStats(max_iter)

    stream = rng.rand(60, 3).astype(np.float64)
    for i, (lc, lb, acc) in enumerate(stream):
        ldict = {"loss_cls": float(lc), "loss_bbox": float(lb)}
        mdict = {"accuracy_cls": float(acc)}
        with _np_compat():
            ref.UpdateIterStats(ldict, mdict)
        ours.update_iter_stats(i, ldict, mdict)

    # pin identical timer state so the ETA comparison is deterministic
    ref.iter_timer.average_time = 0.37
    ours.iter_timer.average_time = 0.37
    with _np_compat():
        exp = ref.GetStats(cur_iter=60, lr=0.0025)
    got = ours.get_stats(cur_iter=60, lr=0.0025)

    assert got["eta"] == exp["eta"]
    assert "{:.6f}".format(got["lr"]) == exp["lr"]
    assert "{:.6f}".format(got["loss"]) == exp["loss"]
    for k in losses + metrics:
        assert "{:.6f}".format(got[k]) == exp[k], k


@pytest.fixture(scope="module")
def ref_vis():
    """The reference's utils/vis.py executed (cv2 + matplotlib are real;
    pycocotools.mask gets a list-aware decode over our RLE codec)."""
    import matplotlib

    matplotlib.use("Agg")
    from detectorch_tpu.eval import rle as rle_mod

    colormap_mod = _load_ref("colormap")

    def extra(reg):
        utils_pkg = types.ModuleType("utils")
        utils_pkg.colormap = colormap_mod
        reg("utils", utils_pkg)
        reg("utils.colormap", colormap_mod)

        # the reference targets OpenCV 3.x, whose findContours returned
        # (image, contours, hierarchy); OpenCV 4.x dropped the first element
        import cv2 as real_cv2

        cv2_shim = types.ModuleType("cv2")
        cv2_shim.__dict__.update(real_cv2.__dict__)

        def _find_contours(*a, **k):
            out = real_cv2.findContours(*a, **k)
            return out if len(out) == 3 else (None,) + out

        cv2_shim.findContours = _find_contours
        reg("cv2", cv2_shim)
        mask_stub = sys.modules["pycocotools.mask"]  # from _ref_stub_modules

        def _decode(rs):
            rs = rs if isinstance(rs, (list, tuple)) else [rs]
            return np.stack([rle_mod.decode(r) for r in rs], axis=2)

        mask_stub.decode = _decode

    return _load_ref_stubbed("utils/vis.py", "vis", extra)


def _synth_dets(rng, h=120, w=160, n=6):
    from detectorch_tpu.eval import rle as rle_mod

    boxes = _rand_boxes(rng, n, h, w)
    scores = np.linspace(0.95, 0.55, n).astype(np.float32)
    classes = rng.randint(1, 81, n)
    rles = []
    for b in boxes:
        m = np.zeros((h, w), np.uint8)
        x1, y1, x2, y2 = b.astype(int)
        m[y1:y2 + 1, x1:x2 + 1] = 1
        rles.append(rle_mod.encode(np.asfortranarray(m)))
    return boxes, scores, classes, rles


def test_cls_format_roundtrip_through_reference(ref_vis, rng):
    """to_cls_format -> the reference's own convert_from_cls_format
    (vis.py:68-88) recovers the flat detections in class-major order."""
    from detectorch_tpu.utils.vis import to_cls_format

    boxes, scores, classes, rles = _synth_dets(rng)
    cls_boxes, cls_segms, _ = to_cls_format(boxes, scores, classes, rles)
    with _np_compat():
        fb, fs, fk, fc = ref_vis.convert_from_cls_format(
            cls_boxes, cls_segms, None
        )
    order = np.lexsort((np.arange(len(classes)), classes))
    np.testing.assert_allclose(fb[:, :4], boxes[order], rtol=0, atol=0)
    np.testing.assert_allclose(fb[:, 4], scores[order], rtol=0, atol=0)
    assert fc == [int(c) for c in classes[order]]
    assert fs == [rles[i] for i in order]


def test_reference_vis_renders_our_outputs(ref_vis, rng, tmp_path):
    """The reference's own renderers (vis_one_image matplotlib-pdf path
    vis.py:251-392, vis_one_image_opencv vis.py:201-249) consume our
    to_cls_format structures + RLE codec end-to-end."""
    from detectorch_tpu.utils.vis import to_cls_format

    boxes, scores, classes, rles = _synth_dets(rng)
    cls_boxes, cls_segms, _ = to_cls_format(boxes, scores, classes, rles)
    im = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    with _np_compat():
        ref_vis.vis_one_image(
            im, "synth_img", str(tmp_path), cls_boxes, cls_segms,
            thresh=0.6, show_class=True, ext="pdf",
        )
        out = ref_vis.vis_one_image_opencv(
            im.copy(), cls_boxes, cls_segms, thresh=0.6, show_box=True,
            show_class=True,
        )
    pdf = tmp_path / "synth_img.pdf"
    assert pdf.exists() and pdf.stat().st_size > 1000
    assert not np.array_equal(out, im)  # it actually drew
