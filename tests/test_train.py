import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

from detectorch_tpu.config import PRESETS, SamplerConfig, SolverConfig
from detectorch_tpu.data.coco import RoidbEntry
from detectorch_tpu.models.detector import init_params
from detectorch_tpu.train import losses as L
from detectorch_tpu.train import sampler as S
from detectorch_tpu.train import solver as SV
from detectorch_tpu.train.train_step import make_train_step


def test_smooth_l1_matches_torch(rng):
    pred = rng.randn(8, 12).astype(np.float32)
    tgt = rng.randn(8, 12).astype(np.float32)
    iw = (rng.uniform(size=(8, 12)) > 0.5).astype(np.float32)
    ow = (rng.uniform(size=(8, 12)) > 0.3).astype(np.float32)
    got = float(L.smooth_l1(pred, tgt, iw, ow))
    # reference loss.py:13-20 in torch
    d = torch.from_numpy(iw) * (torch.from_numpy(pred) - torch.from_numpy(tgt))
    ad = d.abs()
    sign = (ad < 1.0).float()
    loss = sign * 0.5 * d ** 2 + (1 - sign) * (ad - 0.5)
    exp = float((torch.from_numpy(ow) * loss).sum() / 8)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(16, 81).astype(np.float32)
    labels = rng.randint(0, 81, 16).astype(np.int32)
    got = float(L.softmax_cross_entropy(logits, labels))
    exp = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels).long()))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_lr_schedule_matches_reference():
    cfg = SolverConfig()
    # reference solver.py hand-checks
    np.testing.assert_allclose(float(SV.get_lr_at_iter(0, cfg)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(
        float(SV.get_lr_at_iter(250, cfg)), 0.01 * (1 / 3 * 0.5 + 0.5), rtol=1e-6
    )
    np.testing.assert_allclose(float(SV.get_lr_at_iter(500, cfg)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(SV.get_lr_at_iter(239999, cfg)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(SV.get_lr_at_iter(240000, cfg)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(SV.get_lr_at_iter(350000, cfg)), 0.0001, rtol=1e-6)


def make_entry(rng, n_gt=2, n_props=40):
    h, w = 120, 160
    gt_boxes = np.array([[10, 10, 60, 60], [70, 30, 120, 100]], np.float32)[:n_gt]
    props = []
    for _ in range(n_props):
        x1 = rng.uniform(0, w - 30)
        y1 = rng.uniform(0, h - 30)
        props.append([x1, y1, x1 + rng.uniform(10, 60), y1 + rng.uniform(10, 60)])
    props = np.asarray(props, np.float32)
    props[:, [0, 2]] = np.clip(props[:, [0, 2]], 0, w - 1)
    props[:, [1, 3]] = np.clip(props[:, [1, 3]], 0, h - 1)
    boxes = np.vstack([gt_boxes, props])
    from detectorch_tpu.data.coco import _np_bbox_overlaps

    ov = _np_bbox_overlaps(boxes, gt_boxes)
    max_ov = ov.max(1)
    classes = np.array([1, 2])[:n_gt][ov.argmax(1)]
    max_cls = np.where(max_ov > 0, classes, 0)
    e = RoidbEntry(
        image_id=1, file_path="", height=h, width=w,
        boxes=boxes,
        gt_classes=np.concatenate([np.array([1, 2])[:n_gt], np.zeros(n_props, np.int32)]),
        is_crowd=np.zeros(len(boxes), np.uint8),
        max_overlaps=max_ov,
        max_classes=max_cls.astype(np.int32),
        box_to_gt_ind_map=ov.argmax(1).astype(np.int32),
    )
    return e


def test_sampler_fixed_shapes_and_ratios(rng):
    e = make_entry(rng)
    cfg = SamplerConfig(rois_per_image=64)
    blobs = S.sample_rois(e, im_scale=2.0, rng=rng, cfg=cfg)
    assert blobs["rois"].shape == (64, 4)
    assert blobs["labels"].shape == (64,)
    assert blobs["bbox_targets"].shape == (64, 324)
    n_valid = blobs["valid"].sum()
    assert 0 < n_valid <= 64
    # fg count <= 25%
    assert (blobs["labels"] > 0).sum() <= round(0.25 * 64)
    # rois scaled by im_scale: all within 2x image bounds
    v = blobs["valid"]
    assert blobs["rois"][v, 2].max() <= e.width * 2
    # fg rows have nonzero inside weights at their class slot
    fg = np.where(blobs["labels"] > 0)[0]
    for i in fg:
        c = blobs["labels"][i]
        assert blobs["bbox_inside_weights"][i, 4 * c : 4 * c + 4].sum() == 4.0


def test_expand_bbox_targets():
    compact = np.array([[0, 0, 0, 0, 0], [3, 0.1, 0.2, 0.3, 0.4]], np.float32)
    t, iw = S.expand_bbox_targets(compact, num_classes=5)
    assert t.shape == (2, 20)
    assert t[0].sum() == 0 and iw[0].sum() == 0
    np.testing.assert_allclose(t[1, 12:16], [0.1, 0.2, 0.3, 0.4])
    np.testing.assert_allclose(iw[1, 12:16], 1.0)
    assert iw[1].sum() == 4.0


def test_train_step_learns(rng):
    cfg = PRESETS["fast_rcnn_R-50-C4_2x"].replace(compute_dtype="float32")
    params = init_params(cfg, seed=0)
    # random-init backbones have O(10) feature scales (real training starts
    # from ImageNet weights), so use a small lr for this overfit check
    solver = SolverConfig(base_lr=1e-4, warmup_iters=0, weight_decay=0.0)
    init_state, make_step = make_train_step(cfg, solver)
    state, tx = init_state(params)
    step = jax.jit(make_step(tx))

    e = make_entry(rng)
    scfg = SamplerConfig(rois_per_image=32)
    b = S.sample_rois(e, 0.5, rng, scfg)
    image = rng.randn(64, 80, 3).astype(np.float32)
    batch = {
        "image": image[None],
        "rois": b["rois"][None],
        "labels": b["labels"][None],
        "bbox_targets": b["bbox_targets"][None],
        "bbox_inside_weights": b["bbox_inside_weights"][None],
        "bbox_outside_weights": b["bbox_outside_weights"][None],
        "valid": b["valid"][None],
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits a single batch
    # frozen layers unchanged
    np.testing.assert_array_equal(
        np.asarray(state.params["conv1_w"]), np.asarray(params["conv1_w"])
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["res2_0_branch2a_w"]),
        np.asarray(params["res2_0_branch2a_w"]),
    )
    # trainable layers changed
    assert not np.array_equal(
        np.asarray(state.params["cls_score_w"]), np.asarray(params["cls_score_w"])
    )


def test_optimizer_state_checkpoint_roundtrip(tmp_path, rng):
    """Full training state (params + optimizer momentum) must survive
    save/restore — the reference saved optimizer state too
    (train_fast.py:177-183), though its restore was never implemented."""
    from detectorch_tpu.checkpoint import store

    cfg = PRESETS["fast_rcnn_R-50-C4_2x"].replace(compute_dtype="float32")
    params = init_params(cfg, seed=0)
    solver = SolverConfig(base_lr=1e-4, warmup_iters=0, weight_decay=0.0)
    init_state, make_step = make_train_step(cfg, solver)
    state, tx = init_state(params)
    step = jax.jit(make_step(tx))
    e = make_entry(rng)
    b = S.sample_rois(e, 0.5, rng, SamplerConfig(rois_per_image=16))
    image = rng.randn(64, 80, 3).astype(np.float32)
    batch = {k: v[None] for k, v in dict(
        image=image, rois=b["rois"], labels=b["labels"],
        bbox_targets=b["bbox_targets"],
        bbox_inside_weights=b["bbox_inside_weights"],
        bbox_outside_weights=b["bbox_outside_weights"], valid=b["valid"],
    ).items()}
    state, _ = step(state, batch)  # build nonzero momentum
    tree = {
        "step": np.int32(1),
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    store.save_checkpoint(str(tmp_path), 1, tree)
    restored = store.restore_checkpoint(store.latest_checkpoint(str(tmp_path)), tree)
    # momentum (trace) leaves restored exactly
    orig_leaves = jax.tree.leaves(tree["opt_state"])
    rest_leaves = jax.tree.leaves(restored["opt_state"])
    assert len(orig_leaves) == len(rest_leaves)
    nonzero = 0
    for a, c in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        nonzero += int(np.any(np.asarray(a) != 0))
    assert nonzero > 0  # momentum actually carried information


def test_checkpoint_save_restore(tmp_path, rng):
    from detectorch_tpu.checkpoint import store

    tree = {"params": {"w": rng.randn(4, 4).astype(np.float32)}, "step": np.int32(7)}
    store.save_checkpoint(str(tmp_path), 7, tree)
    assert store.latest_checkpoint(str(tmp_path)).endswith("ckpt-7")
    restored = store.restore_checkpoint(store.latest_checkpoint(str(tmp_path)), tree)
    np.testing.assert_array_equal(restored["params"]["w"], tree["params"]["w"])
    assert int(restored["step"]) == 7


def test_expand_bbox_targets_device_matches_host(rng):
    """Device-side 4-of-4K expansion == the host sampler's (which is itself
    verified against the reference's _expand_bbox_targets)."""
    from detectorch_tpu.train.train_step import expand_bbox_targets_device

    n, k = 64, 81
    compact = np.zeros((n, 5), np.float32)
    cls = rng.randint(0, k, n)
    compact[:, 0] = cls
    compact[:, 1:] = rng.randn(n, 4)
    t_host, iw_host = S.expand_bbox_targets(compact, k)
    t_dev, iw_dev = expand_bbox_targets_device(jnp.asarray(compact), k)
    np.testing.assert_array_equal(np.asarray(t_dev), t_host)
    np.testing.assert_array_equal(np.asarray(iw_dev), iw_host)


def test_train_step_device_input_matches_host_blob(rng):
    """The uint8 device-input schema (raw + tables + meta + compact
    targets) must produce the same loss and the same update as the
    host-blob schema on identical data — the resize differs from cv2 only
    in float32 blend order."""
    from detectorch_tpu.data.device_input import prepare_raw

    cfg = PRESETS["fast_rcnn_R-50-C4_2x"].replace(compute_dtype="float32")
    params = init_params(cfg, seed=0)
    solver = SolverConfig(base_lr=1e-4, warmup_iters=0, weight_decay=0.0)

    blob_hw = (96, 128)
    im = (rng.uniform(size=(70, 100, 3)) * 255).astype(np.uint8)
    raw, m = prepare_raw(im, target_size=64, max_size=128, buckets=(blob_hw,))
    scale = m["scale"]

    e = make_entry(rng)
    scfg = SamplerConfig(rois_per_image=32)
    state_rng = np.random.RandomState(7)
    b = S.sample_rois(e, scale, state_rng, scfg)
    state_rng = np.random.RandomState(7)
    bc = S.sample_rois(e, scale, state_rng, scfg, compact_targets=True)
    np.testing.assert_array_equal(b["rois"], bc["rois"])

    # host-blob path on the cv2-resized image
    from detectorch_tpu.data.transforms import preprocess_image

    image, scale2, _ = preprocess_image(im, 64, 128, buckets=(blob_hw,))
    assert scale2 == scale
    init_state, make_step = make_train_step(cfg, solver)
    s1, tx1 = init_state(params)
    step1 = jax.jit(make_step(tx1))
    s1, m1 = step1(s1, {
        "image": image[None], "rois": b["rois"][None],
        "labels": b["labels"][None], "bbox_targets": b["bbox_targets"][None],
        "bbox_inside_weights": b["bbox_inside_weights"][None],
        "bbox_outside_weights": b["bbox_outside_weights"][None],
        "valid": b["valid"][None],
    })

    # device-input path on the raw uint8
    L_ = max(m["out_h"], m["out_w"])
    tables = np.zeros((4, L_), np.float32)
    t = m["tables"]
    tables[0, : m["out_h"]] = t["y_i0"]
    tables[1, : m["out_h"]] = t["y_w1"]
    tables[2, : m["out_w"]] = t["x_i0"]
    tables[3, : m["out_w"]] = t["x_w1"]
    meta = np.asarray([m["raw_h"], m["raw_w"], m["rsz_h"], m["rsz_w"],
                       scale, m["orig_h"], m["orig_w"]], np.float32)
    init_state2, make_step2 = make_train_step(
        cfg, solver, device_input=True, blob_hw=blob_hw
    )
    s2, tx2 = init_state2(params)
    step2 = jax.jit(make_step2(tx2))
    s2, m2 = step2(s2, {
        "raw": raw[None], "tables": tables[None], "meta": meta[None],
        "rois": bc["rois"][None], "labels": bc["labels"][None],
        "bbox_targets_compact": bc["bbox_targets_compact"][None],
        "valid": bc["valid"][None],
    })
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-4)
    # updates agree (same data, same optimizer)
    np.testing.assert_allclose(
        np.asarray(s2.params["cls_score_w"]),
        np.asarray(s1.params["cls_score_w"]), rtol=1e-3, atol=1e-6,
    )


def test_polys_to_mask_wrt_box():
    """Upstream polys_to_mask_wrt_box semantics: rasterise in roi frame."""
    box = np.array([10.0, 20.0, 50.0, 60.0])
    # polygon == the box itself -> (near-)full mask
    full = [[10, 20, 50, 20, 50, 60, 10, 60]]
    m = S.polys_to_mask_wrt_box(full, box, 28)
    assert m.shape == (28, 28) and m.dtype == np.uint8
    assert m.mean() > 0.9
    # left half of the box -> left columns set, right columns clear
    half = [[10, 20, 30, 20, 30, 60, 10, 60]]
    m = S.polys_to_mask_wrt_box(half, box, 28)
    assert m[:, :12].mean() > 0.9
    assert m[:, 16:].mean() == 0.0
    # polygon fully outside the box -> empty
    out = [[100, 100, 120, 100, 120, 120, 100, 120]]
    assert S.polys_to_mask_wrt_box(out, box, 28).sum() == 0


def test_mask_loss_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    from detectorch_tpu.train import losses as L

    rm, m, k = 6, 14, 7
    logits = rng.randn(rm, m, m, k).astype(np.float32)
    targets = (rng.rand(rm, m, m) > 0.5).astype(np.uint8)
    labels = rng.randint(1, k, rm)
    valid = np.array([True, True, True, False, True, False])

    got = float(L.mask_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(labels),
        jnp.asarray(valid),
    ))
    sel = np.where(valid)[0]
    cls = logits[sel, :, :, :][np.arange(len(sel)), :, :, labels[sel]]
    exp = F.binary_cross_entropy_with_logits(
        torch.from_numpy(cls), torch.from_numpy(targets[sel]).float(),
        reduction="mean",
    ).item()
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_sampler_mask_targets(rng):
    e = make_entry(rng)
    # rectangle polygons exactly covering each gt box
    e.segms.extend([
        [[10, 10, 60, 10, 60, 60, 10, 60]],
        [[70, 30, 120, 30, 120, 100, 70, 100]],
    ])
    cfg = SamplerConfig(rois_per_image=32)
    b = S.sample_rois(e, 1.0, rng, cfg, mask_resolution=28)
    assert b["mask_targets"].shape == (32, 28, 28)
    fg = np.where(b["labels"] > 0)[0]
    assert b["mask_valid"][fg].all()
    assert not b["mask_valid"][len(fg):].any()
    # a gt roi sampled as fg gets a (near-)full target (poly == its box)
    for i in fg:
        assert b["mask_targets"][i].any()


def test_train_step_mask_branch(rng):
    """One jitted Mask R-CNN training step (box + mask losses): runs, emits a
    finite positive loss_mask, and the gradient reaches the mask head."""
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    params = init_params(cfg, seed=0)
    solver = SolverConfig(base_lr=1e-4, warmup_iters=0, weight_decay=0.0)
    init_state, make_step = make_train_step(cfg, solver, train_mask=True)
    state, tx = init_state(params)
    step = jax.jit(make_step(tx))

    e = make_entry(rng)
    e.segms.extend([
        [[10, 10, 60, 10, 60, 60, 10, 60]],
        [[70, 30, 120, 30, 120, 100, 70, 100]],
    ])
    scfg = SamplerConfig(rois_per_image=32)
    rm = int(np.round(scfg.fg_fraction * scfg.rois_per_image))
    b = S.sample_rois(e, 0.5, rng, scfg, mask_resolution=cfg.mask.resolution)
    image = rng.randn(64, 128, 3).astype(np.float32)  # /64-divisible (FPN)
    batch = {
        "image": image[None],
        "rois": b["rois"][None],
        "labels": b["labels"][None],
        "bbox_targets": b["bbox_targets"][None],
        "bbox_inside_weights": b["bbox_inside_weights"][None],
        "bbox_outside_weights": b["bbox_outside_weights"][None],
        "valid": b["valid"][None],
        "mask_targets": b["mask_targets"][:rm][None],
        "mask_valid": b["mask_valid"][:rm][None],
    }
    before = np.asarray(state.params["_[mask]_fcn1_w"]).copy()
    state, metrics = step(state, batch)
    lm = float(metrics["loss_mask"])
    assert np.isfinite(lm) and lm > 0
    after = np.asarray(state.params["_[mask]_fcn1_w"])
    assert np.abs(before - after).max() > 0  # gradient reached the mask head


def test_train_step_mask_loss_decreases(rng):
    """Overfit one batch: the mask loss itself must fall (the branch learns,
    not just receives gradient)."""
    cfg = PRESETS["e2e_mask_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    params = init_params(cfg, seed=1)
    solver = SolverConfig(base_lr=5e-4, warmup_iters=0, weight_decay=0.0)
    init_state, make_step = make_train_step(cfg, solver, train_mask=True)
    state, tx = init_state(params)
    step = jax.jit(make_step(tx))

    e = make_entry(rng)
    e.segms.extend([
        [[10, 10, 60, 10, 60, 60, 10, 60]],
        [[70, 30, 120, 30, 120, 100, 70, 100]],
    ])
    scfg = SamplerConfig(rois_per_image=32)
    rm = int(np.round(scfg.fg_fraction * scfg.rois_per_image))
    b = S.sample_rois(e, 0.5, rng, scfg, mask_resolution=cfg.mask.resolution)
    image = rng.randn(64, 128, 3).astype(np.float32)
    batch = {
        "image": image[None],
        "rois": b["rois"][None],
        "labels": b["labels"][None],
        "bbox_targets": b["bbox_targets"][None],
        "bbox_inside_weights": b["bbox_inside_weights"][None],
        "bbox_outside_weights": b["bbox_outside_weights"][None],
        "valid": b["valid"][None],
        "mask_targets": b["mask_targets"][:rm][None],
        "mask_valid": b["mask_valid"][:rm][None],
    }
    ml = []
    for _ in range(8):
        state, metrics = step(state, batch)
        ml.append(float(metrics["loss_mask"]))
    assert np.isfinite(ml).all()
    assert ml[-1] < ml[0]


def test_train_step_pallas_roi_align_matches_gather(rng):
    """roi_align_impl='pallas' (slab forward + gather VJP; 19% faster step
    on TPU) must produce the same losses and near-identical updates as the
    gather formulation on in-slab rois."""
    import jax

    from detectorch_tpu.config import PRESETS, SolverConfig
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.train.train_step import make_train_step

    cfg = PRESETS["fast_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    params = init_params(cfg, seed=0)
    b, r, k = 1, 16, cfg.num_classes
    rois = np.stack([
        np.stack([
            rng.uniform(0, 40, r), rng.uniform(0, 30, r),
            rng.uniform(48, 120, r), rng.uniform(40, 60, r),
        ], axis=1)
    ]).astype(np.float32)
    batch = {
        "image": (rng.randn(b, 64, 128, 3) * 10).astype(np.float32),
        "rois": rois,
        "labels": rng.randint(0, k, (b, r)).astype(np.int32),
        "bbox_targets": np.zeros((b, r, 4 * k), np.float32),
        "bbox_inside_weights": np.zeros((b, r, 4 * k), np.float32),
        "bbox_outside_weights": np.zeros((b, r, 4 * k), np.float32),
        "valid": np.ones((b, r), bool),
    }

    def run(impl):
        init_state, make_step = make_train_step(
            cfg, SolverConfig(base_lr=1e-3, warmup_iters=0),
            roi_align_impl=impl)
        state, tx = init_state(params)
        step = jax.jit(make_step(tx))
        state, metrics = step(state, batch)
        return {kk: float(v) for kk, v in metrics.items()}

    mg = run("gather")
    mp = run("pallas")
    for key in ("loss", "loss_cls", "loss_bbox"):
        np.testing.assert_allclose(mp[key], mg[key], rtol=1e-4, atol=1e-5)
    # slab-overflow observability: the Pallas path reports the fraction of
    # sampled rois with crop-clamped features; on standard-bucket-style
    # rois it must be exactly 0 (and the key must exist — a user training
    # on extreme-aspect data sees it rise instead of silent clamping)
    assert mp["frac_rois_overflowed"] == 0.0
    assert "frac_rois_overflowed" not in mg  # gather path is always exact


def test_train_step_matmul_bwd_matches_gather(rng):
    """roi_align_impl='pallas-mm' (slab forward + separable-MATMUL VJP;
    replaces the gather VJP's scatter-add, measured -30% step time on TPU).
    Losses are forward-path (must match 'pallas' exactly); the backward
    difference is bf16 rounding of the hat weights, so the parameter UPDATE
    through the RoIAlign (the FPN laterals — their only gradient path is
    the RoIAlign cotangent) must agree in direction and magnitude."""
    import jax

    from detectorch_tpu.config import PRESETS, SolverConfig
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.train.train_step import make_train_step

    cfg = PRESETS["fast_rcnn_R-50-FPN_2x"].replace(compute_dtype="float32")
    params = init_params(cfg, seed=0)
    b, r, k = 1, 16, cfg.num_classes
    rois = np.stack([
        np.stack([
            rng.uniform(0, 40, r), rng.uniform(0, 30, r),
            rng.uniform(48, 120, r), rng.uniform(40, 60, r),
        ], axis=1)
    ]).astype(np.float32)
    batch = {
        "image": (rng.randn(b, 64, 128, 3) * 10).astype(np.float32),
        "rois": rois,
        "labels": rng.randint(0, k, (b, r)).astype(np.int32),
        "bbox_targets": np.zeros((b, r, 4 * k), np.float32),
        "bbox_inside_weights": np.zeros((b, r, 4 * k), np.float32),
        "bbox_outside_weights": np.zeros((b, r, 4 * k), np.float32),
        "valid": np.ones((b, r), bool),
    }

    def run(impl):
        init_state, make_step = make_train_step(
            cfg, SolverConfig(base_lr=1e-3, warmup_iters=0),
            roi_align_impl=impl)
        state, tx = init_state(params)
        step = jax.jit(make_step(tx))
        state, metrics = step(state, batch)
        return ({kk: float(v) for kk, v in metrics.items()}, state.params)

    mg, pg = run("gather")
    mm, pm = run("pallas-mm")
    for key in ("loss", "loss_cls", "loss_bbox"):
        np.testing.assert_allclose(mm[key], mg[key], rtol=1e-4, atol=1e-5)

    for leaf in ("fpn_inner_res4_5_sum_lateral_w", "fpn_res3_3_sum_w"):
        dg = np.asarray(pg[leaf]) - np.asarray(params[leaf])
        dm = np.asarray(pm[leaf]) - np.asarray(params[leaf])
        assert np.abs(dg).max() > 0  # the update is non-trivial
        cos = float((dg * dm).sum() /
                    (np.linalg.norm(dg) * np.linalg.norm(dm) + 1e-30))
        assert cos > 0.999, (leaf, cos)
        np.testing.assert_allclose(np.linalg.norm(dm), np.linalg.norm(dg),
                                   rtol=2e-2)
