"""Dataset-level inference + COCO evaluation driver.

Replaces the reference's eval notebooks (``eval_*.ipynb`` cell 10 loops) and
``lib/utils/json_dataset_evaluator.py:40-235``: run the jit-compiled model
over a dataset, collect COCO-format results (bbox xywh with the reference's
+1 width convention, segm RLE strings), and score with the native COCOeval.

Programs are compiled once per (config, shape bucket); images stream through
with host preprocessing overlapped against device compute via simple
double-buffering (submit next before blocking on previous).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from detectorch_tpu.config import ModelConfig, TestConfig
from detectorch_tpu.data import transforms as T
from detectorch_tpu.data.coco import CocoDataset, RoidbEntry
from detectorch_tpu.eval import mask_paste
from detectorch_tpu.eval.coco_eval import COCOeval
from detectorch_tpu.models.detector import make_inference_fn


def detections_to_coco_bbox(det_boxes, det_scores, det_classes, image_id, contiguous_to_json):
    """xyxy -> xywh with the +1 convention (reference
    json_dataset_evaluator.py:165-190 via boxes.xyxy_to_xywh)."""
    out = []
    for box, score, cls in zip(det_boxes, det_scores, det_classes):
        x1, y1, x2, y2 = [float(v) for v in box]
        out.append(
            {
                "image_id": int(image_id),
                "category_id": int(contiguous_to_json[int(cls)]),
                "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                "score": float(score),
            }
        )
    return out


def detections_to_coco_keypoints(keypoints, det_scores, det_classes, image_id,
                                 contiguous_to_json,
                                 confidence: str = "bbox"):
    """(k, P, 4) decoded keypoints -> COCO keypoint result dicts:
    per keypoint [x, y, v=1], detection score per `confidence` mode
    (reference json_dataset_evaluator.py:371-417; kps rows there are
    (4, P) [x, y, logit, prob] — ours are keypoint-major)."""
    if confidence == "bbox":
        score_col = None
    elif confidence == "logit":
        score_col = 2
    elif confidence == "prob":
        score_col = 3
    else:
        raise ValueError(
            "keypoint_confidence must be 'bbox', 'logit', or 'prob'"
        )
    out = []
    for kp, det_score, cls in zip(keypoints, det_scores, det_classes):
        xyv = np.concatenate(
            [kp[:, :2], np.ones((kp.shape[0], 1), kp.dtype)], axis=1
        )
        score = (
            float(det_score) if score_col is None
            else float(kp[:, score_col].mean())
        )
        out.append(
            {
                "image_id": int(image_id),
                "category_id": int(contiguous_to_json[int(cls)]),
                "keypoints": [float(v) for v in xyv.reshape(-1)],
                "score": score,
            }
        )
    return out


class InferenceEngine:
    def __init__(self, cfg: ModelConfig, test_cfg: TestConfig, params: Dict):
        self.cfg = cfg
        self.test_cfg = test_cfg
        # pin params on device ONCE: passing host numpy params would re-upload
        # ~100 MB through the interconnect on every call
        self.params = jax.tree.map(jnp.asarray, params)
        self._compiled = {}

    # -- program construction ------------------------------------------------

    def _pad_stride(self):
        return self.cfg.fpn.coarsest_stride if self.cfg.use_fpn else 32

    def _buckets(self):
        return None if self.test_cfg.exact_blob_dims else T.DEFAULT_BUCKETS

    def sample_key(self, args):
        """Compile-cache key for one preprocessed sample: the static shapes
        its program is specialised on. Host mode: the blob shape. Device
        mode: (raw bucket, output bucket) — the blob is materialised inside
        the program, and the bucket is recomputed from the meta vector's
        resized dims (host-side numpy, so this is exact)."""
        if not self.test_cfg.device_preprocess:
            return tuple(args[1].shape)
        meta = args[3]
        return (
            tuple(args[1].shape),
            T.bucket_shape(
                int(meta[2]), int(meta[3]), self._pad_stride(), self._buckets()
            ),
        )

    def _needs_exact_check(self):
        """True if the fast program can flag an inexact result needing the
        exact-variant rerun: Pallas slab overflow and/or NMS-prefilter
        class overflow."""
        return (
            (self.cfg.use_fpn and self.cfg.use_pallas_roi_align)
            or self.test_cfg.nms_topk_prefilter > 0
        )

    def _wrap_raw(self, fwd, key):
        """Wrap an (params, image, im_scale, orig_h, orig_w, *extra) program
        so it consumes the packed raw-uint8 device-preprocess arguments
        instead of a host-built fp32 blob."""
        from detectorch_tpu.data.device_input import device_preprocess

        (_, (out_h, out_w)) = key

        def raw_fwd(params, raw, tables, meta, *extra):
            # tables (4, L) f32: [y_i0, y_w1, x_i0, x_w1] padded to
            # L = max(out_h, out_w); meta (7,) f32: raw_h, raw_w, rsz_h,
            # rsz_w, scale, orig_h, orig_w. One upload each per batch —
            # every extra array argument costs a full RPC on a tunneled
            # backend (measured ~40 ms apiece)
            image = device_preprocess(
                raw,
                tables[0, :out_h].astype(jnp.int32), tables[1, :out_h],
                tables[2, :out_w].astype(jnp.int32), tables[3, :out_w],
                meta[0].astype(jnp.int32), meta[1].astype(jnp.int32),
                meta[2].astype(jnp.int32), meta[3].astype(jnp.int32),
            )
            return fwd(params, image, meta[4], meta[5], meta[6], *extra)

        return raw_fwd

    def build_single(self, key, exact: bool = False):
        """Unjitted single-sample callable for this key. With
        test_cfg.device_preprocess the uint8->blob conversion (resize, mean
        subtract, pad; data/device_input.py) is fused into the program, so
        the host uploads raw uint8 (~25x less tunnel traffic than the fp32
        blob). exact=True builds the fallback variant: exact-gather
        RoIAlign and no NMS prefilter."""
        cfg = self.cfg.replace(use_pallas_roi_align=False) if exact else self.cfg
        tcfg = (
            self.test_cfg.replace(nms_topk_prefilter=0)
            if exact else self.test_cfg
        )
        fwd = make_inference_fn(cfg, tcfg)
        if not self.test_cfg.device_preprocess:
            return fwd
        return self._wrap_raw(fwd, key)

    def _fn(self, key):
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self.build_single(key))
        return self._compiled[key]

    def preprocess(self, im_rgb: np.ndarray, proposals: Optional[np.ndarray] = None,
                   target_size: Optional[int] = None):
        """Host-side prep -> (args tuple, orig_h, orig_w). Thread-safe.
        target_size overrides test_cfg.target_size (multi-scale inference)."""
        ts = self.test_cfg.target_size if target_size is None else target_size
        if self.test_cfg.device_preprocess:
            from detectorch_tpu.data.device_input import (
                pack_tables_meta, prepare_raw)

            raw, m = prepare_raw(
                im_rgb, ts, self.test_cfg.max_size,
                pad_stride=self._pad_stride(), buckets=self._buckets(),
            )
            scale, oh, ow = m["scale"], m["orig_h"], m["orig_w"]
            tables, meta = pack_tables_meta(m)
            args = [self.params, raw, tables, meta]
        else:
            image, scale, (oh, ow) = T.preprocess_image(
                im_rgb, ts, self.test_cfg.max_size,
                pad_stride=self._pad_stride(), buckets=self._buckets(),
            )
            args = [
                self.params, image, np.float32(scale),
                np.float32(oh), np.float32(ow),
            ]
        if not self.cfg.use_rpn:
            assert proposals is not None
            scaled = proposals * scale
            scaled, _ = T.dedup_proposals(scaled, self.cfg.spatial_scale)
            padded, valid = T.pad_proposals(scaled, self.test_cfg.max_proposals)
            args += [padded, valid]
        return args, oh, ow

    def submit(self, args):
        """Dispatch the device program asynchronously (jax async dispatch)."""
        return self._fn(self.sample_key(args))(*args)

    def _exact_fn(self, key):
        """Program variant with the exact-gather RoIAlign (used to re-run the
        rare images whose rois overflow the Pallas kernel's slab)."""
        ckey = ("exact", key)
        if ckey not in self._compiled:
            self._compiled[ckey] = jax.jit(self.build_single(key, exact=True))
        return self._compiled[ckey]

    def finalize(self, out, args, oh, ow):
        """Exactness check + collect: if the fast program flagged a Pallas
        slab overflow, re-run this image through the exact variant."""
        if self._needs_exact_check():
            if not bool(np.asarray(out.all_exact)):
                out = self._exact_fn(self.sample_key(args))(*args)
        return self._collect(out, oh, ow)

    def run_image(self, im_rgb: np.ndarray, proposals: Optional[np.ndarray] = None):
        """Single image -> host-side dict of final detections (+ mask rles)."""
        args, oh, ow = self.preprocess(im_rgb, proposals)
        return self.finalize(self.submit(args), args, oh, ow)

    # -- multi-scale (pyramid) inference ------------------------------------

    def _scale_of(self, args) -> float:
        """The im_scale a preprocess() args tuple was built with."""
        return float(args[3][4] if self.test_cfg.device_preprocess else args[2])

    def _merge_fn(self, nscales: int):
        """Jitted multi-scale merge: decode each scale's pre-NMS candidates
        to original-image coords, union them, and run the reference
        threshold/per-class-NMS/global-cap ONCE over the union. Always the
        exact (no-prefilter) NMS — this is a latency/accuracy path."""
        ckey = ("msmerge", nscales)
        if ckey not in self._compiled:
            from detectorch_tpu.eval import postprocess as pp

            tcfg = self.test_cfg.replace(nms_topk_prefilter=0)
            num_classes = self.cfg.num_classes

            def merge(scores_l, deltas_l, rois_l, valid_l, scales, oh, ow):
                preds = [
                    pp.decode_boxes(rois_l[i], deltas_l[i], scales[i], oh, ow, tcfg)
                    for i in range(nscales)
                ]
                sc = jnp.concatenate(
                    [s.astype(jnp.float32) for s in scores_l], axis=0
                )
                pred = jnp.concatenate(preds, axis=0)
                valid = jnp.concatenate(valid_l, axis=0)
                return pp.postprocess_decoded(sc, pred, valid, tcfg, num_classes)

            self._compiled[ckey] = jax.jit(merge)
        return self._compiled[ckey]

    def _mask_fn(self, key, exact: bool = False):
        """Jitted mask-only program (final boxes -> mask probs) for the
        multi-scale path; same device-preprocess wrapping and exact-gather
        fallback structure as the main program."""
        ckey = ("mask", exact, key)
        if ckey not in self._compiled:
            from detectorch_tpu.models.detector import make_mask_fn

            cfg = (
                self.cfg.replace(use_pallas_roi_align=False)
                if exact else self.cfg
            )
            mfn = make_mask_fn(cfg)
            if self.test_cfg.device_preprocess:
                mfn = self._wrap_raw(mfn, key)
            self._compiled[ckey] = jax.jit(mfn)
        return self._compiled[ckey]

    def _kp_fn(self, key, exact: bool = False):
        """Jitted keypoint-only program (final boxes -> decoded keypoints)
        for the multi-scale path; mirrors _mask_fn."""
        ckey = ("kp", exact, key)
        if ckey not in self._compiled:
            from detectorch_tpu.models.detector import make_keypoint_fn

            cfg = (
                self.cfg.replace(use_pallas_roi_align=False)
                if exact else self.cfg
            )
            kfn = make_keypoint_fn(cfg)
            if self.test_cfg.device_preprocess:
                kfn = self._wrap_raw(kfn, key)
            self._compiled[ckey] = jax.jit(kfn)
        return self._compiled[ckey]

    def run_image_multiscale(
        self,
        im_rgb: np.ndarray,
        target_sizes,
        proposals: Optional[np.ndarray] = None,
    ):
        """Multi-scale (test-time pyramid) inference — the wired version of
        what the reference only gestures at: its ``preprocess_sample``
        builds the pyramid blob (``lib/utils/preprocess_sample.py:28-32``,
        ``blob.py:57-87``) but then consumes only ``im_scales[0]``
        downstream (``preprocess_sample.py:33,37``), so no reference code
        path ever merges scales. The semantics implemented here are
        upstream Detectron's TEST.BBOX_AUG with the union score heuristic:

          * run the full per-scale program at each target size (shared
            max_size; each scale is its own compiled bucket program),
          * union all scales' pre-NMS candidates decoded to original-image
            coordinates,
          * run the reference threshold / per-class NMS / >=-threshold
            global cap once over the union (``_merge_fn``),
          * run the mask branch once on the merged boxes at
            ``target_sizes[0]`` (Detectron test-aug flow: im_detect_mask at
            TEST.SCALE on the final boxes).

        With target_sizes == [test_cfg.target_size] this reduces exactly to
        run_image (tested). Pallas-slab exactness reruns apply per scale
        (checked against the pure `roi_align_exact` flag — the box-branch
        features feed the merged scores); an NMS-prefilter overflow does
        NOT trigger a per-scale rerun, because the merge consumes only the
        pre-NMS candidates and always redoes NMS at full width."""
        assert len(target_sizes) >= 1
        per_scale = []
        oh = ow = None
        for ts in target_sizes:
            args, oh, ow = self.preprocess(im_rgb, proposals, target_size=ts)
            per_scale.append([self.submit(args), args])
        if self._needs_exact_check():
            for rec in per_scale:
                out, args = rec
                if not bool(np.asarray(out.roi_align_exact)):
                    rec[0] = self._exact_fn(self.sample_key(args))(*args)
        dets = self._merge_fn(len(per_scale))(
            [r[0].cls_scores for r in per_scale],
            [r[0].bbox_deltas for r in per_scale],
            [r[0].rois for r in per_scale],
            [r[0].roi_valid for r in per_scale],
            jnp.asarray([self._scale_of(r[1]) for r in per_scale], jnp.float32),
            jnp.float32(oh), jnp.float32(ow),
        )
        masks = None
        keypoints = None
        args0 = per_scale[0][1]
        base = args0[:4] if self.test_cfg.device_preprocess else args0[:5]
        key0 = self.sample_key(args0)
        if self.cfg.use_mask:
            masks, mask_exact = self._mask_fn(key0)(
                *base, dets.boxes, dets.classes
            )
            if self._needs_exact_check() and not bool(np.asarray(mask_exact)):
                masks, _ = self._mask_fn(key0, exact=True)(
                    *base, dets.boxes, dets.classes
                )
        if self.cfg.keypoint is not None:
            keypoints, kp_exact = self._kp_fn(key0)(*base, dets.boxes)
            if self._needs_exact_check() and not bool(np.asarray(kp_exact)):
                keypoints, _ = self._kp_fn(key0, exact=True)(
                    *base, dets.boxes
                )
        return self._collect_dets(dets, masks, oh, ow, keypoints=keypoints)

    def _collect(self, out, oh, ow):
        return self._collect_dets(out.detections, out.masks, oh, ow,
                                  keypoints=out.keypoints)

    def _collect_dets(self, dets, masks, oh, ow, keypoints=None):
        valid = np.asarray(dets.valid)
        result = {
            "boxes": np.asarray(dets.boxes)[valid],
            "scores": np.asarray(dets.scores)[valid],
            "classes": np.asarray(dets.classes)[valid],
        }
        if masks is not None:
            masks = np.asarray(masks)[valid]
            result["rles"] = mask_paste.segm_results(
                masks, result["boxes"], int(oh), int(ow),
                self.cfg.mask.resolution,
            )
        if keypoints is not None:
            result["keypoints"] = np.asarray(keypoints)[valid]
        return result


class BatchedInferenceEngine:
    """Bucket-grouped batched inference: one vmapped program per shape
    bucket, batch axis optionally sharded over a mesh 'data' axis.

    This is the throughput path (bench.py uses the same construction); the
    single-image InferenceEngine stays for latency/debug use.
    """

    def __init__(self, cfg: ModelConfig, test_cfg: TestConfig, params: Dict,
                 batch_size: int = 4, mesh=None):
        self.cfg = cfg
        self.test_cfg = test_cfg
        self.batch_size = batch_size
        self.mesh = mesh
        self._compiled = {}
        self._single = InferenceEngine(cfg, test_cfg, params)
        self.params = self._single.params  # device-pinned once (shared)
        # images re-run through the exact-gather program because their rois
        # overflowed the Pallas slab (diagnostic; rare with real weights)
        self.rerun_count = 0
        self._paste_pool = None

    def _fn(self, key, n_batched):
        if key not in self._compiled:
            single = self._single.build_single(key)
            axes = (None,) + (0,) * n_batched
            vf = jax.vmap(single, in_axes=axes)

            def packed(*args):
                # pack the per-detection fields AND the per-image exact
                # flag into ONE tensor: each device->host array fetch pays
                # a full RPC round trip on a tunneled backend, so 5 small
                # fetches per batch become 1 (+ the mask tensor)
                out = vf(*args)
                d = out.detections
                exact = (
                    out.all_exact
                    if self._single._needs_exact_check()
                    else jnp.ones(d.scores.shape[0], jnp.bool_)
                )
                k = d.scores.shape[1]
                pk = jnp.concatenate(
                    [
                        d.boxes,
                        d.scores[..., None],
                        d.classes.astype(jnp.float32)[..., None],
                        d.valid.astype(jnp.float32)[..., None],
                        jnp.broadcast_to(
                            exact.astype(jnp.float32)[:, None, None],
                            (exact.shape[0], k, 1),
                        ),
                    ],
                    axis=-1,
                )  # (B, K, 8)
                masks = out.masks
                if masks is not None and self.test_cfg.mask_fetch_dtype != "float32":
                    # sigmoid probabilities in [0,1]: fetching bf16 halves
                    # the dominant D2H payload (~12.5 MB fp32 per 16-image
                    # batch at 28x28 — the same order as the uint8 image
                    # upload); AP effect measured nil (PARITY.md)
                    masks = masks.astype(jnp.bfloat16)
                # keypoints stay fp32: (B, K, P, 4) is ~27 KB/image and the
                # x/y payload spans image coords, where bf16's 8-bit
                # mantissa would cost whole pixels
                return pk, masks, out.keypoints

            self._compiled[key] = jax.jit(packed)
        return self._compiled[key]

    def preprocess(self, im_rgb, proposals=None):
        return self._single.preprocess(im_rgb, proposals)

    def sample_key(self, args):
        return self._single.sample_key(args)

    def submit_batch(self, samples):
        """Asynchronously dispatch one padded batch. samples: list of
        (args, oh, ow) from preprocess(), all same shape bucket."""
        n = len(samples)
        b = self.batch_size
        # pad the tail batch by repeating the last sample
        padded = samples + [samples[-1]] * (b - n)
        key = self._single.sample_key(padded[0][0])
        arg_lists = list(zip(*[s[0][1:] for s in padded]))  # drop params
        batch = [np.stack([np.asarray(a) for a in arg]) for arg in arg_lists]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("data"))
            batch = [jax.device_put(a, sh) for a in batch]
        return self._fn(key, len(batch))(self.params, *batch)

    def finalize_batch(self, out, samples):
        """Bulk-fetch one batch's outputs (3 device->host transfers for the
        whole batch — NOT per-image or per-field slicing, which costs a
        tunnel round trip each), re-run any Pallas-slab-overflow images
        through the exact program, and collect host-side results (mask
        paste + RLE, parallelised across the batch)."""
        n = len(samples)
        pk, masks_dev, kps_dev = out
        pk = np.asarray(pk)
        masks = (
            np.asarray(masks_dev).astype(np.float32)
            if masks_dev is not None else None
        )
        kps = np.asarray(kps_dev) if kps_dev is not None else None
        boxes = pk[..., :4]
        scores = pk[..., 4]
        classes = pk[..., 5].astype(np.int64)
        valid = pk[..., 6] > 0.5
        exact = pk[:, 0, 7] > 0.5

        def rerun_exact(i):
            # rare: roi footprint overflowed the Pallas slab — re-run this
            # image straight through the exact-gather program (we already
            # know it is needed; going via the fast program would compile
            # and run a whole extra variant). Only ever called from the
            # main thread: _exact_fn mutates the compile cache and
            # rerun_count is a plain counter — neither is thread-safe.
            args, oh, ow = samples[i]
            self.rerun_count += 1
            single = self._single
            out = single._exact_fn(single.sample_key(args))(*args)
            return single._collect(out, oh, ow)

        def collect(i):
            args, oh, ow = samples[i]
            ok = valid[i]
            result = {
                "boxes": boxes[i][ok],
                "scores": scores[i][ok],
                "classes": classes[i][ok],
            }
            if masks is not None:
                result["rles"] = mask_paste.segm_results(
                    masks[i][ok], result["boxes"], int(oh), int(ow),
                    self.cfg.mask.resolution,
                )
            if kps is not None:
                result["keypoints"] = kps[i][ok]
            return result

        # exact reruns happen serially on the main thread (compile-cache /
        # counter mutation); the common no-overflow images go to the pool
        reruns = {i: rerun_exact(i) for i in range(n) if not bool(exact[i])}
        rest = [i for i in range(n) if i not in reruns]
        if masks is not None and len(rest) > 1:
            # the per-image paste+RLE is pure numpy/C — fan it out
            from concurrent.futures import ThreadPoolExecutor

            if self._paste_pool is None:
                self._paste_pool = ThreadPoolExecutor(max_workers=4)
            collected = dict(zip(rest, self._paste_pool.map(collect, rest)))
        else:
            collected = {i: collect(i) for i in rest}
        collected.update(reruns)
        return [collected[i] for i in range(n)]

    def close(self):
        """Shut down the host-side paste pool (idempotent)."""
        if self._paste_pool is not None:
            self._paste_pool.shutdown(wait=True)
            self._paste_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def run_batch(self, samples):
        """Synchronous submit+finalize (see submit_batch/finalize_batch)."""
        return self.finalize_batch(self.submit_batch(samples), samples)


def evaluate_dataset(
    cfg: ModelConfig,
    test_cfg: TestConfig,
    params: Dict,
    dataset: CocoDataset,
    roidb: Optional[List[RoidbEntry]] = None,
    limit: Optional[int] = None,
    verbose: bool = True,
    batch_size: int = 1,
    mesh=None,
    output_dir: Optional[str] = None,
    dataset_name: str = "dataset",
    per_class_ap: bool = False,
    engines: Optional[Dict] = None,
    target_sizes: Optional[List[int]] = None,
):
    """Full dataset loop -> (bbox stats, segm stats or None, results dict).

    `target_sizes`: more than one size switches to multi-scale (test-time
    pyramid) inference — per-image run_image_multiscale with the union
    merge (Detectron TEST.BBOX_AUG semantics; see that method). Single-
    image engine only (accuracy mode, not the throughput path).

    `engines`: optional dict reused across calls to keep compiled programs
    warm (pass the same dict to a small warmup call, then the real run —
    e.g. tools/bench_e2e.py separates compile time from steady throughput).

    With `output_dir` set, results are round-tripped through COCO-format
    json files and the evaluator pickles are saved, exactly like the
    reference's evaluate_boxes/evaluate_masks
    (json_dataset_evaluator.py:40-64,128-146); `per_class_ap` additionally
    prints the reference's per-category AP table (:205-235)."""
    if roidb is None:
        roidb = dataset.get_roidb(gt=False)
    if limit:
        roidb = roidb[:limit]

    # a single-element target_sizes list is single-scale eval at that size,
    # not the pyramid path: fold it into test_cfg BEFORE building engines so
    # the override actually reaches preprocess (a bare engine.preprocess call
    # would otherwise silently use the default target_size)
    if target_sizes is not None:
        target_sizes = list(target_sizes)
        if len(target_sizes) == 1:
            test_cfg = test_cfg.replace(target_size=target_sizes[0])
            target_sizes = None

    from detectorch_tpu.data.loader import PrefetchLoader

    if engines is None:
        engines = {}
    # key by target_size: a pre-warmed dict built at the default size must
    # not silently serve a single-element target_sizes override (the fold
    # above rewrites the LOCAL test_cfg only)
    skey = ("single", test_cfg.target_size)
    if skey not in engines:
        engines[skey] = InferenceEngine(cfg, test_cfg, params)
    engine = engines[skey]

    multiscale = target_sizes is not None and len(list(target_sizes)) > 1
    if multiscale and batch_size > 1:
        raise ValueError(
            "multi-scale eval runs the single-image engine (batch_size=1)"
        )

    if multiscale:
        def make_sample(entry):
            im = T.load_image_rgb(entry.file_path)
            proposals = entry.boxes if not cfg.use_rpn else None
            return entry, im, proposals
    else:
        def make_sample(entry):
            im = T.load_image_rgb(entry.file_path)
            proposals = entry.boxes if not cfg.use_rpn else None
            args, oh, ow = engine.preprocess(im, proposals)
            return entry, args, oh, ow

    loader = PrefetchLoader(roidb, make_sample, num_workers=4, prefetch=16)

    bbox_results, segm_results_all, kps_results = [], [], []
    t0 = time.time()
    results_iter = []
    if batch_size > 1:
        # key the cached engine by its call parameters: a reused dict from a
        # previous call with a different batch_size/mesh must not silently
        # serve that old configuration
        bkey = ("batched", batch_size, None if mesh is None else
                tuple(sorted(mesh.shape.items())))
        if bkey not in engines:
            engines[bkey] = BatchedInferenceEngine(
                cfg, test_cfg, params, batch_size, mesh
            )
        batched = engines[bkey]
        buckets: Dict[tuple, list] = {}
        # 2-deep batch pipeline: while batch i's results are fetched and
        # its masks pasted on the host, batch i+1 computes on the device
        # and batch i+2's upload streams in behind it
        from collections import deque

        pending = deque()  # of (group, device_out)
        phase_s = {"load": 0.0, "submit": 0.0, "finalize": 0.0}

        def _drain_one():
            group, out = pending.popleft()
            ts = time.time()
            res = batched.finalize_batch(out, [g[1] for g in group])
            phase_s["finalize"] += time.time() - ts
            results_iter.extend((g[0], r) for g, r in zip(group, res))
            if verbose and len(results_iter) % (batch_size * 8) < batch_size:
                rate = len(results_iter) / (time.time() - t0)
                ph = " ".join(f"{k}={v:.1f}s" for k, v in phase_s.items())
                print(
                    f"  {len(results_iter)}/{len(roidb)} ({rate:.2f} img/s, "
                    f"{batched.rerun_count} exact reruns; {ph})",
                    flush=True,
                )

        def _flush(group):
            ts = time.time()
            out = batched.submit_batch([g[1] for g in group])
            phase_s["submit"] += time.time() - ts
            pending.append((group, out))
            if len(pending) > 2:
                _drain_one()

        t_load = time.time()
        for entry, args, oh, ow in loader:
            phase_s["load"] += time.time() - t_load
            key = batched.sample_key(args)
            buckets.setdefault(key, []).append((entry, (args, oh, ow)))
            if len(buckets[key]) == batch_size:
                _flush(buckets.pop(key))
            t_load = time.time()
        for group in buckets.values():
            _flush(group)
        while pending:
            _drain_one()
    elif multiscale:
        sizes = [int(s) for s in target_sizes]
        for entry, im, proposals in loader:
            results_iter.append(
                (entry, engine.run_image_multiscale(im, sizes, proposals))
            )
    else:
        pending = None  # (entry, device_out, args, oh, ow) — 1-deep pipeline
        for i, (entry, args, oh, ow) in enumerate(loader):
            out = engine.submit(args)
            if pending is not None:
                results_iter.append(
                    (pending[0], engine.finalize(*pending[1:]))
                )
            pending = (entry, out, args, oh, ow)
        if pending is not None:
            results_iter.append((pending[0], engine.finalize(*pending[1:])))

    for i, (entry, res) in enumerate(results_iter):
        bbox_results.extend(
            detections_to_coco_bbox(
                res["boxes"], res["scores"], res["classes"],
                entry.image_id, dataset.contiguous_to_json,
            )
        )
        if "rles" in res:
            for rle, score, cls in zip(res["rles"], res["scores"], res["classes"]):
                segm_results_all.append(
                    {
                        "image_id": int(entry.image_id),
                        "category_id": int(dataset.contiguous_to_json[int(cls)]),
                        "segmentation": rle,
                        "score": float(score),
                    }
                )
        if "keypoints" in res:
            kps_results.extend(
                detections_to_coco_keypoints(
                    res["keypoints"], res["scores"], res["classes"],
                    entry.image_id, dataset.contiguous_to_json,
                    confidence=test_cfg.keypoint_confidence,
                )
            )
        if verbose and (i + 1) % 100 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"  {i+1}/{len(roidb)} ({rate:.2f} img/s)", flush=True)

    infer_seconds = time.time() - t0  # preprocess+device+paste+RLE+collect

    def _eval(results, iou_type):
        if not results:
            return None
        if output_dir is not None:
            from detectorch_tpu.eval import results_io

            ev = results_io.evaluate_from_results(
                dataset.coco, results, iou_type, output_dir,
                dataset_name=dataset_name, verbose=verbose,
            )
            return ev.stats
        coco_dt = dataset.coco.load_res(results)
        ev = COCOeval(dataset.coco, coco_dt, iou_type)
        ev.evaluate()
        ev.accumulate()
        if per_class_ap:
            from detectorch_tpu.eval import results_io

            results_io.log_per_class_ap(ev, verbose=verbose)
        return ev.summarize(verbose=verbose)

    bbox_stats = _eval(bbox_results, "bbox")
    segm_stats = _eval(segm_results_all, "segm") if cfg.use_mask else None
    kps_stats = (
        _eval(kps_results, "keypoints") if cfg.keypoint is not None else None
    )
    return bbox_stats, segm_stats, {
        "bbox": bbox_results, "segm": segm_results_all,
        "keypoints": kps_results, "keypoints_stats": kps_stats,
        "images_per_sec": len(roidb) / infer_seconds,
    }
