"""Measure the AP effect of RoIAlign matmul precision on the C4 presets,
on the real TPU (CPU ignores jax matmul precision, so only a device run
answers this).

For each C4 preset, runs the full `evaluate_dataset` on the AP-parity
synthetic set + probe weights at roi_align_precision in {highest, high,
bf16} (and the production bfloat16 compute_dtype for the fastest variant)
and reports every config's 12-stat COCO AP vector and its max delta vs the
fp32-highest baseline — which PARITY.md shows is exactly equal to the
reference mirror.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/c4_precision_ap.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tests.ap_harness import family_of, harness_cfg, make_probe_weights, prepare_dataset
from detectorch_tpu.eval.engine import evaluate_dataset

PRESETS_TO_CHECK = ["e2e_faster_rcnn_R-50-C4_2x", "e2e_mask_rcnn_R-50-C4_2x"]


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    dataset, _ = prepare_dataset()
    roidb = dataset.get_roidb(gt=False)

    for preset in PRESETS_TO_CHECK:
        cfg0, tcfg = harness_cfg(preset)
        params = make_probe_weights(family_of(preset), dataset)
        base = None
        for label, cfg in [
            ("highest/fp32", cfg0),
            ("high/fp32", cfg0.replace(roi_align_precision="high")),
            ("bf16/fp32", cfg0.replace(roi_align_precision="bf16")),
            ("high/bf16-compute", cfg0.replace(
                roi_align_precision="high", compute_dtype="bfloat16")),
        ]:
            bbox, segm, _ = evaluate_dataset(
                cfg, tcfg, params, dataset, roidb=roidb, verbose=False,
            )
            stats = np.concatenate([bbox, segm]) if segm is not None else bbox
            if base is None:
                base = stats
            delta = float(np.max(np.abs(stats - base)))
            print(json.dumps({
                "preset": preset, "variant": label,
                "bbox_ap": round(float(bbox[0]), 5),
                "segm_ap": round(float(segm[0]), 5) if segm is not None else None,
                "max_delta_vs_highest": round(delta, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
