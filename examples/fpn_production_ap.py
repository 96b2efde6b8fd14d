"""Measure the AP effect of the FPN PRODUCTION tier on the real TPU
(VERDICT r2 item 2): the configuration bench.py actually sells — Pallas
RoIAlign + bf16 compute + shape buckets + device_preprocess — versus the
proven-exact fp32 baseline.

Chain of evidence: AP_PARITY.json proves CPU-ours(fp32, highest, gather)
== torch+numpy mirror exactly (12 stats); this script re-runs the same
evaluation on the TPU at each production ingredient and reports every
variant's AP delta against (a) the TPU fp32-gather baseline and (b) the
recorded mirror AP from AP_PARITY.json.

Variants, cumulative toward production:
  1. fp32 / highest / exact gather (baseline — the AP-parity config)
  2. fp32 / Pallas RoIAlign kernel (flagship default kernel)
  3. bf16 compute + Pallas           (production compute dtype)
  4. + shape buckets                 (832x1344 padding instead of exact dims)
  5. + device_preprocess             (uint8 upload, fused on-device resize)
  6. + bf16 mask fetch via the batched engine (the full production path)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/fpn_production_ap.py
FPN_AP_PRESETS / FPN_AP_VARIANTS (comma-separated substrings) subset the
matrix; the fp32-gather baseline row always runs first (deltas need it).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tests.ap_harness import family_of, harness_cfg, make_probe_weights, prepare_dataset
from detectorch_tpu.eval.engine import evaluate_dataset

PRESETS_TO_CHECK = ["e2e_mask_rcnn_R-50-FPN_2x", "e2e_faster_rcnn_R-50-FPN_2x"]


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    dataset, _ = prepare_dataset()
    roidb = dataset.get_roidb(gt=False)
    with open("/root/repo/AP_PARITY.json") as f:
        mirror = {r["preset"]: r for r in json.load(f)["rows"]
                  if r.get("shapes", "harness") == "harness"}

    preset_filter = [s for s in os.environ.get("FPN_AP_PRESETS", "").split(",") if s]
    variant_filter = [s for s in os.environ.get("FPN_AP_VARIANTS", "").split(",") if s]
    for preset in PRESETS_TO_CHECK:
        if preset_filter and not any(s in preset for s in preset_filter):
            continue
        cfg0, tcfg0 = harness_cfg(preset)
        # the AP-parity baseline kernel is the exact gather form
        cfg_base = cfg0.replace(use_pallas_roi_align=False)
        params = make_probe_weights(family_of(preset), dataset)
        prod = cfg0.replace(compute_dtype="bfloat16")  # Pallas is default
        variants = [
            ("fp32/gather (parity baseline)", cfg_base, tcfg0, 1),
            ("fp32/pallas", cfg0, tcfg0, 1),
            ("bf16/pallas", prod, tcfg0, 1),
            ("bf16/pallas/buckets", prod, tcfg0.replace(exact_blob_dims=False), 1),
            ("bf16/pallas/buckets/devpre", prod,
             tcfg0.replace(exact_blob_dims=False, device_preprocess=True), 1),
            ("production batched (bf16 masks)", prod,
             tcfg0.replace(exact_blob_dims=False, device_preprocess=True), 4),
            # round-5 kernel fwd tiers on top of the full production path:
            # 'bf16x3' (exact products, fp32 accumulation — expected ~0 AP
            # delta) and 'bf16' (single-pass fast bound)
            ("production + fwd=bf16x3",
             prod.replace(roi_align_fwd_precision="bf16x3"),
             tcfg0.replace(exact_blob_dims=False, device_preprocess=True), 4),
            ("production + fwd=bf16",
             prod.replace(roi_align_fwd_precision="bf16"),
             tcfg0.replace(exact_blob_dims=False, device_preprocess=True), 4),
        ]
        if variant_filter:
            variants = [variants[0]] + [
                v for v in variants[1:]
                if any(s in v[0] for s in variant_filter)]
        base = None
        for label, cfg, tcfg, batch in variants:
            bbox, segm, _ = evaluate_dataset(
                cfg, tcfg, params, dataset, roidb=roidb, verbose=False,
                batch_size=batch,
            )
            stats = np.concatenate([bbox, segm]) if segm is not None else bbox
            if base is None:
                base = stats
            row = {
                "preset": preset, "variant": label,
                "bbox_ap": round(float(bbox[0]), 5),
                "max_delta_vs_fp32": round(float(np.max(np.abs(stats - base))), 6),
                "bbox_delta_vs_mirror": round(
                    float(bbox[0] - mirror[preset]["bbox_ap_mirror"]), 6),
            }
            if segm is not None:
                row["segm_ap"] = round(float(segm[0]), 5)
                row["segm_delta_vs_mirror"] = round(
                    float(segm[0] - mirror[preset]["segm_ap_mirror"]), 6)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
