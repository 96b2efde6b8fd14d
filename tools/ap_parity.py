#!/usr/bin/env python
"""Run the full-pipeline AP-parity matrix (all 7 presets) and record results.

For each preset this runs our `evaluate_dataset` and the complete torch+numpy
reference mirror (tests/ap_harness.py) on the deterministic synthetic COCO
set, and records both AP vectors and their max absolute delta into
AP_PARITY.json plus a markdown table on stdout.

This is the closest obtainable proxy to the reference's README gate
(README.md:24-32, "AP within 0.2") given that no real Detectron weights or
COCO images exist in this environment.

Usage:  python tools/ap_parity.py [--out AP_PARITY.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="AP_PARITY.json")
    p.add_argument("--shapes", choices=["harness", "production"],
                   default="harness",
                   help="production = 800/1333 resize, full RPN counts "
                        "(C4 6000->1000, FPN 1000/level), 1000 rois, "
                        "100-det cap — the regime where top-k/tie "
                        "behaviour actually bites. CPU-expensive.")
    p.add_argument("--presets", default=None,
                   help="comma-separated subset (default: all 7)")
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N images")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tests.ap_harness import prepare_dataset, prepare_keypoint_dataset
    from tests.test_ap_parity import ALL_PRESETS, run_preset_parity

    dataset, proposals_file = prepare_dataset()
    presets = args.presets.split(",") if args.presets else (
        ALL_PRESETS + ["e2e_keypoint_rcnn_R-50-FPN_1x"]
    )
    # postprocess-variant rows: the reference's TEST.SOFT_NMS / TEST.BBOX_VOTE
    # options (result_utils.py:134-152) driven through BOTH full pipelines
    variants = {"": None,
                "+soft_nms": {"soft_nms": True},
                "+bbox_vote": {"do_bbox_vote": True}}
    if not args.presets:
        presets = presets + ["e2e_faster_rcnn_R-50-FPN_2x+soft_nms",
                             "e2e_faster_rcnn_R-50-FPN_2x+bbox_vote"]
    rows = []
    for preset in presets:
        t0 = time.time()
        base, _, var = preset.partition("+")
        overrides = variants["+" + var] if var else None
        if "keypoint" in base:
            # the keypoint row runs on the person-keypoints synthetic set
            r = run_preset_parity(base, prepare_keypoint_dataset(), None,
                                  shapes=args.shapes, limit=args.limit,
                                  tcfg_overrides=overrides)
        else:
            r = run_preset_parity(base, dataset, proposals_file,
                                  shapes=args.shapes, limit=args.limit,
                                  tcfg_overrides=overrides)
        row = {
            "preset": preset,
            "shapes": args.shapes,
            "bbox_ap_ours": float(r["ours_bbox"][0]),
            "bbox_ap_mirror": float(r["mirror_bbox"][0]),
            "bbox_max_delta": float(np.max(np.abs(r["ours_bbox"] - r["mirror_bbox"]))),
            "seconds": round(time.time() - t0, 1),
        }
        if r["ours_segm"] is not None:
            row["segm_ap_ours"] = float(r["ours_segm"][0])
            row["segm_ap_mirror"] = float(r["mirror_segm"][0])
            row["segm_max_delta"] = float(
                np.max(np.abs(r["ours_segm"] - r["mirror_segm"]))
            )
        if r.get("ours_kps") is not None:
            ok = np.asarray(r["ours_kps"], np.float64)
            mk = np.asarray(r["mirror_kps"], np.float64)
            row["kps_ap_ours"] = float(ok[0])
            row["kps_ap_mirror"] = float(mk[0])
            row["kps_max_delta"] = float(np.max(np.abs(ok - mk)))
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"rows": rows,
           "stats_compared": {"bbox": 12, "segm": 12, "keypoints": 10},
           "tolerance_gate": 2e-4}
    if os.path.exists(args.out):
        # merge into the existing record, replacing rows for the same
        # (preset, shapes) pair — rows from OTHER shapes (e.g. the
        # CPU-expensive production runs) are always preserved
        with open(args.out) as f:
            old = json.load(f)
        keep = [r for r in old.get("rows", [])
                if (r["preset"], r.get("shapes", "harness")) not in
                   {(r2["preset"], r2["shapes"]) for r2 in rows}]
        out["rows"] = keep + rows
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    print("\n| preset | box AP (ours/mirror) | segm AP | kps AP | max |Δ| |")
    print("|---|---|---|---|---|")
    for r in rows:
        segm = (
            f"{r['segm_ap_ours']:.4f} / {r['segm_ap_mirror']:.4f}"
            if "segm_ap_ours" in r else "—"
        )
        kps = (
            f"{r['kps_ap_ours']:.4f} / {r['kps_ap_mirror']:.4f}"
            if "kps_ap_ours" in r else "—"
        )
        d = max(r["bbox_max_delta"], r.get("segm_max_delta", 0.0),
                r.get("kps_max_delta", 0.0))
        print(f"| {r['preset']} | {r['bbox_ap_ours']:.4f} / "
              f"{r['bbox_ap_mirror']:.4f} | {segm} | {kps} | {d:.1e} |")


if __name__ == "__main__":
    main()
