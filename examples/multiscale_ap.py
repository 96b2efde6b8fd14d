"""Multi-scale inference AP measurement on the synthetic probe harness.

Runs `evaluate_dataset` single-scale vs multi-scale (run_image_multiscale
union merge, Detectron TEST.BBOX_AUG semantics) on the flagship preset with
the harness probe weights and reports the 12-stat COCO AP vectors for each.

Caveat stated up front: the probe predictors are linear probes trained at
the single harness scale (256), so this measures that the multi-scale path
is *wired and well-behaved* (finite AP in the same range, more candidate
recall at AP-small), not the +0.5-1.0 box AP multi-scale testing gives real
Detectron weights — that needs real weights and COCO, which this container
does not have.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u examples/multiscale_ap.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from detectorch_tpu.eval.engine import evaluate_dataset
from tests.ap_harness import (
    family_of,
    harness_cfg,
    make_probe_weights,
    prepare_dataset,
)

PRESET = "e2e_mask_rcnn_R-50-FPN_2x"


def main():
    dataset, _ = prepare_dataset()
    cfg, tcfg = harness_cfg(PRESET)
    params = make_probe_weights(family_of(PRESET), dataset)
    roidb = dataset.get_roidb(gt=False)

    rows = []
    for sizes in ([256], [192, 256], [192, 256, 320]):
        kw = {}
        if len(sizes) > 1:
            kw["target_sizes"] = sizes
        bbox, segm, info = evaluate_dataset(
            cfg, tcfg, params, dataset, roidb=roidb, verbose=False, **kw
        )
        rows.append({
            "target_sizes": sizes,
            "bbox_ap": [round(float(v), 4) for v in bbox],
            "segm_ap": [round(float(v), 4) for v in segm] if segm is not None else None,
            "n_dets": len(info["bbox"]),
        })
        print(json.dumps(rows[-1]), flush=True)

    base = np.asarray(rows[0]["bbox_ap"])
    for r in rows[1:]:
        d = np.asarray(r["bbox_ap"]) - base
        print(f"delta vs single-scale {r['target_sizes']}: "
              f"AP {d[0]:+.4f} AP50 {d[1]:+.4f} APs {d[3]:+.4f} "
              f"APm {d[4]:+.4f} APl {d[5]:+.4f}", flush=True)


if __name__ == "__main__":
    main()
