#!/usr/bin/env python
"""Single-image demo (rebuild of reference demo.ipynb / demo_FPN.ipynb).

Runs a model preset on an image and writes a visualisation.

Usage:
  python tools/demo.py --image demo.jpg --preset e2e_mask_rcnn_R-50-FPN_2x \
      [--weights model_final.pkl] --out out.jpg

Without --weights, random parameters are used (pipeline smoke only).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--preset", default="e2e_mask_rcnn_R-50-FPN_2x")
    p.add_argument("--weights", default=None)
    p.add_argument("--out", default="demo_out.jpg")
    p.add_argument("--thresh", type=float, default=0.7)
    p.add_argument("--backend", choices=["cv2", "matplotlib"], default="cv2",
                   help="matplotlib renders polygonised masks and supports "
                        "pdf output like the reference's vis_one_image")
    args = p.parse_args()

    from detectorch_tpu.config import PRESETS, TestConfig
    from detectorch_tpu.checkpoint import caffe2_import as c2
    from detectorch_tpu.data.transforms import load_image_rgb
    from detectorch_tpu.eval.engine import InferenceEngine
    from detectorch_tpu.models.detector import init_params
    from detectorch_tpu.utils.vis import vis_one_image

    cfg = PRESETS[args.preset]
    if not cfg.use_rpn:
        raise SystemExit("demo requires an RPN preset (no proposal file input)")
    if args.weights:
        params = c2.fold_bn(c2.import_params(c2.load_caffe2_pkl(args.weights), cfg))
    else:
        print("WARNING: random weights (smoke mode)", flush=True)
        params = init_params(cfg, seed=0)

    engine = InferenceEngine(cfg, TestConfig(), params)
    im = load_image_rgb(args.image)
    print("running inference...", flush=True)
    res = engine.run_image(im)
    n = (res["scores"] >= args.thresh).sum()
    print(f"{len(res['scores'])} detections ({n} above {args.thresh})", flush=True)
    if args.backend == "matplotlib":
        from detectorch_tpu.utils.vis import vis_one_image_matplotlib

        stem, ext = os.path.splitext(args.out)
        saved = vis_one_image_matplotlib(
            im, res["boxes"], res["scores"], res["classes"],
            res.get("rles"), res.get("keypoints"), thresh=args.thresh,
            output_dir=os.path.dirname(args.out) or ".",
            im_name=os.path.basename(stem), ext=(ext.lstrip(".") or "pdf"),
        )
        print(f"wrote {saved}")
    else:
        vis_one_image(
            im, res["boxes"], res["scores"], res["classes"],
            res.get("rles"), res.get("keypoints"),
            thresh=args.thresh, output_path=args.out,
        )
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
