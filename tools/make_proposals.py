#!/usr/bin/env python
"""Generate a precomputed-proposals .pkl with OUR RPN (Detectron
``tools/rpn_generate.py`` workflow; the reference repo only CONSUMES such
files — its Fast R-CNN notebooks point at Detectron-zoo proposal pkls,
``README.md:26-27`` — and ships no way to produce one).

Runs an RPN-carrying preset over a COCO dataset and writes
``{"boxes": [per-image (N,4) xyxy float32, original coords, score order],
"ids": [image ids]}`` — exactly the schema ``data/coco.get_roidb
(proposal_file=...)`` (and the reference's json_dataset.py:237-266)
consumes. Close the loop with::

  python tools/make_proposals.py --preset e2e_faster_rcnn_R-50-FPN_2x \
      --weights model.pkl --ann instances_train2014.json --imdir train2014 \
      --out proposals.pkl
  python tools/train_fast.py --proposals proposals.pkl ...
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if os.environ.get("DETECTORCH_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="e2e_faster_rcnn_R-50-FPN_2x")
    p.add_argument("--weights", required=True,
                   help="Detectron .pkl, or (with --orbax) a train run dir")
    p.add_argument("--orbax", action="store_true")
    p.add_argument("--ann", required=True)
    p.add_argument("--imdir", required=True)
    p.add_argument("--out", required=True, help="output proposals .pkl")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()

    import numpy as np

    from detectorch_tpu.config import PRESETS, TestConfig
    from detectorch_tpu.checkpoint import caffe2_import as c2
    from detectorch_tpu.data import transforms as T
    from detectorch_tpu.data.coco import CocoDataset
    from detectorch_tpu.data.loader import PrefetchLoader
    from detectorch_tpu.eval.engine import InferenceEngine

    cfg = PRESETS[args.preset]
    assert cfg.use_rpn, "proposal generation needs an RPN preset"
    if args.fp32:
        cfg = cfg.replace(compute_dtype="float32")

    if args.orbax:
        from detectorch_tpu.checkpoint import store

        path = store.latest_checkpoint(args.weights) or args.weights
        print(f"loading orbax checkpoint {path}", flush=True)
        tree = store.restore_checkpoint(path)
        params = {k: np.asarray(v) for k, v in tree["params"].items()}
        params = c2.fold_bn(params)
    else:
        print(f"loading weights {args.weights}", flush=True)
        blobs = c2.load_caffe2_pkl(args.weights)
        params = c2.import_params(blobs, cfg)
        params = c2.fold_bn(params)

    engine = InferenceEngine(cfg, TestConfig(), params)
    ds = CocoDataset(args.ann, args.imdir)
    roidb = ds.get_roidb(gt=False)
    if args.limit:
        roidb = roidb[: args.limit]

    def make_sample(entry):
        im = T.load_image_rgb(entry.file_path)
        args_, oh, ow = engine.preprocess(im)
        return entry, args_, oh, ow

    loader = PrefetchLoader(roidb, make_sample, num_workers=4, prefetch=8)
    boxes_list, ids = [], []
    for i, (entry, eargs, oh, ow) in enumerate(loader):
        out = engine.submit(eargs)  # raw ModelOutputs: rois ARE the RPN
        scale = engine._scale_of(eargs)  # proposals, score-collect order
        rois = np.asarray(out.rois, np.float32) / scale
        valid = np.asarray(out.roi_valid)
        rois = rois[valid]
        rois[:, [0, 2]] = np.clip(rois[:, [0, 2]], 0, entry.width - 1)
        rois[:, [1, 3]] = np.clip(rois[:, [1, 3]], 0, entry.height - 1)
        boxes_list.append(rois)
        ids.append(int(entry.image_id))
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(roidb)}", flush=True)

    with open(args.out, "wb") as f:
        pickle.dump({"boxes": boxes_list, "ids": ids}, f)
    n = [len(b) for b in boxes_list]
    print(f"wrote {args.out}: {len(ids)} images, "
          f"{min(n)}-{max(n)} proposals/image", flush=True)


if __name__ == "__main__":
    main()
