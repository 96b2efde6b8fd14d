import numpy as np
import jax.numpy as jnp

from detectorch_tpu.models import rpn as RPN
from detectorch_tpu.ops.anchors import shifted_anchors
from tests.oracles import np_bbox_transform, np_nms


def np_generate_proposals(cls_prob, bbox_pred, anchors, im_h, im_w, scale,
                          pre_nms, post_nms, nms_thresh, min_size):
    """Oracle: reference lib/model/generate_proposals.py:31-122."""
    scores = cls_prob.reshape(-1).astype(np.float32)
    deltas = bbox_pred.reshape(-1, 4).astype(np.float32)
    if pre_nms <= 0 or pre_nms >= len(scores):
        order = np.argsort(-scores)
    else:
        inds = np.argpartition(-scores, pre_nms)[:pre_nms]
        order = inds[np.argsort(-scores[inds])]
    deltas = deltas[order]
    scores = scores[order]
    anch = anchors[order]
    proposals = np_bbox_transform(anch.astype(np.float32), deltas)
    proposals[:, 0::4] = np.clip(proposals[:, 0::4], 0, im_w - 1)
    proposals[:, 1::4] = np.clip(proposals[:, 1::4], 0, im_h - 1)
    proposals[:, 2::4] = np.clip(proposals[:, 2::4], 0, im_w - 1)
    proposals[:, 3::4] = np.clip(proposals[:, 3::4], 0, im_h - 1)
    ws = proposals[:, 2] - proposals[:, 0] + 1
    hs = proposals[:, 3] - proposals[:, 1] + 1
    xc = proposals[:, 0] + ws / 2.0
    yc = proposals[:, 1] + hs / 2.0
    ms = min_size * scale
    keep = np.where((ws >= ms) & (hs >= ms) & (xc < im_w) & (yc < im_h))[0]
    proposals, scores = proposals[keep], scores[keep]
    keep = np_nms(np.hstack([proposals, scores[:, None]]), nms_thresh)[:post_nms]
    return proposals[keep], scores[keep]


def test_generate_proposals_matches_oracle(rng):
    fh, fw, a = 12, 16, 15
    stride = 16.0
    sizes = (32, 64, 128, 256, 512)
    cls_prob = rng.uniform(size=(fh, fw, a)).astype(np.float32)
    bbox_pred = (rng.randn(fh, fw, 4 * a) * 0.4).astype(np.float32)
    im_h, im_w = fh * stride, fw * stride

    props = RPN.generate_proposals(
        jnp.asarray(cls_prob), jnp.asarray(bbox_pred), im_h, im_w, 1.0,
        feat_stride=stride, anchor_sizes=sizes,
        pre_nms_top_n=600, post_nms_top_n=100, nms_thresh=0.7, min_size=0.0,
    )
    anchors = shifted_anchors(fh, fw, stride, sizes, (0.5, 1.0, 2.0))
    exp_boxes, exp_scores = np_generate_proposals(
        cls_prob, bbox_pred, anchors, im_h, im_w, 1.0, 600, 100, 0.7, 0.0
    )
    ok = np.asarray(props.valid)
    got_boxes = np.asarray(props.boxes)[ok]
    got_scores = np.asarray(props.scores)[ok]
    assert len(got_boxes) == len(exp_boxes)
    np.testing.assert_allclose(got_boxes, exp_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(got_scores, exp_scores, rtol=1e-5, atol=1e-6)


def test_generate_proposals_min_size_filter(rng):
    fh, fw, a = 6, 6, 15
    cls_prob = rng.uniform(size=(fh, fw, a)).astype(np.float32)
    # huge negative dw/dh -> tiny boxes, all filtered at min_size=10
    bbox_pred = np.full((fh, fw, 4 * a), -5.0, np.float32)
    props = RPN.generate_proposals(
        jnp.asarray(cls_prob), jnp.asarray(bbox_pred), 96.0, 96.0, 1.0,
        feat_stride=16.0, anchor_sizes=(32, 64, 128, 256, 512),
        pre_nms_top_n=100, post_nms_top_n=10, nms_thresh=0.7, min_size=10.0,
    )
    assert int(np.asarray(props.valid).sum()) == 0


def test_collect_proposals_global_topk(rng):
    levels = []
    for lvl in range(4):
        n = 20
        boxes = rng.uniform(0, 100, (n, 4)).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32) + lvl  # level 3 highest
        valid = np.ones(n, bool)
        valid[15:] = False
        levels.append(RPN.Proposals(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)))
    out = RPN.collect_proposals(levels, post_nms_top_n=30)
    assert out.boxes.shape == (30, 4)
    got_scores = np.asarray(out.scores)
    assert np.asarray(out.valid).all()
    # all 15 valid from level 3 (scores 3.x) must lead
    assert (got_scores[:15] >= 3.0).all()
    # descending
    assert (np.diff(got_scores) <= 1e-6).all()
