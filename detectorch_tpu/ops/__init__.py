from detectorch_tpu.ops import anchors, boxes, fpn_levels, nms, roi_align  # noqa: F401
