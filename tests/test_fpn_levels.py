import numpy as np

from detectorch_tpu.ops.fpn_levels import map_rois_to_fpn_levels
from tests.oracles import np_map_rois_to_fpn_levels
from tests.test_boxes import random_boxes


def test_level_mapping_matches_reference(rng):
    rois = random_boxes(rng, 256, size=1000.0)
    expected = np_map_rois_to_fpn_levels(rois, 2, 5)
    got = np.asarray(map_rois_to_fpn_levels(rois, 2, 5))
    np.testing.assert_array_equal(got, expected)


def test_level_mapping_canonical_boundaries():
    # a 224x224 box (canonical scale) maps to level 4
    rois = np.array(
        [
            [0, 0, 223, 223],     # ~224 -> level 4
            [0, 0, 2239, 2239],   # huge -> clipped to 5
            [0, 0, 10, 10],       # tiny -> clipped to 2
            [0, 0, 111, 111],     # 112 -> level 3
        ],
        np.float32,
    )
    got = np.asarray(map_rois_to_fpn_levels(rois, 2, 5))
    np.testing.assert_array_equal(got, [4, 5, 2, 3])
