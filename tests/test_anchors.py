import numpy as np

from detectorch_tpu.ops import anchors as A
from tests.oracles import MATLAB_ANCHORS


def test_anchor_table_matches_matlab():
    # stride 16, sizes 128/256/512 (scales 8,16,32) reproduces the classic
    # 9-anchor matlab table (reference generate_anchors.py:26-51) shifted by
    # -1: Detectron's base anchor is 0-indexed ([1,1,16,16]-1, reference
    # generate_anchors.py:72) while the matlab table is 1-indexed.
    got = A.generate_anchors(16.0, (128, 256, 512), (0.5, 1.0, 2.0))
    np.testing.assert_array_equal(got, (MATLAB_ANCHORS - 1.0).astype(np.float32))


def test_detectron_c4_anchors_shape_and_center():
    got = A.generate_anchors(16.0, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    assert got.shape == (15, 4)
    # all anchors centered on the stride/2 - 0.5 point (7.5 for stride 16)
    cx = (got[:, 0] + got[:, 2]) / 2
    cy = (got[:, 1] + got[:, 3]) / 2
    np.testing.assert_allclose(cx, 7.5, atol=0.5)
    np.testing.assert_allclose(cy, 7.5, atol=0.5)


def test_fpn_level_anchor_sizes():
    assert A.fpn_anchor_sizes(2) == (32.0,)
    assert A.fpn_anchor_sizes(6) == (512.0,)


def test_shifted_anchors_ordering():
    # (H, W, A) slowest-to-fastest ordering must match an NHWC flatten.
    sh = A.shifted_anchors(2, 3, 16.0, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    assert sh.shape == (2 * 3 * 15, 4)
    base = A.generate_anchors(16.0, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    # first A rows are the cell anchors at (0,0)
    np.testing.assert_array_equal(sh[:15], base)
    # row at (h=1, w=2) anchor a: index (1*3+2)*15 + a, shifted by (32, 16)
    np.testing.assert_allclose(
        sh[(1 * 3 + 2) * 15 + 4], base[4] + np.array([32, 16, 32, 16]), rtol=1e-6
    )
