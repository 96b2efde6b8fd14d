"""FPN RoI-to-level assignment (FPN paper Eqn. 1).

Reference: ``lib/utils/multilevel_rois.py:41-53``. Instead of splitting rois
into per-level host lists with restore indices
(``collect_and_distribute_fpn_rpn_proposals.py:108-129``), we return a per-roi
integer level that feeds straight into the multi-level RoIAlign atlas gather —
no data movement, no reordering.
"""

from __future__ import annotations

import jax.numpy as jnp

from detectorch_tpu.ops.boxes import boxes_area


def map_rois_to_fpn_levels(
    rois,
    k_min: int = 2,
    k_max: int = 5,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
):
    """Target FPN level per roi, clipped to [k_min, k_max]. Returns int32 (...,).

    lvl = floor(lvl0 + log2(sqrt(area)/s0 + 1e-6))   (reference :52)
    """
    s = jnp.sqrt(boxes_area(rois))
    target = jnp.floor(
        canonical_level + jnp.log2(s / canonical_scale + 1e-6)
    )
    return jnp.clip(target, k_min, k_max).astype(jnp.int32)
