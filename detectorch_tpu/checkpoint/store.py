"""Native checkpoint save/restore for training state.

Reference saves ``torch.save({'iter','args','state_dict','optimizer'})``
every 20k iters (``train_fast.py:177-183``) but never implements resume
loading (the --resume flag is dead, SURVEY §5). Here: orbax-backed pytree
checkpoints with working save AND restore.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, step: int, state_tree: Dict[str, Any]):
    """Write a checkpoint for `step` under directory/ckpt-<step>."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"ckpt-{step}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_host(state_tree), force=True)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("ckpt-"):
            try:
                steps.append(int(name.split("-", 1)[1]))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(directory, f"ckpt-{max(steps)}")


def restore_checkpoint(path: str, target_tree: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target_tree is not None:
        return ckptr.restore(os.path.abspath(path), item=_to_host(target_tree))
    return ckptr.restore(os.path.abspath(path))
