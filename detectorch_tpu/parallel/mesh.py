"""Device mesh + sharded program builders.

The reference's only parallelism is single-process multi-GPU DataParallel
(replicate/scatter/gather, ``lib/utils/data_parallel.py:9-68``) used with
batch_size == #GPUs. The TPU-native equivalent (SURVEY §2.3): a
``jax.sharding.Mesh`` with a ``data`` axis for batch sharding and a ``model``
axis available for sharding the wide FC layers, with XLA emitting the
collectives over ICI — no hand-written communication.

Inference: the single-image program vmaps over a batch axis and the batch
shards across ``data``. Training: gradients are averaged by XLA-inserted
all-reduce when the loss mean spans the sharded batch axis.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed_from_env() -> bool:
    """Multi-host (DCN) hook: initialise the jax distributed runtime from
    the standard env vars, then build meshes over ``jax.devices()`` (which
    becomes the GLOBAL device list) exactly as single-host code does.

    The reference has no multi-node support at all (its DataParallel is
    single-process, ``lib/utils/data_parallel.py:1-7``); SURVEY §2.3 maps
    DCN to ``jax.distributed.initialize`` "if multi-host ever needed". This
    helper is that hook: it reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID (the names jax.distributed.initialize itself consults,
    plus cluster auto-detection for TPU pods where no env is needed) and
    no-ops cleanly when none are set in a single-process run.

    Returns True if the distributed runtime was (or already is) initialised,
    False for the single-process no-op. Untestable beyond the no-op in this
    container (one host); on a real multi-host slice call this once at
    program start, before any other jax use.
    """
    import jax.distributed as jdist

    if jdist.is_initialized():
        return True
    import os

    if not (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")):
        return False  # single-process: nothing to join
    jdist.initialize()  # addresses/ids resolved from env / cluster detection
    return True


def make_mesh(
    devices=None, data_parallel: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """Mesh over the available devices: ('data', 'model')."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (data_parallel, model_parallel, n)
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def param_sharding(params: Dict, mesh: Mesh, shard_fc: bool = True):
    """NamedSharding tree for the params: replicated, except the big box-head
    FC layers which shard their output dim over 'model' when the axis is >1.

    fc6 is (1024, 12544) ≈ 12.8M params — the only tensor-parallel-worthy
    weight at this model scale (SURVEY §2.3: TP 'optional mesh axis').
    """
    model_axis = mesh.shape["model"]
    shardings = {}
    for name, v in params.items():
        spec = P()
        if (
            shard_fc
            and model_axis > 1
            and name in ("fc6_w", "fc7_w")
            and v.shape[0] % model_axis == 0
        ):
            spec = P("model", None)
        elif shard_fc and model_axis > 1 and name in ("fc6_b", "fc7_b") and v.shape[0] % model_axis == 0:
            spec = P("model")
        shardings[name] = NamedSharding(mesh, spec)
    return shardings


def shard_params(params: Dict, mesh: Mesh, shard_fc: bool = True):
    sh = param_sharding(params, mesh, shard_fc)
    return {k: jax.device_put(jnp.asarray(v), sh[k]) for k, v in params.items()}


def make_batched_inference_fn(cfg, test_cfg, mesh: Mesh):
    """Batch-vmapped, data-sharded inference program.

    Returns fn(params, images (B,H,W,3), im_scales (B,), orig_h (B,),
    orig_w (B,) [, proposals (B,P,4), valid (B,P)]) with B sharded over the
    mesh 'data' axis.
    """
    from detectorch_tpu.models.detector import make_inference_fn

    single = make_inference_fn(cfg, test_cfg)
    if cfg.use_rpn:
        batched = jax.vmap(single, in_axes=(None, 0, 0, 0, 0))
    else:
        batched = jax.vmap(single, in_axes=(None, 0, 0, 0, 0, 0, 0))

    data_spec = NamedSharding(mesh, P("data"))

    def fn(params, *batch_args):
        args = [jax.lax.with_sharding_constraint(a, data_spec) for a in batch_args]
        return batched(params, *args)

    return jax.jit(fn)


def shard_batch(mesh: Mesh, *arrays):
    """Place host batch arrays with their leading axis sharded over 'data'."""
    spec = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, spec) for a in arrays)
