"""LR schedule (reference ``lib/utils/solver.py:1-44``): step decay with
linear warmup, plus the optax optimizer assembly used by the train step
(SGD + momentum + weight decay + global-norm grad clip 35,
reference ``train_fast.py:96-103,157-166``)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import optax

from detectorch_tpu.config import SolverConfig


def get_lr_at_iter(it, cfg: SolverConfig = SolverConfig()):
    """Pure-jnp transcription of reference solver.py:16-44 (jit/trace safe)."""
    it = jnp.asarray(it, jnp.float32)
    steps = jnp.asarray(list(cfg.steps) + [cfg.max_iter], jnp.float32)
    ind = jnp.sum(it >= steps) - 1
    lr = cfg.base_lr * cfg.gamma ** ind.astype(jnp.float32)
    alpha = it / cfg.warmup_iters
    warm = cfg.warmup_factor * (1.0 - alpha) + alpha
    return jnp.where(it < cfg.warmup_iters, lr * warm, lr)


def make_optimizer(cfg: SolverConfig, trainable_mask: Optional[Dict] = None):
    """optax chain implementing the reference training update:
    grad-clip(35) -> weight decay -> SGD momentum, with an injected
    per-step LR (reference adjusts lr in-place each iter)."""
    stages = []
    if trainable_mask is not None:
        # zero frozen-param grads up front (optax.masked leaves unmasked
        # updates UNTOUCHED, so wrapping the whole chain would apply raw
        # gradients to frozen params); this also excludes them from the
        # global-norm clip, matching torch's requires_grad=False behavior
        frozen = {k: not v for k, v in trainable_mask.items()}
        stages.append(optax.masked(optax.set_to_zero(), frozen))
    stages += [
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.add_decayed_weights(
            cfg.weight_decay,
            mask=trainable_mask if trainable_mask is not None else None,
        ),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(lambda step: get_lr_at_iter(step, cfg)),
    ]
    return optax.chain(*stages)


def frozen_mask(params: Dict, freeze_prefixes: Sequence[str] = ("conv1", "res_conv1", "res2")) -> Dict:
    """True for TRAINABLE params. The reference freezes conv1..layer1
    (stem + res2, train_fast.py:87-90); BN scales are affine consts and
    always frozen (model permanently in eval mode, detector.py:231)."""
    def trainable(name: str) -> bool:
        if name.endswith("_bn_s") or name.endswith("_bn_b"):
            return False
        return not name.startswith(tuple(freeze_prefixes))

    return {k: trainable(k) for k in params}
