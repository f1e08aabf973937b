"""Train state and optimizer construction.

Replaces the reference's optimizer/scheduler/apex assembly (reference:
code/utils/utils.py:135-163, code/sseg/models/modules/schedulers.py:7-14,
code/sseg/models/modules/seg_models/deeplab_v2.py:66-69) with one optax
transform: per-group learning rates (backbone x1, ASPP/representation x10),
torch-Adam-style L2 weight decay, cosine/poly schedules evaluated inside the
jit'd step, and frozen-BN parameters pinned with ``set_to_zero`` (the TPU
equivalent of ``requires_grad=False``, reference code/utils/utils.py:60-65).

bf16 on TPU needs no loss scaling, so the whole apex AMP layer
(reference code/utils/utils.py:126-132) disappears.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    d_params: Any = None
    d_opt_state: Any = None
    # mutual learning: the peer student (reference mut_training surface,
    # code/utils/default_config.py:159-167)
    peer_params: Any = None
    peer_batch_stats: Any = None
    peer_opt_state: Any = None


def lr_schedule(cfg):
    """Callable step -> lr multiplier-free absolute LR (backbone group)."""
    base = cfg.train.lr
    total = cfg.train.total_iter
    kind = cfg.train.lr_scheduler.type
    if kind == "Cosine":
        eta_min = base * 1e-3

        def fn(t):
            return eta_min + (base - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t / total))

        return fn
    if kind == "Poly":
        power = cfg.train.lr_scheduler.poly.power

        def fn(t):
            return base * (1.0 - t / total) ** power

        return fn
    raise ValueError(f"{kind!r} is not a valid scheduler")


def _param_labels(params, freeze_bn: bool):
    """Label each param leaf: 'backbone' | 'head' | 'frozen'."""

    def label(path, _leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        # BatchNorm scale/bias leaves live under modules named bn*/downsample_bn
        if freeze_bn and any(k.startswith("bn") or k.endswith("_bn") for k in keys):
            return "frozen"
        # The vestigial `representation` head is computed by the reference but
        # never consumed by any loss, so its torch grads are None and Adam
        # skips it entirely — whereas optax would apply coupled weight decay
        # to its zero gradients.  Pin it for exact update parity
        # (tests/test_train_parity.py); reference deeplab_v2.py:38-40,63.
        if keys and keys[0] == "representation":
            return "frozen"
        if keys and keys[0] == "backbone":
            return "backbone"
        return "head"  # aspp: 10x lr (deeplab_v2.py:66-69)

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    """The generator (segmentation model) optimizer."""
    wd = cfg.train.weight_decay
    kind = cfg.train.optimizer
    if kind == "Adam":
        # torch Adam couples wd into the gradient BEFORE the moment updates
        pre = [optax.add_decayed_weights(wd)]
        core = [optax.scale_by_adam(b1=0.9, b2=0.999)]
    elif kind == "AdamW":
        # decoupled: wd applied AFTER the adam scaling (torch AdamW semantics)
        pre = []
        core = [optax.scale_by_adam(b1=0.9, b2=0.999), optax.add_decayed_weights(wd)]
    elif kind == "SGD":
        pre = [optax.add_decayed_weights(wd)]
        core = [optax.trace(decay=0.9)]
    else:
        raise ValueError(f"{kind!r} is not a valid optimizer")

    labels = _param_labels(params, cfg.model.is_freeze_bn)
    schedule = lr_schedule(cfg)
    return optax.chain(
        *pre,
        *core,
        optax.multi_transform(
            {"backbone": optax.scale(1.0), "head": optax.scale(10.0), "frozen": optax.set_to_zero()},
            labels,
        ),
        optax.scale_by_schedule(lambda t: -schedule(t)),
    )


def make_d_optimizer(cfg) -> optax.GradientTransformation:
    """Discriminator optimizer: fixed Adam (reference utils.py:150-152)."""
    schedule = lr_schedule_for_d(cfg)
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.scale_by_schedule(lambda t: -schedule(t)),
    )


def lr_schedule_for_d(cfg):
    """The reference schedules the D optimizer with the same scheduler type
    at the discriminator's own base lr — but build_scheduler hardcodes
    ``eta_min = cfg.train.lr * 1e-3`` (the GENERATOR's lr) for every
    optimizer it wraps (reference schedulers.py:9), so the D cosine floor is
    the generator-derived value, not d_lr * 1e-3."""
    base = cfg.model.discriminator.lr
    total = cfg.train.total_iter
    if cfg.train.lr_scheduler.type == "Cosine":
        eta_min = cfg.train.lr * 1e-3
        return lambda t: eta_min + (base - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t / total))
    power = cfg.train.lr_scheduler.poly.power
    return lambda t: base * (1.0 - t / total) ** power


def ema_update(ema_params, params, gamma: float):
    """param-wise EMA (reference code/utils/utils.py:115-123); batch_stats
    are copied wholesale by the caller (buffers track the student)."""
    return jax.tree.map(lambda e, p: e * gamma + p * (1.0 - gamma), ema_params, params)
