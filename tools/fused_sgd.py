"""Fused flat-vector SGD: the whole optimizer update as ~a dozen kernels.

The r03 train-step ablation (`docs/ablate_train_r03.json`) measured the
optax chain (clip-by-global-norm → decoupled weight decay → SGD momentum →
apply-updates) at 40.1 ms per step on the ~700-leaf resnet101 tree — ~10%
of the whole training step for ~3 GB of HBM traffic that should cost ~4 ms.
The cost is kernel COUNT, not bytes: each optax stage tree_maps a tiny
kernel per leaf (4 stages × ~700 leaves). This module runs arithmetic
IDENTICAL to that chain on one concatenated f32 vector (`ravel_pytree`),
so the whole update is a handful of full-width VPU passes; the
trainable/decay masks become precomputed 0/1 vectors.

Semantics reproduced exactly (verified to f32 round-off by
`tools/opt_probe.py` and `tests/test_training.py::test_fused_sgd_matches_optax`):

    g    = g · trainable                      (freeze by zeroing grads)
    g    = g · clip / max(‖g‖₂, clip)         (optax.clip_by_global_norm)
    g    = g + wd · decay_mask · p            (optax.add_decayed_weights,
                                               kernels of trainable layers)
    m    = μ · m + g                          (optax.trace, μ = 0.9)
    p    = p − lr · m                         (optax.sgd + apply_updates)

The reference has no training at all (`TrainCommand.swift:4-15`); this is
part of the beyond-reference training subsystem.
"""

from __future__ import annotations

import re
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class FusedSGDState(NamedTuple):
    momentum: jnp.ndarray     # (N,) f32 — optax `trace`
    trainable: jnp.ndarray    # (N,) f32 0/1 — layer-regex freeze mask
    decay: jnp.ndarray        # (N,) f32 0/1 — weight-decay mask (kernels
    #                           of trainable layers only)


def flatten_tree(tree) -> tuple[Callable[[jnp.ndarray], Any], jnp.ndarray]:
    """-> (unravel_fn, flat f32 vector). Wrapper over ravel_pytree so the
    probe and the train step share one flattening convention."""
    flat, unravel = ravel_pytree(tree)
    return unravel, flat.astype(jnp.float32)


def unflatten_to(unravel: Callable, flat: jnp.ndarray):
    return unravel(flat)


def _mask_vector(params, predicate) -> jnp.ndarray:
    """0/1 f32 vector in ravel_pytree order: predicate(layer, weight_name)
    per leaf, broadcast over the leaf's elements."""
    mask_tree = {
        layer: {w: jnp.full(jnp.shape(arr),
                            1.0 if predicate(layer, w) else 0.0,
                            jnp.float32)
                for w, arr in weights.items()}
        for layer, weights in params.items()
    }
    flat, _ = ravel_pytree(mask_tree)
    return flat


def fused_sgd_init(params, config, trainable: str = "all") -> FusedSGDState:
    """Build the flat state. `trainable` is a FREEZE_PRESETS key or a raw
    layer-name regex (same contract as make_optimizer)."""
    from maskrcnn_tpu.train.step import FREEZE_PRESETS

    # The flat path runs everything in f32 and assumes a two-level
    # {layer: {weight: arr}} tree; on any other dtype the momentum/update
    # arithmetic would silently diverge from the optax chain it claims to
    # reproduce exactly. Fail loudly instead (ADVICE r03).
    for layer, weights in params.items():
        for w, arr in weights.items():
            if jnp.asarray(arr).dtype != jnp.float32:
                raise TypeError(
                    f"fused_sgd requires float32 params; {layer}/{w} is "
                    f"{jnp.asarray(arr).dtype}")

    pattern = re.compile(FREEZE_PRESETS.get(trainable, trainable))

    # Mirror make_optimizer's frozen-BN whole-layer freeze (ADVICE r04):
    # with config.train_bn == "frozen" every BatchNorm layer is untrainable
    # regardless of the layer regex — without this the "arithmetic
    # IDENTICAL to the optax chain" claim breaks for frozen-BN configs.
    freeze_bn = config.train_bn == "frozen"

    def _is_bn(weights) -> bool:
        return set(weights) <= {"gamma", "beta",
                                "moving_mean", "moving_variance"}

    bn_layers = {layer for layer, weights in params.items()
                 if _is_bn(weights)} if freeze_bn else set()
    train_mask = _mask_vector(
        params, lambda layer, w: bool(pattern.fullmatch(layer))
        and layer not in bn_layers)
    decay_mask = _mask_vector(
        params,
        lambda layer, w: w == "kernel" and bool(pattern.fullmatch(layer)))
    return FusedSGDState(momentum=jnp.zeros_like(train_mask),
                         trainable=train_mask, decay=decay_mask)


def fused_sgd_step(params, grads, state: FusedSGDState, *, lr: float,
                   weight_decay: float, momentum: float = 0.9,
                   clip_norm: float = 5.0):
    """One update. params/grads are trees; returns (new_params_tree,
    new_state). All arithmetic happens on flat vectors."""
    unravel, p = flatten_tree(params)
    _, g = flatten_tree(grads)

    g = g * state.trainable
    gnorm = jnp.sqrt(jnp.sum(g * g))
    g = g * (clip_norm / jnp.maximum(gnorm, clip_norm))
    g = g + weight_decay * state.decay * p
    m = momentum * state.momentum + g
    p = p - lr * m
    return unravel(p), state._replace(momentum=m)
