"""Minimal functional NN layer kit (conv / BN / dense) on jax.lax.

Parameters live in plain nested dicts keyed by the Matterport Keras layer
names (e.g. ``params["res2a_branch2a"]["kernel"]``): the weight *names* are
the interchange contract with the reference's `weights.h5` artifact
(SURVEY.md §7 step 3 — the conversion pipeline at
`Sources/maskrcnn/Python/Conversion/task.py` consumed those same names via
Keras). Kernels are stored HWIO, matching both Keras HDF5 layout and
`lax.conv_general_dilated`'s NHWC/HWIO convention — weights load with no
transposition.

Mixed precision: parameters are stored float32; convolutions/matmuls run in
the configured compute dtype (bfloat16 by default — the TPU-idiomatic
equivalent of the reference's fp16 weight quantization,
`Conversion/task.py:90,102,114`) with float32 MXU accumulation.
BatchNorm is inference-mode affine (the reference graphs are frozen-BN, and
Matterport trains with `train_bn=False`); its scale/shift math is float32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ----------------------------------------------------------------------------
# Initializers (used for random init / training-from-scratch; pretrained
# weights overwrite these).
# ----------------------------------------------------------------------------

def _he_normal(key, shape):
    fan_in = int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape, jnp.float32) * np.sqrt(2.0 / fan_in)


def _glorot_uniform(key, shape):
    fan_in = int(np.prod(shape[:-1]))
    fan_out = int(shape[-1])
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, shape, jnp.float32, minval=-limit, maxval=limit)


def conv_init(key, kh, kw, cin, cout) -> Params:
    return {
        "kernel": _he_normal(key, (kh, kw, cin, cout)),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def dense_init(key, cin, cout) -> Params:
    return {
        "kernel": _glorot_uniform(key, (cin, cout)),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def bn_init(c) -> Params:
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
        "moving_mean": jnp.zeros((c,), jnp.float32),
        "moving_variance": jnp.ones((c,), jnp.float32),
    }


# ----------------------------------------------------------------------------
# Layer application
# ----------------------------------------------------------------------------

def conv2d(x, p: Params, *, stride=1, padding="SAME", dtype=jnp.bfloat16):
    """NHWC conv. `padding` is "SAME", "VALID", or explicit [(lo,hi),(lo,hi)]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["kernel"].astype(dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # bf16 convs still accumulate fp32 on the MXU; only the output is
    # rounded. Keeping in/out dtypes equal keeps the VJP well-typed.
    y = y + p["bias"].astype(y.dtype)
    return y.astype(dtype)


def conv2d_transpose(x, p: Params, *, stride=2, dtype=jnp.bfloat16):
    """Keras Conv2DTranspose, 'valid' padding, kernel == stride (the only
    configuration the mask head uses: 2x2 stride-2 deconv, exact 2x upsample).

    With kernel == stride the output blocks don't overlap, so the transpose
    conv is exactly out[ki+di, kj+dj, o] = sum_c in[i,j,c] * K[di,dj,c,o] —
    expressed as an einsum (a clean MXU matmul over the channel axis) instead
    of `lax.conv_transpose`, whose lowering is both slower and pathologically
    slow to compile on some backends.
    """
    kh, kw = p["kernel"].shape[:2]
    if isinstance(stride, int):
        stride = (stride, stride)
    assert (kh, kw) == tuple(stride), "deconv requires kernel == stride"
    n, h, w, _ = x.shape
    o = p["kernel"].shape[-1]
    y = jnp.einsum(
        "nhwc,pqco->nhpwqo",
        x.astype(dtype), p["kernel"].astype(dtype))
    y = y.reshape(n, h * kh, w * kw, o) + p["bias"].astype(y.dtype)
    return y.astype(dtype)


def batch_norm(x, p: Params, *, eps=1e-3, use_batch_stats=False,
               collect=None, name=None):
    """BatchNormalization (Keras default eps=1e-3).

    Inference mode (default) uses the stored moving statistics — correct for
    pretrained weights and Matterport-style frozen-BN fine-tuning.

    `use_batch_stats=True` normalizes with the CURRENT batch statistics —
    required for training from scratch: with frozen (0, 1) stats the scale
    mismatch (~12x at conv1) blows up beta/gamma until ReLU dies globally
    (observed: a "converged" from-scratch run whose backbone output was
    constant). `collect` (a dict) + `name` records the batch statistics so
    `calibrate_bn_stats` can write fresh moving stats after training.
    """
    xf = x.astype(jnp.float32)
    if use_batch_stats or collect is not None:
        axes = tuple(range(xf.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        if collect is not None:
            collect[name] = (mean, var)
    if use_batch_stats:
        use_mean, use_var = mean, var
    else:
        use_mean, use_var = p["moving_mean"], p["moving_variance"]
    scale = p["gamma"] * jax.lax.rsqrt(use_var + eps)
    shift = p["beta"] - use_mean * scale
    y = xf * scale + shift
    return y.astype(x.dtype)


def bn_apply(x, params: Params, name: str, bn_ctx=None):
    """BN by layer name with an optional context:
    bn_ctx = None (inference stats) or
    {"use_batch_stats": bool, "collect": dict | None}."""
    if bn_ctx is None:
        return batch_norm(x, params[name])
    return batch_norm(
        x, params[name],
        use_batch_stats=bn_ctx.get("use_batch_stats", False),
        collect=bn_ctx.get("collect"), name=name)


def dense(x, p: Params, *, dtype=jnp.bfloat16):
    y = jnp.dot(x.astype(dtype), p["kernel"].astype(dtype))
    return y + p["bias"].astype(y.dtype)


def max_pool(x, window, stride, padding="SAME"):
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype.type(0),
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=padding)


def upsample2x_nearest(x):
    """UpSampling2D(2) — nearest-neighbor, matches Keras default interp."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def relu(x):
    return jnp.maximum(x, 0)
