"""MobileNetV2 backbone — the low-latency variant from the reference roadmap.

The reference README's roadmap lists mobile-optimized backbones as planned
work and BASELINE.json carries a "MobileNetV2-FPN low-latency variant"
config; the reference never shipped one. This is a standard MobileNetV2
(inverted residual bottlenecks, relu6, frozen BN at inference) emitting
C2..C5 taps for the same FPN.

Topology (width 1.0): stem conv 3x3/2 -> inverted-residual groups
(expansion t, channels c, repeats n, stride s):
    (1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2) (6,96,3,1)
    (6,160,3,2) (6,320,1,1)
Taps: C2 = end of the 24-ch group (stride 4), C3 = 32-ch (stride 8),
C4 = 96-ch (stride 16), C5 = 320-ch (stride 32).

Parameters use our own naming (`mbv2_...`) — there is no Matterport weight
contract for this backbone; weights come from our `train` command or any
HDF5/npz written with these names.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maskrcnn_tpu.models import nn

_GROUPS = [
    # (expansion, channels, repeats, first_stride)
    (1, 16, 1, 1),
    (6, 24, 2, 2),   # -> C2 tap (stride 4)
    (6, 32, 3, 2),   # -> C3 tap (stride 8)
    (6, 64, 4, 2),
    (6, 96, 3, 1),   # -> C4 tap (stride 16)
    (6, 160, 3, 2),
    (6, 320, 1, 1),  # -> C5 tap (stride 32)
]
_TAPS = {1: "c2", 2: "c3", 4: "c4", 6: "c5"}
C_CHANNELS = (24, 32, 96, 320)  # FPN lateral input widths


def relu6(x):
    return jnp.clip(x, 0, 6)


def _dw_init(key, k, c):
    # depthwise kernel stored (k, k, 1, c) for feature_group_count=c
    fan_in = k * k
    return {
        "kernel": jax.random.normal(key, (k, k, 1, c), jnp.float32)
        * jnp.sqrt(2.0 / fan_in),
        "bias": jnp.zeros((c,), jnp.float32),
    }


def depthwise_conv(x, p, *, stride=1, dtype=jnp.bfloat16):
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype),
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return (y + p["bias"].astype(y.dtype)).astype(dtype)


def init_mobilenetv2(key) -> nn.Params:
    params: nn.Params = {}
    keys = iter(jax.random.split(key, 256))
    params["mbv2_stem"] = nn.conv_init(next(keys), 3, 3, 3, 32)
    params["mbv2_stem"]["kernel"] = params["mbv2_stem"]["kernel"] / 128.0
    params["mbv2_stem_bn"] = nn.bn_init(32)

    cin = 32
    for gi, (t, c, n, _) in enumerate(_GROUPS):
        for bi in range(n):
            base = f"mbv2_g{gi}b{bi}"
            hidden = cin * t
            if t != 1:
                params[base + "_expand"] = nn.conv_init(
                    next(keys), 1, 1, cin, hidden)
                params[base + "_expand_bn"] = nn.bn_init(hidden)
            params[base + "_dw"] = _dw_init(next(keys), 3, hidden)
            params[base + "_dw_bn"] = nn.bn_init(hidden)
            params[base + "_project"] = nn.conv_init(
                next(keys), 1, 1, hidden, c)
            params[base + "_project_bn"] = nn.bn_init(c)
            cin = c
    return params


def _block(x, params, base, t, cout, stride, dtype, bn_ctx):
    cin = x.shape[-1]
    y = x
    if t != 1:
        y = nn.conv2d(y, params[base + "_expand"], padding="VALID",
                      dtype=dtype)
        y = relu6(nn.bn_apply(y, params, base + "_expand_bn", bn_ctx))
    y = depthwise_conv(y, params[base + "_dw"], stride=stride, dtype=dtype)
    y = relu6(nn.bn_apply(y, params, base + "_dw_bn", bn_ctx))
    y = nn.conv2d(y, params[base + "_project"], padding="VALID", dtype=dtype)
    y = nn.bn_apply(y, params, base + "_project_bn", bn_ctx)
    if stride == 1 and cin == cout:
        y = y + x
    return y


def apply_mobilenetv2(params, images, dtype=jnp.bfloat16, bn_ctx=None):
    """(B, H, W, 3) preprocessed -> (C2, C3, C4, C5)."""
    x = images.astype(dtype)
    x = nn.conv2d(x, params["mbv2_stem"], stride=2, padding="SAME",
                  dtype=dtype)
    x = relu6(nn.bn_apply(x, params, "mbv2_stem_bn", bn_ctx))

    taps = {}
    for gi, (t, c, n, s) in enumerate(_GROUPS):
        for bi in range(n):
            stride = s if bi == 0 else 1
            x = _block(x, params, f"mbv2_g{gi}b{bi}", t, c, stride, dtype,
                       bn_ctx)
        if gi in _TAPS:
            taps[_TAPS[gi]] = x
    return taps["c2"], taps["c3"], taps["c4"], taps["c5"]
