"""Probe: ROI-grid repacking for the mask-head conv trunk.

PERF.md names "ROI-grid repacking" as the candidate for the mask head's
21.6 ms vs 16.7 ms floor (tiny 14x14 spatial dims; per-ROI conv halo
overhead). This probe measures it with the same rigor as the 16 recorded
negative results.

The trick: pack the (R, 14, 14, C) ROI batch into one (1, 16g, 16g, C)
canvas of 16x16 cells, each ROI's payload at offset (1,1) with a 1-px
zero frame. A 3x3 SAME conv over the canvas then gives every payload
pixel EXACTLY the zero-padding neighborhood the per-ROI SAME conv gives
it (the frame rows/cols are what its window reads at the ROI edge), so
the whole 4-conv trunk runs as a single large-spatial conv — the shape
the MXU tiles best — at the cost of (16/14)^2 = 1.306x the pixels and a
frame re-zero between convs (conv output at frame pixels mixes adjacent
ROIs and must be cleared to keep the invariant).

Arms (R ROIs, bf16, BN folded as in inference):
  trunk_batched : 4x [conv3x3 SAME + BN + relu] on (R, 14, 14, 256) —
                  today's XLA formulation inside the jitted forward.
  trunk_packed  : pack -> 4x [conv + BN + relu + frame re-zero] on the
                  canvas -> unpack.
  Both arms then run the identical deconv + class-select tail, so the
  delta isolates the trunk formulation.

Ref: `models/heads.py::apply_mask_head` (the production path),
`TimeDistributedMaskLayer.swift:51-75` (the reference's per-ROI loop).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/mask_repack_probe.py --out docs/mask_repack_probe_r04.json
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tpu.models import nn


def p50(fn, iters=12, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1000.0


def make_params(rng, c=256, nc=81):
    p = {}
    for i in range(1, 5):
        p[f"mrcnn_mask_conv{i}"] = {
            "kernel": jnp.asarray(
                rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)}
        p[f"mrcnn_mask_bn{i}"] = {
            "gamma": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
            "beta": jnp.asarray(rng.standard_normal(c) * .1, jnp.float32),
            "moving_mean": jnp.asarray(
                rng.standard_normal(c) * .1, jnp.float32),
            "moving_variance": jnp.asarray(
                rng.uniform(0.5, 2.0, c), jnp.float32)}
    p["mrcnn_mask_deconv"] = {
        "kernel": jnp.asarray(
            rng.standard_normal((2, 2, c, c)) * 0.05, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)}
    p["mrcnn_mask"] = {
        "kernel": jnp.asarray(
            rng.standard_normal((1, 1, c, nc)) * 0.05, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(nc) * 0.1, jnp.float32)}
    return p


def trunk_batched(params, x, dtype=jnp.bfloat16):
    for i in range(1, 5):
        x = nn.conv2d(x, params[f"mrcnn_mask_conv{i}"], padding="SAME",
                      dtype=dtype)
        x = nn.relu(nn.bn_apply(x, params, f"mrcnn_mask_bn{i}", None))
    return x


def trunk_packed(params, x, dtype=jnp.bfloat16, cell=16, pool=14):
    r, _, _, c = x.shape
    g = math.isqrt(r - 1) + 1  # ceil sqrt
    pad_r = g * g - r
    xp = jnp.pad(x, ((0, pad_r), (1, cell - 1 - pool),
                     (1, cell - 1 - pool), (0, 0)))
    canvas = xp.reshape(g, g, cell, cell, c).transpose(0, 2, 1, 3, 4)
    canvas = canvas.reshape(1, g * cell, g * cell, c)
    # frame mask: 1 on payload pixels, 0 on each cell's frame
    inb = (jnp.arange(cell) >= 1) & (jnp.arange(cell) <= pool)
    m1 = jnp.tile(inb, g)
    mask = (m1[:, None] & m1[None, :]).astype(dtype)[None, :, :, None]
    for i in range(1, 5):
        canvas = nn.conv2d(canvas, params[f"mrcnn_mask_conv{i}"],
                           padding="SAME", dtype=dtype)
        canvas = nn.relu(
            nn.bn_apply(canvas, params, f"mrcnn_mask_bn{i}", None))
        canvas = canvas * mask  # re-zero frames (keeps the halo invariant)
    out = canvas.reshape(g, cell, g, cell, c).transpose(0, 2, 1, 3, 4)
    out = out.reshape(g * g, cell, cell, c)[:r, 1:1 + pool, 1:1 + pool]
    return out


def tail(params, x, class_ids, dtype=jnp.bfloat16):
    x = nn.relu(nn.conv2d_transpose(x, params["mrcnn_mask_deconv"],
                                    stride=2, dtype=dtype))
    k = params["mrcnn_mask"]
    kern = k["kernel"].reshape(k["kernel"].shape[-2], k["kernel"].shape[-1])
    w = jnp.take(kern, class_ids, axis=1).T.astype(dtype)
    b = jnp.take(k["bias"], class_ids)
    logits = jnp.einsum("nhwc,nc->nhw", x.astype(dtype), w,
                        preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(logits + b[:, None, None])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=3200,
                    help="batch 32 x 100 detections (the ablation config)")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--out", default="docs/mask_repack_probe_r04.json")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    params = make_params(rng)
    x = jnp.asarray(rng.standard_normal((args.rois, 14, 14, 256)) * 0.5,
                    jnp.bfloat16)
    cls = jnp.asarray(rng.integers(1, 81, args.rois), jnp.int32)

    f_b = jax.jit(lambda p, xx: tail(p, trunk_batched(p, xx), cls))
    f_p = jax.jit(lambda p, xx: tail(p, trunk_packed(p, xx), cls))

    a = np.asarray(f_b(params, x))
    b = np.asarray(f_p(params, x))
    # identical math up to bf16 rounding order (the packed conv reduces in
    # a different spatial tiling)
    max_abs = float(np.abs(a - b).max())
    print(f"# parity max |batched - packed| = {max_abs:.5f} "
          f"(post-sigmoid)", file=sys.stderr)
    assert max_abs < 0.05, max_abs
    if args.check_only:
        print(json.dumps({"parity_max_abs": max_abs}))
        return 0

    t_b = p50(lambda: np.asarray(f_b(params, x)[0, 0]), args.iters)
    t_p = p50(lambda: np.asarray(f_p(params, x)[0, 0]), args.iters)

    report = {
        "rois": args.rois,
        "parity_max_abs_post_sigmoid": round(max_abs, 5),
        "trunk_batched_plus_tail_ms": round(t_b, 2),
        "trunk_packed_plus_tail_ms": round(t_p, 2),
        "packed_speedup": round(t_b / t_p, 3),
        "pixel_inflation": round((16 / 14) ** 2, 3),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
