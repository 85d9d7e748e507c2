"""Pyramid ROIAlign as one flat gather over the concatenated FPN pyramid.

TPU-native replacement for the reference's `PyramidROIAlignLayer`
(`Sources/Mask-RCNN-CoreML/PyramidROIAlignLayer.swift:40-498`), which had to
(a) pick an FPN level per ROI on CPU (`:373-377`), (b) group consecutive
same-level ROIs (`:399-467`), (c) batch ≤64 crops through
`MPSNNCropAndResizeBilinear` per 4-channel texture slice (`:212-224,469-498`)
and (d) pipeline three Metal command buffers (`:143-179`). None of that
machinery survives on TPU: all four pyramid levels are flattened row-major
into one (S, C) table, each ROI's bilinear corner samples become flat indices
(level offset + y*W + x), and the whole op is a single XLA gather + weighted
sum — no grouping, no batching, no host↔device hops.

Sampling semantics follow `tf.image.crop_and_resize` (bilinear,
out-of-range → 0), because the reference's correctness oracle is its
TensorFlow comparison path (SURVEY.md §7 "hard parts" #2), not MPS quirks.

Level selection (reference `PyramidROIAlignLayer.swift:373-377`):
    level = round(log2(sqrt(w*h) / (224/sqrt(image_area)))) + 4, clamped [2,5]
with zero-area ROIs (log2(0) = -inf) treated as padding → zero output.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def roi_levels(
    rois: jnp.ndarray,
    image_shape: tuple[int, int],
    canonical_scale: float = 224.0,
    min_level: int = 2,
    max_level: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each normalized (N,4) ROI to an FPN level.

    Returns (level_index, valid): level_index in [0, max_level-min_level]
    relative to P_{min_level}; valid is False for degenerate (≤0 area) ROIs,
    which the reference routes to its zero-padding path
    (`PyramidROIAlignLayer.swift:380-390`).
    """
    h = rois[:, 2] - rois[:, 0]
    w = rois[:, 3] - rois[:, 1]
    area = w * h
    image_area = float(image_shape[0]) * float(image_shape[1])
    ratio = canonical_scale / jnp.sqrt(image_area)
    # log2(sqrt(area)/ratio) + 4 == 0.5*log2(area) - log2(ratio) + 4
    lvl = 0.5 * jnp.log2(jnp.maximum(area, 1e-30)) - jnp.log2(ratio) + 4.0
    # Swift round() rounds half away from zero; jnp.round is half-to-even.
    # lvl is positive here, so floor(x + 0.5) matches the reference exactly.
    lvl = jnp.clip(jnp.floor(lvl + 0.5), min_level, max_level).astype(jnp.int32)
    valid = area > 0.0
    return jnp.where(valid, lvl - min_level, 0), valid


def _crop_grid(coord_lo, coord_hi, size_minus_1, crop: int):
    """1-D crop_and_resize sample positions for one ROI edge pair.

    coord_lo/hi: (N,) normalized y1/y2 (or x1/x2); size_minus_1: (N,) per-ROI
    feature extent minus one. Returns (N, crop) float32 sample positions.
    """
    steps = jnp.arange(crop, dtype=jnp.float32)  # (P,)
    if crop > 1:
        span = (coord_hi - coord_lo) * size_minus_1 / (crop - 1)  # (N,)
        return coord_lo[:, None] * size_minus_1[:, None] + steps[None, :] * span[:, None]
    return 0.5 * (coord_lo + coord_hi)[:, None] * size_minus_1[:, None]


class FlatPyramid:
    """Precomputed flat pyramid table shared by multiple ROIAlign calls.

    Building the widened pair table costs two full passes over the pyramid
    (~90 MB at 1024²/256ch), so the forward pass builds it ONCE and feeds
    both the pool-7 (classifier) and pool-14 (mask) aligns.
    Registered as a pytree so it can flow through jit/vmap.
    """

    def __init__(self, wide, heights, widths, offsets, num_levels, channels):
        self.wide = wide                  # (S, 2C) [cell | cell+1] pairs
        self.heights = heights            # (L,) f32
        self.widths = widths              # (L,) f32
        self.offsets = offsets            # (L,) i32 flat row offsets
        self.num_levels = num_levels
        self.channels = channels

    def tree_flatten(self):
        return ((self.wide, self.heights, self.widths, self.offsets),
                (self.num_levels, self.channels))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


jax.tree_util.register_pytree_node(
    FlatPyramid, FlatPyramid.tree_flatten, FlatPyramid.tree_unflatten)


def build_flat_pyramid(features: Sequence[jnp.ndarray]) -> FlatPyramid:
    """Flatten P2..P5 row-major into one widened (S, 2C) pair table.

    Row k holds [cell k | cell k+1], so two row gathers fetch all four
    bilinear corners. (An int8 4-corner "quad" variant — one gather per
    output pixel at half the bytes — was measured SLOWER end-to-end on v5e:
    the int8->f32 conversion and 4-way combine outweigh the gather saving,
    and the table build adds a full pyramid pass. See git history.)
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    # NOTE(perf): building per-level widened pairs and concatenating once
    # ("one fusion, less traffic" in theory) measured ~17 ms SLOWER at batch
    # 32 on v5e than this flat+roll+concat chain — XLA fuses roll-of-concat
    # into the final concat write better than concat-of-concats. Keep flat.
    # Formulation space, measured END-TO-END at batch 32 on v5e via fused
    # ablation cuts with chained-readback timing (gathers are index-bound at
    # ~14 ns/index; build traffic rides HBM at ~340 GB/s):
    #   wide pairs, 2 gathers x 1KB/position + 2.85GB build   -> 75 ms  WINNER
    #   no table,   4 gathers x 512B/position, zero build     -> 98 ms
    #   bf16 quad,  1 gather x 2KB/position + 5.7GB build     -> 109 ms
    #   int8 quad   (earlier round)                           -> slower still
    #   per-level wide build ("one fusion")                   -> +17 ms vs flat
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    wide = jnp.concatenate([flat, jnp.roll(flat, -1, axis=0)], axis=1)
    heights = jnp.asarray([f.shape[0] for f in features], jnp.float32)
    widths = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in features]
    offsets = jnp.asarray(
        [sum(sizes[:i]) for i in range(num_levels)], jnp.int32)
    return FlatPyramid(wide, heights, widths, offsets, num_levels, c)


@functools.partial(jax.jit, static_argnames=("crop_size", "image_shape",
                                             "canonical_scale"))
def pyramid_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    crop_size: int,
    image_shape: tuple[int, int],
    canonical_scale: float = 224.0,
) -> jnp.ndarray:
    """Pool (N, crop, crop, C) features for (N, 4) normalized ROIs.

    Args:
      features: pyramid levels P2..P5, each (H_l, W_l, C), finest first.
      rois: (N, 4) y1x1y2x2 in [0, 1]; zero rows are padding → zero output.
      crop_size: output spatial size (7 for the classifier head, 14 for the
        mask head — reference `PyramidROIAlignLayer.swift:45`).
      image_shape: (H, W) of the network input, for level selection.
    """
    return pyramid_roi_align_flat(
        build_flat_pyramid(features), rois, crop_size, image_shape,
        canonical_scale)


@functools.partial(jax.jit, static_argnames=("crop_size", "image_shape",
                                             "canonical_scale"))
def pyramid_roi_align_flat(
    fp: FlatPyramid,
    rois: jnp.ndarray,
    crop_size: int,
    image_shape: tuple[int, int],
    canonical_scale: float = 224.0,
) -> jnp.ndarray:
    """Same as pyramid_roi_align, over a prebuilt (shared) FlatPyramid."""
    num_levels = fp.num_levels
    c = fp.channels
    compute_dtype = fp.wide.dtype
    heights, widths, offsets = fp.heights, fp.widths, fp.offsets

    rois = rois.astype(jnp.float32)
    level, valid = roi_levels(
        rois, image_shape, canonical_scale,
        min_level=2, max_level=2 + num_levels - 1)

    fh = jnp.take(heights, level)  # (N,) per-roi feature height
    fw = jnp.take(widths, level)
    off = jnp.take(offsets, level)  # (N,) flat offset of the roi's level
    row_stride = jnp.take(widths, level).astype(jnp.int32)

    y = _crop_grid(rois[:, 0], rois[:, 2], fh - 1.0, crop_size)  # (N, P)
    x = _crop_grid(rois[:, 1], rois[:, 3], fw - 1.0, crop_size)  # (N, P)

    # crop_and_resize: samples outside [0, size-1] contribute 0.
    y_in = (y >= 0.0) & (y <= (fh - 1.0)[:, None])
    x_in = (x >= 0.0) & (x <= (fw - 1.0)[:, None])

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[:, :, None]  # (N, P, 1)
    wx = (x - x0)[:, None, :]  # (N, 1, P)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, (fh - 1.0)[:, None].astype(jnp.int32))
    x0i = jnp.clip(x0.astype(jnp.int32), 0, (fw - 1.0)[:, None].astype(jnp.int32))
    y1i = jnp.minimum(y0i + 1, (fh - 1.0)[:, None].astype(jnp.int32))
    x1i = jnp.minimum(x0i + 1, (fw - 1.0)[:, None].astype(jnp.int32))

    base = off[:, None]  # (N, 1)

    def flat_idx(yi, xi):
        # (N, P) x (N, P) -> (N, P, P) flat table rows
        return (base[:, :, None] + yi[:, :, None] * row_stride[:, None, None]
                + xi[:, None, :])

    # TPU gathers are per-INDEX latency-bound (~40 GB/s at 512 B rows,
    # measured), and only plain row gathers hit the fast path — slice-mode
    # gathers (slice_sizes=(2, C)) are ~50x slower. So fetch both bilinear
    # x-corners with ONE row gather from the widened pair table (row k =
    # [cell k | cell k+1]): half the indices at the fast-path rate. The pair
    # construction wraps at level boundaries and the table end, but those
    # rows are only read when x0 is at the right edge, where wx == 0
    # (clipped sampling has floor(x) == x), so the wrapped half is weighted
    # by exactly zero. All values stay finite.
    wide = fp.wide

    # Edge clamps: at the right edge the wrapped pair half must be weighted
    # exactly zero (clipped sampling has floor == coordinate there).
    wx_e = wx[..., None].astype(compute_dtype)  # (N, 1, P, 1)
    wy_e = wy[..., None].astype(compute_dtype)  # (N, P, 1, 1)
    wx_ok = (x1i > x0i)[:, None, :, None].astype(compute_dtype)
    wx_e = wx_e * wx_ok

    def gather_pair(idx):
        # (N, P, P) -> (N, P, P, 2C): [corner, corner_right]
        g = jnp.take(wide, idx.reshape(-1), axis=0, mode="clip")
        return g.reshape(idx.shape + (2 * c,))

    g_top = gather_pair(flat_idx(y0i, x0i))  # (N, P, P, 2C)
    g_bot = gather_pair(flat_idx(y1i, x0i))
    top = g_top[..., :c] * (1 - wx_e) + g_top[..., c:] * wx_e
    bot = g_bot[..., :c] * (1 - wx_e) + g_bot[..., c:] * wx_e
    out = top * (1 - wy_e) + bot * wy_e

    in_range = (y_in[:, :, None] & x_in[:, None, :])[..., None]
    mask = in_range & valid[:, None, None, None]
    out = jnp.where(mask, out, jnp.zeros((), compute_dtype))
    return out
