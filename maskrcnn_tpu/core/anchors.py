"""Pyramid anchor generation (Matterport convention).

Replaces the reference's pre-baked ~5 MB `anchors.bin` artifact — a raw
float32 dump of normalized (y1,x1,y2,x2) anchors produced by the external
Keras package and written at `Sources/maskrcnn/Python/Conversion/task.py:176`,
then memory-mapped at inference by `ProposalLayer.init`
(`Sources/Mask-RCNN-CoreML/ProposalLayer.swift:68`). The reference itself
wanted on-demand generation (TODO at
`Sources/Mask-RCNN-CoreML/MaskRCNNConfig.swift:14`); here we generate them,
and keep `load_anchors_bin`/`save_anchors_bin` for byte-level artifact parity.

Ordering contract (must match the RPN output layout): levels P2..P6 outer,
then row-major over (y, x) feature positions, then the 3 aspect ratios —
261,888 anchors at 1024² (SURVEY.md §2 hyperparameter table).
"""

from __future__ import annotations

import numpy as np

from maskrcnn_tpu.core.config import MaskRCNNConfig


def generate_level_anchors(
    scale: float,
    ratios: np.ndarray,
    feature_shape: tuple[int, int],
    feature_stride: int,
    anchor_stride: int = 1,
) -> np.ndarray:
    """Anchors for one pyramid level, in image pixels, (y1,x1,y2,x2).

    Per feature cell the anchor box has height scale/sqrt(r) and width
    scale*sqrt(r), centered on the cell's image-space position
    (y*stride, x*stride). Ratio varies fastest.
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    heights = scale / np.sqrt(ratios)  # (R,)
    widths = scale * np.sqrt(ratios)  # (R,)

    shifts_y = np.arange(0, feature_shape[0], anchor_stride) * feature_stride
    shifts_x = np.arange(0, feature_shape[1], anchor_stride) * feature_stride
    ctr_x, ctr_y = np.meshgrid(shifts_x, shifts_y)  # (H, W) row-major

    # (H*W, R) with ratio fastest
    cy = np.repeat(ctr_y.reshape(-1, 1), len(ratios), axis=1)
    cx = np.repeat(ctr_x.reshape(-1, 1), len(ratios), axis=1)
    hh = np.broadcast_to(heights, cy.shape)
    ww = np.broadcast_to(widths, cx.shape)

    boxes = np.stack(
        [cy - 0.5 * hh, cx - 0.5 * ww, cy + 0.5 * hh, cx + 0.5 * ww],
        axis=-1)  # (H*W, R, 4)
    return boxes.reshape(-1, 4)


def generate_pyramid_anchors_pixels(config: MaskRCNNConfig) -> np.ndarray:
    """All-level anchors in image-pixel coordinates, float64 (N,4)."""
    ratios = np.asarray(config.anchor_ratios, dtype=np.float64)
    parts = [
        generate_level_anchors(
            scale, ratios, fshape, stride, config.anchor_stride)
        for scale, fshape, stride in zip(
            config.anchor_scales, config.feature_shapes,
            config.backbone_strides)
    ]
    return np.concatenate(parts, axis=0)


def norm_boxes(boxes: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Pixel (y1,x1,y2,x2) -> normalized [0,1] coordinates.

    Matterport convention: (box - [0,0,1,1]) / [H-1,W-1,H-1,W-1]. The -1 on
    (y2,x2) accounts for pixel-corner vs pixel-center; this is the convention
    under which `anchors.bin` was written and under which the reference clips
    boxes to [0,1] (`Sources/Mask-RCNN-CoreML/BoxUtils.swift:73-80`).
    """
    h, w = shape
    scale = np.array([h - 1, w - 1, h - 1, w - 1], dtype=np.float64)
    shift = np.array([0.0, 0.0, 1.0, 1.0], dtype=np.float64)
    return (boxes - shift) / scale


def denorm_boxes(boxes: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Inverse of :func:`norm_boxes` (back to pixel coordinates)."""
    h, w = shape
    scale = np.array([h - 1, w - 1, h - 1, w - 1], dtype=np.float64)
    shift = np.array([0.0, 0.0, 1.0, 1.0], dtype=np.float64)
    return boxes * scale + shift


def generate_anchors(config: MaskRCNNConfig) -> np.ndarray:
    """Normalized float32 anchors (N,4) — the `anchors.bin` contents."""
    pix = generate_pyramid_anchors_pixels(config)
    return norm_boxes(
        pix, (config.image_height, config.image_width)).astype(np.float32)


def save_anchors_bin(anchors: np.ndarray, path: str) -> None:
    """Raw little-endian float32 dump, same format as the reference artifact
    (`Conversion/task.py:176` `anchors.tofile`)."""
    np.ascontiguousarray(anchors, dtype="<f4").tofile(path)


def load_anchors_bin(path: str, expect_count: int | None = None) -> np.ndarray:
    data = np.fromfile(path, dtype="<f4")
    if data.size % 4:
        raise ValueError(f"{path}: size {data.size} not divisible by 4")
    anchors = data.reshape(-1, 4)
    if expect_count is not None and anchors.shape[0] != expect_count:
        raise ValueError(
            f"{path}: expected {expect_count} anchors, found {anchors.shape[0]}")
    return anchors


def anchor_spec(config: MaskRCNNConfig):
    """Hashable per-level spec for in-graph analytic anchor computation
    (`anchors_at`). Entries: (flat offset, grid_h, grid_w, center step in
    pixels, per-ratio (height, width) pairs pre-rounded to float32)."""
    ratios = np.asarray(config.anchor_ratios, dtype=np.float64)
    levels = []
    off = 0
    for scale, (fh, fw), stride in zip(
            config.anchor_scales, config.feature_shapes,
            config.backbone_strides):
        gh = len(range(0, fh, config.anchor_stride))
        gw = len(range(0, fw, config.anchor_stride))
        hw = tuple(
            (float(np.float32(scale / np.sqrt(r))),
             float(np.float32(scale * np.sqrt(r)))) for r in ratios)
        levels.append((off, gh, gw,
                       config.anchor_stride * stride, hw))
        off += gh * gw * len(ratios)
    return (tuple(levels), len(ratios),
            (config.image_height, config.image_width))


def anchors_at(idx, spec):
    """Normalized (y1,x1,y2,x2) anchors for flat indices, computed in-graph.

    Replaces the (A, 8) gather-table trip through HBM in the proposal stage:
    the anchor at a flat index is a closed-form function of (level, cell,
    ratio), so the top-k indices can be decoded with pure VPU arithmetic —
    no table build, no second gather (docs/PERF.md: TPU gathers are
    per-index latency-bound). Matches `generate_anchors` to float32
    rounding (<=2 ulp; the table rounds once from float64).

    Args:
      idx: (K,) int32 flat anchor indices (level-major layout, see module
        docstring ordering contract).
      spec: output of `anchor_spec(config)` (static/hashable).

    Returns (K, 4) float32 normalized anchors.
    """
    import jax.numpy as jnp

    levels, n_ratios, (img_h, img_w) = spec
    n_levels = len(levels)
    idx = idx.astype(jnp.int32)
    starts = [lv[0] for lv in levels]
    level = sum((idx >= s).astype(jnp.int32) for s in starts[1:])

    def sel_level(vals):
        out = jnp.float32(vals[0])
        for i in range(1, n_levels):
            out = jnp.where(level == i, jnp.float32(vals[i]), out)
        return out

    j = idx - sel_level(starts).astype(jnp.int32)
    r = j % n_ratios
    cell = j // n_ratios
    gw = sel_level([lv[2] for lv in levels]).astype(jnp.int32)
    step = sel_level([lv[3] for lv in levels])
    cy = (cell // gw).astype(jnp.float32) * step
    cx = (cell % gw).astype(jnp.float32) * step

    def sel_hw(which):
        out = jnp.zeros_like(cy)
        for li, lv in enumerate(levels):
            for ri in range(n_ratios):
                v = jnp.float32(lv[4][ri][which])
                out = jnp.where((level == li) & (r == ri), v, out)
        return out

    hh, ww = sel_hw(0), sel_hw(1)
    sy = jnp.float32(img_h - 1)
    sx = jnp.float32(img_w - 1)
    return jnp.stack([
        (cy - 0.5 * hh) / sy,
        (cx - 0.5 * ww) / sx,
        (cy + 0.5 * hh - 1.0) / sy,
        (cx + 0.5 * ww - 1.0) / sx,
    ], axis=-1)
