"""Padded greedy non-max suppression under jit (TPU blockwise formulation).

Replaces the reference's O(N·selected) scalar greedy loop `nonMaxSupression`
(`Sources/Mask-RCNN-CoreML/Utils.swift:185-218`) with a tiled, fully
vectorized algorithm whose result is *exactly* the sequential greedy
selection on score-sorted boxes:

  select box i  iff  valid(i) and no selected j < i has IoU(j, i) > threshold

The reference's semantics are preserved:
  * boxes arrive sorted by descending score (the caller sorts — as
    `ProposalLayer.swift:131-137` does before calling NMS);
  * boxes with non-positive width/height are never selected and never
    suppress (`Utils.swift:195,234-238`) — zero padding is inert;
  * selection stops after `max_out` boxes (`Utils.swift:192`); because
    selection order equals index order, taking the first `max_out` kept
    indices of the full fixpoint is identical to early termination.

Algorithm: process boxes in tiles of `tile_size`. For tile t, (a) suppress by
already-kept boxes from earlier tiles with one (N, B) IoU matrix against the
keep-masked box array (unkept boxes are zeroed, making their IoU 0); (b)
resolve the within-tile sequential dependency by iterating the suppression
relation to its fixpoint (at most B iterations, `lax.while_loop` with early
exit — the greedy solution is the unique fixpoint). All shapes static; maps
onto VPU-friendly (B, B) matrices instead of scalar loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maskrcnn_tpu.ops.common import round_up

from maskrcnn_tpu.ops.boxes import box_overlap_mask


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "tile_size", "return_mask",
                     "impl"))
def nms_padded(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    tile_size: int = 512,
    return_mask: bool = False,
    impl: str = "auto",
):
    """Greedy NMS over score-sorted (N, 4) boxes.

    Args:
      boxes: (N, 4) y1x1y2x2, sorted by descending score. Padding rows must be
        all-zero (zero area) or flagged invalid.
      valid: (N,) bool — candidate mask (scores above threshold etc.).
      iou_threshold: suppress later box when IoU with a kept earlier box
        exceeds this (strict >, matching `Utils.swift:203`).
      max_out: number of output slots.
      tile_size: blockwise tile width (multiple of 128 for VPU lanes).
      return_mask: also return the (N,) keep mask. On the Pallas path the
        mask is exact only up to the `max_out`-th selection — the kernel
        stops its tile walk there (see `nms_pallas.py`), so later flags
        read zero. The indices/valid_out outputs are unaffected (they only
        ever report the first `max_out` selections).

    Returns:
      indices: (max_out,) int32 indices into `boxes` of kept rows in selection
        (= score) order; slots past the kept count are `N` (an out-of-range
        sentinel — gather with mode='fill' or mask by `valid_out`).
      valid_out: (max_out,) bool — which output slots hold real selections.
      [keep_mask]: optional (N,) bool.
    """
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    cand_all = valid & (area > 0.0)

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from maskrcnn_tpu.ops.nms_pallas import nms_keep_pallas
        # Honor the caller's tile_size, clamped to the kernel's VMEM-friendly
        # range [128, 512] and rounded down to a lane multiple (512 measured
        # fastest at the 6k-proposal size; larger tiles blow scoped VMEM).
        tile_pl = max(128, min((tile_size // 128) * 128, 512))
        keep = nms_keep_pallas(
            boxes, cand_all, float(iou_threshold), max_out,
            tile_size=min(tile_pl, round_up(n, 128)))
        return _compact(keep, n, max_out, return_mask)

    pad = (-n) % tile_size
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0)
        cand_all = jnp.concatenate(
            [cand_all, jnp.zeros((pad,), jnp.bool_)], axis=0)
    np_ = n + pad
    num_tiles = np_ // tile_size

    # Cross-tile suppression uses a COMPACT buffer of the first `max_out`
    # kept boxes instead of the keep-masked full array: selection stops at
    # max_out anyway (Utils.swift:192), and keepers past that cap can only
    # suppress boxes that rank after the cap themselves, so dropping them
    # cannot change the first max_out selections. This turns the per-tile
    # IoU from (N, B) into (max_out, B).
    buf_cap = min(max_out, np_)

    def process_tile(carry, t):
        keep, buf, cnt = carry
        start = t * tile_size
        tile = jax.lax.dynamic_slice(boxes, (start, 0), (tile_size, 4))
        tile_cand = jax.lax.dynamic_slice(cand_all, (start,), (tile_size,))

        # (a) suppression by earlier kept boxes (zero rows in buf are inert).
        # Division-free comparison (box_overlap_mask): the NMS only ever
        # needs `IoU > t`, never the quotient itself.
        sup_cross = jnp.any(
            box_overlap_mask(buf, tile, iou_threshold), axis=0)

        # (b) within-tile sequential resolution (fixpoint == greedy).
        over = box_overlap_mask(tile, tile, iou_threshold)
        cand = tile_cand & ~sup_cross

        b = tile_size
        row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
        over = over & (row < col)

        def body(state):
            k, _ = state
            suppressed = jnp.any(over & k[:, None], axis=0)
            nk = cand & ~suppressed
            return nk, jnp.any(nk != k)

        tile_keep, _ = jax.lax.while_loop(
            lambda s: s[1], body, (cand, jnp.bool_(True)))

        keep = jax.lax.dynamic_update_slice(keep, tile_keep, (start,))
        # Append this tile's keepers to the compact buffer (drop past cap).
        ranks = cnt + jnp.cumsum(tile_keep.astype(jnp.int32)) - 1
        slot = jnp.where(tile_keep & (ranks < buf_cap), ranks, buf_cap)
        buf = buf.at[slot].set(tile, mode="drop")
        cnt = jnp.minimum(cnt + tile_keep.sum(), buf_cap)
        return (keep, buf, cnt), None

    keep0 = jnp.zeros((np_,), jnp.bool_)
    buf0 = jnp.zeros((buf_cap, 4), boxes.dtype)
    (keep, _, _), _ = jax.lax.scan(
        process_tile, (keep0, buf0, jnp.int32(0)),
        jnp.arange(num_tiles, dtype=jnp.int32))
    keep = keep[:n]
    return _compact(keep, n, max_out, return_mask)


def _compact(keep, n: int, max_out: int, return_mask: bool):
    """First max_out kept indices in selection order + validity mask."""
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1  # rank among kept
    slot = jnp.where(keep & (rank < max_out), rank, max_out)
    indices = jnp.full((max_out + 1,), n, jnp.int32)
    indices = indices.at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:max_out]
    valid_out = indices < n

    if return_mask:
        return indices, valid_out, keep
    return indices, valid_out



def nms_gather(boxes: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather rows by NMS output indices; sentinel rows (== N) become zeros."""
    return jnp.take(boxes, indices, axis=0, mode="fill", fill_value=0.0)
