"""Greedy NMS as a single Pallas TPU kernel.

The whole problem fits on-chip: 6144 boxes are 98 KB, so the kernel keeps
boxes, candidate mask, keep mask, and the compact kept-buffer resident in
VMEM and walks the tiles inside one grid step — no per-tile HBM round trips
or XLA fusion boundaries. Semantics are identical to `ops/nms.py::nms_padded`
(sequential greedy selection on score-sorted boxes, zero-area rows inert,
stop-at-max_out via the compact-buffer argument documented there), which the
reference implements as a scalar Swift loop (`Utils.swift:185-218`).

Kernel structure per tile:
  1. cross-suppression: IoU of the kept-buffer vs the tile (VPU), chunked
     over the buffer so only its FILLED 128-row chunks are computed (zero
     rows are inert but not free — early tiles see a near-empty buffer);
  2. within-tile fixpoint of the suppression relation (`lax.while_loop`,
     converges to the unique greedy solution);
  3. keep-mask write + kept-buffer append, the append expressed as a
     (cap, B) one-hot matmul instead of a scatter (MXU-friendly, no
     per-element stores).

The tile walk itself is a `while_loop` that stops once `max_out` boxes are
kept: selection order equals index order, so keepers found after the cap can
never enter the first `max_out` output slots (`ops/nms.py::_compact` takes
exactly those) — the remaining tiles' flags are dead either way and their
rows stay at the zero the kernel writes up front. At the proposal stage
(6k boxes -> 1k kept at IoU 0.7) this typically skips most of the walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskrcnn_tpu.ops.common import round_up


def _pairwise_hit(a, b, threshold):
    """(M, 4) x (B, 4) -> (M, B) f32 {0,1} mask of `IoU > threshold`,
    degenerate boxes inert.

    Division-free: `inter/union > t ⟺ inter > t*union` for union > 0 —
    the f32 divide is the most expensive VPU op in the IoU and the NMS
    only consumes the comparison (see `ops/boxes.py::box_overlap_mask`).

    Column extraction uses slice+transpose, NOT integer indexing — an int
    index on the minor axis lowers to a `gather`, which Mosaic can't lower.
    """
    ay1, ax1, ay2, ax2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    by1, bx1, by2, bx2 = (b[:, 0:1].T, b[:, 1:2].T, b[:, 2:3].T, b[:, 3:4].T)
    area_a = (ay2 - ay1) * (ax2 - ax1)        # (M, 1)
    area_b = ((by2 - by1) * (bx2 - bx1))      # (1, B)
    iy = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    ix = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    inter = iy * ix
    union = area_a + area_b - inter
    hit = (inter > threshold * union) & (area_a > 0.0) & (area_b > 0.0)
    return jnp.where(hit, 1.0, 0.0)


def _nms_kernel(boxes_ref, cand_ref, keep_ref, buf_ref, cnt_ref, *,
                num_tiles: int, tile: int, cap: int, max_out: int,
                threshold: float):
    # Zero the whole keep output first: the early-exit walk below may never
    # visit the tail tiles (their flags are semantically dead — see module
    # docstring — but the output buffer starts uninitialized).
    keep_ref[...] = jnp.zeros_like(keep_ref)
    buf_ref[...] = jnp.zeros_like(buf_ref)
    cnt_ref[0] = 0

    row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    upper = row < col

    # Cross-suppression buffer chunk: 128 sublanes of the (cap, 4) buffer.
    # cap is a multiple of 8, so the last chunk may be short — handled by a
    # static final chunk when cap % 128 != 0.
    chunk = min(128, cap)

    def tile_body(state):
        t, cnt = state
        start = t * tile
        tb = boxes_ref[pl.ds(start, tile), :]          # (B, 4)
        tc = cand_ref[pl.ds(start, tile), :]           # (B, 1) f32

        area = (tb[:, 2:3] - tb[:, 0:1]) * (tb[:, 3:4] - tb[:, 1:2])  # (B,1)

        # Suppression by earlier keepers: walk only the buffer chunks that
        # hold real boxes (ceil(cnt / chunk) of them); zero rows beyond cnt
        # are inert, but skipping them skips their IoU compute entirely.
        def chunk_body(cstate):
            c, sup_acc = cstate
            cb = buf_ref[pl.ds(c * chunk, chunk), :]   # (chunk, 4)
            ci = _pairwise_hit(cb, tb, threshold)      # (chunk, B) {0,1}
            hitc = jnp.max(ci, axis=0, keepdims=True).T    # (B, 1)
            return c + 1, jnp.maximum(sup_acc, hitc)

        full_chunks = cap // chunk
        active = jnp.minimum((cnt + chunk - 1) // chunk, full_chunks)
        _, sup = jax.lax.while_loop(
            lambda s: s[0] < active, chunk_body,
            (jnp.int32(0), jnp.zeros((tile, 1), jnp.float32)))
        if cap % chunk:
            # Static tail chunk (cap not a multiple of 128): only computed
            # when the buffer has filled past the full chunks.
            tail = buf_ref[pl.ds(full_chunks * chunk, cap % chunk), :]
            ti = _pairwise_hit(tail, tb, threshold)
            tail_hit = jnp.max(ti, axis=0, keepdims=True).T
            sup = jnp.where(cnt > full_chunks * chunk,
                            jnp.maximum(sup, tail_hit), sup)
        cand = jnp.where(
            (tc > 0.0) & (area > 0.0) & (sup == 0.0), 1.0, 0.0)  # (B,1)

        over_f = _pairwise_hit(tb, tb, threshold) * jnp.where(
            upper, 1.0, 0.0)

        # Fixpoint loop. The mask is carried as a 2-D f32 column (Mosaic
        # cannot legalize while-carried 1-D i1 vectors); convergence is a
        # scalar flag.
        def fix_body(state):
            kf, _ = state  # (B, 1) f32 in {0, 1}
            suppressed = jnp.max(over_f * kf, axis=0, keepdims=True).T
            nk = cand * jnp.where(suppressed > 0.0, 0.0, 1.0)
            changed = jnp.sum(jnp.abs(nk - kf)) > 0.0
            return nk, changed

        keep_t, _ = jax.lax.while_loop(
            lambda s: s[1], fix_body, (cand, True))   # (B, 1) f32

        keep_ref[pl.ds(start, tile), :] = keep_t

        # Append keepers to the buffer: one-hot (cap, B) @ (B, 4) on the MXU;
        # prefix sum via a lower-triangular matmul (Mosaic has no cumsum).
        incl = jnp.dot(jnp.where(row >= col, 1.0, 0.0), keep_t,
                       preferred_element_type=jnp.float32)  # (B, 1)
        ranks = (jnp.asarray(cnt, jnp.float32)
                 + incl - 1.0)  # (B, 1) f32 slot ids
        slot_rows = jax.lax.broadcasted_iota(
            jnp.int32, (cap, tile), 0).astype(jnp.float32)
        hit = (slot_rows == ranks.T) & (keep_t.T > 0.0)  # (cap, B)
        # Exact append: a dot would run at default MXU precision (bf16
        # passes) and round the stored coordinates enough to flip
        # near-threshold IoUs; boxes are clipped to [0, 1], so a masked max
        # per coordinate moves them bit-exactly.
        for coord in range(4):
            cvals = tb[:, coord:coord + 1].T                  # (1, B)
            buf_ref[:, coord:coord + 1] += jnp.max(
                jnp.where(hit, cvals, 0.0), axis=1, keepdims=True)
        cnt = jnp.minimum(cnt + jnp.sum(keep_t).astype(jnp.int32), cap)
        return t + 1, cnt

    # Early-exit tile walk: stop as soon as max_out boxes are kept.
    _, cnt_end = jax.lax.while_loop(
        lambda s: (s[0] < num_tiles) & (s[1] < max_out), tile_body,
        (jnp.int32(0), jnp.int32(0)))
    cnt_ref[0] = cnt_end


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "tile_size", "interpret"))
def nms_keep_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    tile_size: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, 4) score-sorted boxes -> (N,) greedy keep mask (Pallas kernel)."""
    n = boxes.shape[0]
    pad = (-n) % tile_size
    boxes_p = jnp.concatenate(
        [boxes.astype(jnp.float32), jnp.zeros((pad, 4), jnp.float32)])
    cand_p = jnp.concatenate(
        [valid.astype(jnp.float32), jnp.zeros((pad,), jnp.float32)])
    np_ = n + pad
    num_tiles = np_ // tile_size
    cap = round_up(min(max_out, np_), 8)

    keep = pl.pallas_call(
        functools.partial(
            _nms_kernel, num_tiles=num_tiles, tile=tile_size, cap=cap,
            max_out=max_out, threshold=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cap, 4), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(boxes_p, cand_p[:, None])
    return keep[:n, 0] > 0.0
