"""Pyramid ROIAlign as a Pallas TPU kernel: DMA row strips, combine on MXU.

Why: XLA's row-gather on TPU is per-index latency-bound (~14 ns/index —
measured, see `ops/roi_align.py`), and crop_and_resize needs ~100 gathered
rows per ROI; at 32 images x 1000 proposals that is ~45 ms of pure index
latency. This kernel replaces the gather with per-ROI *streaming* DMAs: for
each of the `crop` output rows it fetches ONE (2, 48, C) feature strip (both
bilinear y-corner rows across a 48-cell x-window) directly from the ROI's
pyramid level in HBM, double-buffered across grid steps. 98 random 512 B
reads per ROI become `crop` strided ~50 KB reads — DMA-rate, not index-rate.

The four pyramid levels are stacked row-wise into ONE (B, sum(H_l), Wmax, C)
array (narrow levels zero-padded in x), so a ROI's level is just a row
offset baked into its precomputed row indices — the kernel has a single DMA
source and no per-level branching, which matters because the op is DMA
*descriptor-rate* bound (measured ~100 ns per start/wait pair).

The bilinear combine itself is two dense ops per output row: a scalar blend
of the two y-corner strips (VPU), then a (q, WINDOW) @ (WINDOW, C) matmul
against a per-ROI x-weight matrix (MXU) whose rows hold each output column's
two slot weights. The weight-matrix formulation sidesteps Mosaic's dynamic
sublane-alignment restriction (a pair-extract at an arbitrary window offset
is unprovable; a dense matmul needs no dynamic indexing at all).

Semantics are identical to `ops/roi_align.py::pyramid_roi_align_flat`
(tf.image.crop_and_resize sampling, the reference's TF oracle — SURVEY.md §7
"hard parts" #2; level assignment per `PyramidROIAlignLayer.swift:373-377`),
verified against it in tests. Bilinear edge clamps (`x1 = min(x0+1, W-1)`)
are folded into the slot weights ("slot collapse": when both corners clamp
to the same cell that slot's weight is their sum), so padding ROIs, edge
samples, and out-of-range samples are all plain zero-weight rows.

DMA offsets on a tiled HBM dimension must be *provably* 8-aligned, so the
prep stage stores x-window starts divided by 8 and the kernel multiplies
back. The 48-cell fast window requires the ROI's sample columns to span
<= 39 cells at its level; FPN level selection bounds a square ROI's span to
~20 cells, so this covers aspect ratios up to ~4. Wider ROIs (rare) take a
slow path that fetches one aligned (2, 16, C) block per output column into
16-cell slots of a widened window, reusing the same matmul combine. Exact
for arbitrary ROIs either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskrcnn_tpu.ops.common import round_up

from maskrcnn_tpu.ops.roi_align import _crop_grid, roi_levels

FAST_W = 48  # fast-path x-window cells; multiple of 16 for bf16 tiling


class StackedPyramid:
    """P2..P5 stacked row-wise into one (B, R, Wmax, C) array.

    Build it once per forward pass (`stack_pyramid`) and share it between
    the pool-7 and pool-14 aligns. Registered as a pytree.
    """

    def __init__(self, stacked, level_hw):
        self.stacked = stacked
        self.level_hw = tuple(map(tuple, level_hw))

    def tree_flatten(self):
        return ((self.stacked,), self.level_hw)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], aux)


jax.tree_util.register_pytree_node(
    StackedPyramid, StackedPyramid.tree_flatten,
    StackedPyramid.tree_unflatten)


def stack_pyramid(features) -> StackedPyramid:
    """Stack (B, H_l, W_l, C) levels along rows, x-padded to a common width.

    XLA lowers the pad+concat to direct writes into one buffer, so this
    costs one pass over the pyramid — and replaces the XLA path's widened
    pair-table build entirely.
    """
    wmax = max(FAST_W, max(f.shape[2] for f in features))
    level_hw = [(f.shape[1], f.shape[2]) for f in features]
    padded = [jnp.pad(f, ((0, 0), (0, 0), (0, wmax - f.shape[2]), (0, 0)))
              for f in features]
    stacked = jnp.concatenate(padded, axis=1)
    # One trailing zero row: a height-1 last level would otherwise make the
    # kernel's 2-row strip DMA read past the array (the extra row's weight
    # is always zero, but OOB bytes could be NaN/Inf and 0*NaN = NaN).
    stacked = jnp.pad(stacked, ((0, 0), (0, 1), (0, 0), (0, 0)))
    return StackedPyramid(stacked, level_hw)


def _axis_slots(coord_lo, coord_hi, extent, valid, crop):
    """Per-axis crop_and_resize corner slots + collapsed slot weights.

    coord_lo/hi: (M,) normalized edge pair; extent: (M,) feature cells (f32).
    Returns (slot_start (M, P) i32, w_slot0, w_slot1 (M, P) f32) where
    slot_start is clamped to [0, extent-2] and w_slot{0,1} weight the cells
    slot_start / slot_start+1 (out-of-range samples -> both weights 0).
    """
    pos = _crop_grid(coord_lo, coord_hi, extent - 1.0, crop)  # (M, P)
    ext = extent[:, None]
    in_range = (pos >= 0.0) & (pos <= ext - 1.0) & valid[:, None]
    c0 = jnp.clip(jnp.floor(pos), 0.0, ext - 1.0)
    c1 = jnp.minimum(c0 + 1.0, ext - 1.0)
    frac = jnp.clip(pos - c0, 0.0, 1.0)
    w_lo = jnp.where(in_range, 1.0 - frac, 0.0)
    w_hi = jnp.where(in_range, frac, 0.0)
    start = jnp.clip(c0, 0.0, jnp.maximum(ext - 2.0, 0.0))
    w_slot0 = w_lo * (c0 == start) + w_hi * (c1 == start)
    w_slot1 = w_lo * (c0 == start + 1.0) + w_hi * (c1 == start + 1.0)
    return start.astype(jnp.int32), w_slot0, w_slot1


def _prepare(rois, img_idx, level_hw, wmax, image_shape, canonical_scale,
             crop, window, dtype):
    """Vectorized XLA-side index/weight prep for (M, 4) flat ROIs."""
    num_levels = len(level_hw)
    rois = rois.astype(jnp.float32)
    level, valid = roi_levels(rois, image_shape, canonical_scale,
                              min_level=2, max_level=2 + num_levels - 1)
    heights = jnp.asarray([h for h, _ in level_hw], jnp.float32)
    widths = jnp.asarray([w for _, w in level_hw], jnp.float32)
    row_off = jnp.asarray(
        [sum(h for h, _ in level_hw[:i]) for i in range(num_levels)],
        jnp.int32)
    fh = jnp.take(heights, level)
    fw = jnp.take(widths, level)

    rs, wy0, wy1 = _axis_slots(rois[:, 0], rois[:, 2], fh, valid, crop)
    cs, wx0, wx1 = _axis_slots(rois[:, 1], rois[:, 3], fw, valid, crop)
    rs = rs + jnp.take(row_off, level)[:, None]  # stacked-global rows

    # Fast path: one 8-aligned FAST_W window containing every column pair.
    sx8 = jnp.clip(jnp.min(cs, axis=1) // 8, 0, wmax // 8 - FAST_W // 8)
    oversize = (jnp.max(cs, axis=1) + 2 - 8 * sx8 > FAST_W).astype(jnp.int32)
    lx_fast = cs - 8 * sx8[:, None]
    # Slow path: per-column aligned (2, 16, C) block into 16-cell slot 16q.
    ca8 = jnp.minimum(cs // 8, wmax // 8 - 2)
    lx_slow = (16 * jnp.arange(crop, dtype=jnp.int32)[None, :]
               + cs - 8 * ca8)
    lx = jnp.where(oversize[:, None] == 1, lx_slow, lx_fast)

    # The x-combine runs on the MXU as (q, window) @ (window, C): scatter
    # the two slot weights per output column into a dense per-ROI weight
    # matrix (q padded to a sublane multiple). Dtype matches the features —
    # exactly the precision the XLA path computes the lerp at.
    w_iota = jnp.arange(window, dtype=jnp.int32)  # (W,)
    wxm = (wx0[:, :, None] * (w_iota == lx[:, :, None])
           + wx1[:, :, None] * (w_iota == lx[:, :, None] + 1))  # (M, P, W)
    qpad = round_up(crop, 8)
    wxm = jnp.pad(wxm, ((0, 0), (0, qpad - crop), (0, 0))).astype(dtype)

    meta = jnp.stack(
        [img_idx.astype(jnp.int32), oversize, sx8], axis=1)  # (M, 3)
    return meta, rs, ca8, wy0, wy1, wxm


def _kernel(meta_ref, rs_ref, ca8_ref, wy0_ref, wy1_ref,
            wxm_ref, src, out_ref, buf, sems,
            *, P: int, window: int, ablate: str = ""):
    # Scalar-prefetch refs are FLAT 1-D (index [j*k + p]): 2-D SMEM arrays
    # pad every row to 512 B, which blows the 1 MB SMEM budget at useful
    # chunk sizes; flat arrays pack tight.

    def strip_copy(j, slot, p):
        """Fast path: one (2, FAST_W, C) strip for output row p."""
        return pltpu.make_async_copy(
            src.at[meta_ref[j * 3], pl.ds(rs_ref[j * P + p], 2),
                   pl.ds(meta_ref[j * 3 + 2] * 8, FAST_W), :],
            buf.at[slot, p, :, pl.ds(0, FAST_W), :], sems.at[slot])

    def block_copy(j, slot, p, q):
        """Slow path: one aligned (2, 16, C) block into 16-cell slot 16q."""
        return pltpu.make_async_copy(
            src.at[meta_ref[j * 3], pl.ds(rs_ref[j * P + p], 2),
                   pl.ds(ca8_ref[j * P + q] * 8, 16), :],
            buf.at[slot, p, :, pl.ds(16 * q, 16), :], sems.at[slot])

    def issue(j, slot):
        ovr = meta_ref[j * 3 + 1]

        @pl.when(ovr == 0)
        def _():
            def body(p, c):
                strip_copy(j, slot, p).start()
                return c
            jax.lax.fori_loop(0, P, body, 0)

        @pl.when(ovr != 0)
        def _():
            def body(k, c):
                block_copy(j, slot, k // P, k % P).start()
                return c
            jax.lax.fori_loop(0, P * P, body, 0)

    def wait(j, slot):
        # ONE wait per ROI: every copy for this ROI signals sems[slot], and
        # a DMA wait only consumes (semaphore, byte count) — so wait on a
        # STATIC descriptor whose slice has the same total bytes as the
        # whole ROI's transfer set. Fast path moves P*(2, FAST_W, C); slow
        # path P*P*(2, 16, C) == P*(2, 16*P, C). This halves+ the
        # descriptor-rate bound (dynamic address math runs once, at start).
        ovr = meta_ref[j * 3 + 1]

        @pl.when(ovr == 0)
        def _():
            ref = buf.at[slot, :, :, pl.ds(0, FAST_W), :]
            pltpu.make_async_copy(ref, ref, sems.at[slot]).wait()

        @pl.when(ovr != 0)
        def _():
            ref = buf.at[slot, :, :, pl.ds(0, 16 * P), :]
            pltpu.make_async_copy(ref, ref, sems.at[slot]).wait()

    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

    @pl.when(i == 0)
    def _():
        # One-time scratch zero: the weight matmul zero-weights every window
        # cell a DMA didn't fill, which is only NaN/Inf-safe if those cells
        # hold real values. After step 0 stale cells hold prior-ROI data.
        buf[...] = jnp.zeros_like(buf)
        if ablate != "nodma":
            issue(0, 0)

    if ablate != "nodma":
        @pl.when(i + 1 < n)
        def _():
            issue(i + 1, 1 - slot)

        wait(i, slot)

    # Bilinear combine per output row p (static unroll): blend the two
    # y-corner strips with scalar slot weights (VPU), contract the window
    # axis against this ROI's x-weight matrix (MXU). The fast path blends
    # and contracts only the FAST_W prefix it filled.
    def combine(p, width):
        s = (buf[slot, p, 0, :width, :].astype(jnp.float32)
             * wy0_ref[i * P + p]
             + buf[slot, p, 1, :width, :].astype(jnp.float32)
             * wy1_ref[i * P + p])
        res = jnp.dot(wxm_ref[0, :, :width], s.astype(buf.dtype),
                      preferred_element_type=jnp.float32)  # (qpad, C)
        out_ref[0, p, :, :] = res[:P].astype(out_ref.dtype)

    if ablate == "nocompute":
        out_ref[0, 0, 0, :] = (buf[slot, 0, 0, 0, :]
                               + wxm_ref[0, 0, :1]).astype(out_ref.dtype)
    elif window == FAST_W:
        for p in range(P):
            combine(p, FAST_W)
    else:
        @pl.when(meta_ref[i * 3 + 1] == 0)
        def _():
            for p in range(P):
                combine(p, FAST_W)

        @pl.when(meta_ref[i * 3 + 1] != 0)
        def _():
            for p in range(P):
                combine(p, window)


@functools.partial(
    jax.jit, static_argnames=("crop_size", "image_shape", "canonical_scale",
                              "chunk", "interpret", "ablate"))
def pyramid_roi_align_pallas(
    features,
    rois: jnp.ndarray,
    crop_size: int,
    image_shape: tuple[int, int],
    canonical_scale: float = 224.0,
    chunk: int = 2048,
    interpret: bool = False,
    ablate: str = "",
) -> jnp.ndarray:
    """Batched pyramid ROIAlign: (B, N, crop, crop, C) pooled features.

    Args:
      features: P2..P5 as a list of (B, H_l, W_l, C) arrays (finest first),
        or a prebuilt `StackedPyramid` shared across calls.
      rois: (B, N, 4) normalized y1x1y2x2; zero rows -> zero output.
    """
    pyr = (features if isinstance(features, StackedPyramid)
           else stack_pyramid(features))
    bsz = pyr.stacked.shape[0]
    n = rois.shape[1]
    c = pyr.stacked.shape[-1]
    wmax = pyr.stacked.shape[2]
    dtype = pyr.stacked.dtype
    window = max(FAST_W, 16 * crop_size)

    m = bsz * n
    img_idx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)
    meta, rs, ca8, wy0, wy1, wxm = _prepare(
        rois.reshape(m, 4), img_idx, pyr.level_hw, wmax, image_shape,
        canonical_scale, crop_size, window, dtype)
    qpad = wxm.shape[1]

    chunk = min(chunk, round_up(m, 8))
    pad = (-m) % chunk
    if pad:
        zi = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        meta, rs, ca8, wy0, wy1, wxm = map(
            zi, (meta, rs, ca8, wy0, wy1, wxm))
    mc = m + pad
    nc = mc // chunk
    # Flatten the scalar operands (see _kernel note on SMEM row padding).
    meta, rs, ca8, wy0, wy1 = (
        a.reshape(nc, -1) if nc > 1 else a.reshape(-1)
        for a in (meta, rs, ca8, wy0, wy1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(chunk,),
        in_specs=[
            pl.BlockSpec((1, qpad, window), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, crop_size, crop_size, c),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, crop_size, 2, window, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_kernel, P=crop_size, window=window,
                          ablate=ablate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chunk, crop_size, crop_size, c),
                                       dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )

    def run_chunk(sl):
        return call(sl["meta"], sl["rs"], sl["ca8"], sl["wy0"], sl["wy1"],
                    sl["wxm"], pyr.stacked)

    xs = {"meta": meta, "rs": rs, "ca8": ca8, "wy0": wy0, "wy1": wy1,
          "wxm": wxm}
    if nc == 1:
        out = run_chunk(xs)
    else:
        xs["wxm"] = wxm.reshape((nc, chunk) + wxm.shape[1:])
        _, out = jax.lax.scan(
            lambda carry, sl: (carry, run_chunk(sl)), 0, xs)
        out = out.reshape((mc, crop_size, crop_size, c))
    return out[:m].reshape(bsz, n, crop_size, crop_size, c)
