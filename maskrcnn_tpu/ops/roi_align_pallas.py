"""Pyramid ROIAlign as a Pallas TPU kernel: DMA row strips, combine on MXU.

Why: XLA's row-gather on TPU is per-index latency-bound (~14 ns/index —
measured, see `ops/roi_align.py`), and crop_and_resize needs ~100 gathered
rows per ROI; at 32 images x 1000 proposals that is ~45 ms of pure index
latency. This kernel replaces the gather with per-ROI *streaming* DMAs: for
each of the `crop` output rows it fetches ONE (2, 48, C) feature strip (both
bilinear y-corner rows across a 48-cell x-window) directly from the ROI's
pyramid level in HBM, double-buffered across grid steps. 98 random 512 B
reads per ROI become `crop` strided ~50 KB reads — DMA-rate, not index-rate.

The four pyramid levels are passed as four separate DMA sources and the
kernel selects a ROI's source with a scalar `pl.when` branch on its
precomputed level. (An earlier version row-stacked the levels into one
(B, sum(H_l), Wmax, C) array so the kernel had a single branch-free source;
building that array cost a measured 15 ms/step at batch 32 — pure HBM
traffic copying the pyramid — while four predicated issue paths cost only
scalar-core compares. Only P5 needs x-padding to the 48-cell window.)

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

FAST_W = 48  # strip-path x-window cells; multiple of 16 for bf16 tiling

# Block fast path: ROIs whose sample rows fit in block_r rows AND whose
# sample columns fit an 8-aligned block_w window are fetched with ONE
# (block_r, block_w, C) DMA instead of `crop` row-pair strips.
#
# The DMA cost unit is the *strided row segment* (~63 ns each; measured by
# sweeping FAST_W 32/48/64 under ablate="nocompute": 28.4/28.3/28.4 ms at
# 32k pool-7 ROIs — byte count is irrelevant, descriptor count nearly so).
# So the block only wins where it touches fewer rows than the strips:
#   pool-14: 24-row block vs 28 strip rows -> on (12.3 -> 11.3 ms);
#   pool-7: 16-row block vs 14 strip rows -> OFF (measured 31.4 vs 29.8 ms
#   full; even DMA-only it breaks even, and its combine pays ~1.6 ms for
#   dynamic-row reads from the block buffer).
# pool-7 therefore sits at its segment-rate floor (32k x 14 x 63 ns) for
# any per-ROI-fetch formulation; going lower needs per-tile streaming.


def _block_dims(crop: int) -> tuple[int, int]:
    return (0, 0) if crop <= 7 else (24, 32)


MM_S = 16  # fused-head (and mmprobe) steps per classifier matmul burst
HEAD_OUT = 512  # fused-head packed output lanes: [logits | deltas], padded


def pack_classifier_head(params, num_classes: int, dtype=jnp.bfloat16):
    """Fold the classifier head into three resident matmuls for the fused
    ROIAlign kernel.

    The head (`models/heads.py::apply_classifier_head`) is dense(7*7*256 ->
    1024) + BN + relu, dense(1024 -> 1024) + BN + relu, then logits/deltas.
    Inference BN is affine, so it folds into the preceding dense:
    y = (xW + b - mu) * s + beta  ==  x (W*s) + ((b - mu)*s + beta) with
    s = gamma * rsqrt(var + eps). The logits and bbox heads pack into one
    (1024, HEAD_OUT) matrix: columns [0, num_classes) are class logits,
    [128, 128 + 4*num_classes) are box deltas, the rest zero.
    """
    def fold(dense_p, bn_p):
        s = bn_p["gamma"] * jax.lax.rsqrt(bn_p["moving_variance"] + 1e-3)
        w = dense_p["kernel"].astype(jnp.float32) * s[None, :]
        b = (dense_p["bias"].astype(jnp.float32) - bn_p["moving_mean"]) * s \
            + bn_p["beta"]
        return w.astype(dtype), b.astype(jnp.float32)[None, :]

    k1 = params["mrcnn_class_conv1"]
    w1, b1 = fold({"kernel": k1["kernel"].reshape(-1, k1["kernel"].shape[-1]),
                   "bias": k1["bias"]}, params["mrcnn_class_bn1"])
    k2 = params["mrcnn_class_conv2"]
    w2, b2 = fold({"kernel": k2["kernel"].reshape(k2["kernel"].shape[-2],
                                                  k2["kernel"].shape[-1]),
                   "bias": k2["bias"]}, params["mrcnn_class_bn2"])

    nd = 4 * num_classes
    assert num_classes <= 128 and 128 + nd <= HEAD_OUT
    fc = params["mrcnn_class_logits"]["kernel"].shape[0]
    w3 = jnp.zeros((fc, HEAD_OUT), jnp.float32)
    w3 = w3.at[:, :num_classes].set(
        params["mrcnn_class_logits"]["kernel"].astype(jnp.float32))
    w3 = w3.at[:, 128:128 + nd].set(
        params["mrcnn_bbox_fc"]["kernel"].astype(jnp.float32))
    b3 = jnp.zeros((HEAD_OUT,), jnp.float32)
    b3 = b3.at[:num_classes].set(params["mrcnn_class_logits"]["bias"])
    b3 = b3.at[128:128 + nd].set(params["mrcnn_bbox_fc"]["bias"])
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "w3": w3.astype(dtype), "b3": b3[None, :]}


def unpack_classifier_head(head_out, num_classes: int):
    """(M, HEAD_OUT) f32 packed rows -> probs (M, C), deltas (M, C, 4)."""
    logits = head_out[:, :num_classes]
    deltas = head_out[:, 128:128 + 4 * num_classes]
    return (jax.nn.softmax(logits, axis=-1),
            deltas.reshape(-1, num_classes, 4), logits)


def pack_mask_head(params, dtype=jnp.bfloat16):
    """Fold the mask head (`models/heads.py::apply_mask_head`) for in-kernel
    execution: 4x [3x3 conv + BN + relu] as im2col matmuls (bottleneck_pallas
    pattern), the 2x2/2 deconv as one (C, 4C) matmul whose lane groups are
    the four output parities, and the per-class 1x1 select as a per-ROI
    weighted lane reduction. Inference BN folds into the conv weights."""
    def fold(conv, bn):
        k = jnp.asarray(conv["kernel"], jnp.float32)
        b = jnp.asarray(conv["bias"], jnp.float32)
        s = jnp.asarray(bn["gamma"], jnp.float32) * jax.lax.rsqrt(
            jnp.asarray(bn["moving_variance"], jnp.float32) + 1e-3)
        t = (jnp.asarray(bn["beta"], jnp.float32)
             - jnp.asarray(bn["moving_mean"], jnp.float32) * s)
        return k * s, b * s + t

    wconv, bconv = [], []
    for i in range(1, 5):
        k, b = fold(params[f"mrcnn_mask_conv{i}"], params[f"mrcnn_mask_bn{i}"])
        wconv.append(k.reshape(9 * k.shape[2], k.shape[3]))  # (9C, C)
        bconv.append(b)
    c = wconv[0].shape[1]

    # Deconv kernel 2x2 stride 2: out(2y+a, 2x+b) = in(y, x) @ K[a, b] + bias
    # (stride == kernel size -> no tap overlap, no flip ambiguity in effect;
    # verified against nn.conv2d_transpose in tests). Lane group ab = a*2+b.
    kd = jnp.asarray(params["mrcnn_mask_deconv"]["kernel"], jnp.float32)
    wdec = jnp.concatenate([kd[a, b] for a in range(2) for b in range(2)],
                           axis=1)  # (C, 4C)
    bdec = jnp.tile(jnp.asarray(params["mrcnn_mask_deconv"]["bias"],
                                jnp.float32), 4)[None, :]  # (1, 4C)

    km = params["mrcnn_mask"]  # 1x1 (1, 1, C, num_classes) + bias (nc,)
    kcls = jnp.asarray(km["kernel"], jnp.float32).reshape(c, -1).T  # (nc, C)
    return {"wconv": jnp.stack(wconv).astype(dtype),     # (4, 9C, C)
            "bconv": jnp.stack(bconv).astype(jnp.float32),  # (4, C)
            "wdec": wdec.astype(dtype), "bdec": bdec,
            "kcls": kcls, "bcls": jnp.asarray(km["bias"], jnp.float32)}


def unpack_masks(mask_out, crop: int):
    """(M, 16*16, 4) f32 parity-grouped sigmoid masks -> (M, 2*crop, 2*crop).

    Kernel rows are (y, x) over the padded 16x16 grid, lanes (a, b) the
    deconv output parities: mask[2y+a, 2x+b] = mask_out[y*16+x, a*2+b]."""
    m = mask_out.shape[0]
    x = mask_out.reshape(m, 16, 16, 2, 2)
    x = x.transpose(0, 1, 3, 2, 4).reshape(m, 32, 32)
    return x[:, :2 * crop, :2 * crop]


def _pad_level(f):
    """x-pad one (B, H, W, C) level so the window DMAs stay in bounds.

    W must be >= FAST_W and a multiple of 16 (bf16 sublane tile); only P5
    (W=32 at 1024²) actually pads in production. Pad cells are zero and
    only ever multiply zero weights, but must exist so the (2, 48, C)
    strip read has real bytes. Heights need no pad: row starts are clamped
    to H-2 and every strip is exactly 2 rows.
    """
    w = f.shape[2]
    wp = max(FAST_W, round_up(w, 16))
    if wp == w:
        return f
    return jnp.pad(f, ((0, 0), (0, 0), (0, wp - w), (0, 0)))


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


def _prepare(rois, img_idx, level_hw, padded_w, image_shape,
             canonical_scale, crop, window, dtype, block_r, block_w):
    """Vectorized XLA-side index/weight prep for (M, 4) flat ROIs."""
    num_levels = len(level_hw)
    rois = rois.astype(jnp.float32)
    level, valid = roi_levels(rois, image_shape, canonical_scale,
                              min_level=2, max_level=2 + num_levels - 1)
    heights = jnp.asarray([h for h, _ in level_hw], jnp.float32)
    widths = jnp.asarray([w for _, w in level_hw], jnp.float32)
    fh = jnp.take(heights, level)
    fw = jnp.take(widths, level)
    # Window clamps use each ROI's *padded* level width (the DMA extent);
    # sampling math above uses the true width.
    wp8 = jnp.take(jnp.asarray(padded_w, jnp.int32) // 8, level)

    rs, wy0, wy1 = _axis_slots(rois[:, 0], rois[:, 2], fh, valid, crop)
    cs, wx0, wx1 = _axis_slots(rois[:, 1], rois[:, 3], fw, valid, crop)

    # Block path: one (block_r, block_w) window holding every sample.
    # pool-14: 24-row block vs 28 strip rows, measured 12.3 -> 11.3 ms.
    # pool-7: a 24-row block was 1 ms SLOWER (24 > 14 strip rows), but the
    # crop-sized 16-row block wins on rows-touched AND descriptors.
    ih = jnp.take(jnp.asarray([h for h, _ in level_hw], jnp.int32), level)
    rb = jnp.clip(jnp.min(rs, axis=1), 0, jnp.maximum(ih - block_r, 0))
    sxb8 = jnp.clip(jnp.min(cs, axis=1) // 8, 0, wp8 - block_w // 8)
    block_ok = ((jnp.max(rs, axis=1) + 2 - rb <= block_r)
                & (jnp.max(cs, axis=1) + 2 - 8 * sxb8 <= block_w)
                & (ih >= block_r)
                & (block_r > 0))
    # Strip path: one 8-aligned FAST_W window containing every column pair.
    sx8 = jnp.clip(jnp.min(cs, axis=1) // 8, 0, wp8 - FAST_W // 8)
    oversize = jnp.max(cs, axis=1) + 2 - 8 * sx8 > FAST_W
    # path 0 = block (1 DMA), 1 = strips (crop DMAs), 2 = per-col slow.
    path = jnp.where(block_ok, 0, jnp.where(oversize, 2, 1))
    sx8 = jnp.where(block_ok, sxb8, sx8)
    lx_fast = cs - 8 * sx8[:, None]
    # Slow path: per-column aligned (2, 16, C) block into 16-cell slot 16q.
    ca8 = jnp.minimum(cs // 8, wp8[:, None] - 2)
    lx_slow = (16 * jnp.arange(crop, dtype=jnp.int32)[None, :]
               + cs - 8 * ca8)
    lx = jnp.where(path[:, None] == 2, lx_slow, lx_fast)

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
        [img_idx.astype(jnp.int32), path, sx8, level, rb], axis=1)  # (M, 5)
    return meta, rs, ca8, wy0, wy1, wxm


def _kernel(meta_ref, rs_ref, ca8_ref, wy0_ref, wy1_ref,
            wxm_ref, *rest,
            P: int, window: int, L: int, BR: int, BW: int,
            G: int = 1, ablate: str = "", head: bool = False,
            mhead: bool = False):
    if head:
        srcs = rest[:L]
        w1, b1, w2, b2, w3, b3 = rest[L:L + 6]
        out_ref, head_ref, buf, bbuf, sems, acc = rest[L + 6:]
    elif mhead:
        srcs = rest[:L]
        wconv, bconv, wdec, bdec, wcls, bcls = rest[L:L + 6]
        out_ref, mask_ref, buf, bbuf, sems, act_a, act_b = rest[L + 6:]
    elif ablate == "mmprobe":
        srcs, (out_ref, buf, bbuf, sems, wmm, accmm) = rest[:L], rest[L:]
    elif ablate == "flatprobe":
        srcs, (out_ref, buf, bbuf, sems, flat) = rest[:L], rest[L:]
    else:
        srcs, (out_ref, buf, bbuf, sems) = rest[:L], rest[L:]
    # Scalar-prefetch refs are FLAT 1-D (index [j*k + p]): 2-D SMEM arrays
    # pad every row to 512 B, which blows the 1 MB SMEM budget at useful
    # chunk sizes; flat arrays pack tight.
    #
    # Each grid step handles G ROIs (sub-buffers buf[slot, g]); one ROI per
    # step leaves ~0.5 us of fixed per-step cost dominating at 32k ROIs.
    # Every ROI keeps its own DMA semaphore (slot, g) so the combine of ROI
    # g overlaps the still-in-flight copies of g+1.. and the next step.

    def blk_copy(src, j, slot, g):
        """Block path: the whole ROI in ONE (BR, BW, C) copy."""
        return pltpu.make_async_copy(
            src.at[meta_ref[j * 5], pl.ds(meta_ref[j * 5 + 4], BR),
                   pl.ds(meta_ref[j * 5 + 2] * 8, BW), :],
            bbuf.at[slot, g], sems.at[slot, g])

    def strip_copy(src, j, slot, g, p):
        """Strip path: one (2, FAST_W, C) strip for output row p."""
        return pltpu.make_async_copy(
            src.at[meta_ref[j * 5], pl.ds(rs_ref[j * P + p], 2),
                   pl.ds(meta_ref[j * 5 + 2] * 8, FAST_W), :],
            buf.at[slot, g, p, :, pl.ds(0, FAST_W), :], sems.at[slot, g])

    def col_copy(src, j, slot, g, p, q):
        """Slow path: one aligned (2, 16, C) block into 16-cell slot 16q."""
        return pltpu.make_async_copy(
            src.at[meta_ref[j * 5], pl.ds(rs_ref[j * P + p], 2),
                   pl.ds(ca8_ref[j * P + q] * 8, 16), :],
            buf.at[slot, g, p, :, pl.ds(16 * q, 16), :], sems.at[slot, g])

    def issue(i_, slot):
        def one(g):
            j = i_ * G + g
            path = meta_ref[j * 5 + 1]
            lvl = meta_ref[j * 5 + 3]
            # Static unroll over pyramid levels: DMA descriptors need a
            # static source ref, so each (level, path) pair gets its own
            # predicated issue region (scalar-core compares only; the DMA
            # count per ROI is unchanged).
            for li, src in enumerate(srcs):
                # Static guard: levels shorter than BR can never take the
                # block path (prep enforces it with the same H), and
                # tracing their BR-row slice would be a shape error.
                if BR and src.shape[1] >= BR:
                    @pl.when((lvl == li) & (path == 0))
                    def _(src=src):
                        blk_copy(src, j, slot, g).start()

                @pl.when((lvl == li) & (path == 1))
                def _(src=src):
                    def body(p, c):
                        strip_copy(src, j, slot, g, p).start()
                        return c
                    jax.lax.fori_loop(0, P, body, 0)

                @pl.when((lvl == li) & (path == 2))
                def _(src=src):
                    def body(k, c):
                        col_copy(src, j, slot, g, k // P, k % P).start()
                        return c
                    jax.lax.fori_loop(0, P * P, body, 0)
        for g in range(G):
            one(g)

    def wait(j, slot, g):
        # ONE wait per ROI: every copy for this ROI signals sems[slot, g],
        # and a DMA wait only consumes (semaphore, byte count) — so wait on
        # a STATIC descriptor whose slice has the same total bytes as the
        # whole ROI's transfer set. Block path moves (BR, BW, C); strip
        # path P*(2, FAST_W, C); slow path P*P*(2, 16, C) ==
        # P*(2, 16*P, C). This halves+ the descriptor-rate bound (dynamic
        # address math runs once, at start).
        path = meta_ref[j * 5 + 1]

        if BR:
            @pl.when(path == 0)
            def _():
                ref = bbuf.at[slot, g]
                pltpu.make_async_copy(ref, ref, sems.at[slot, g]).wait()

        @pl.when(path == 1)
        def _():
            ref = buf.at[slot, g, :, :, pl.ds(0, FAST_W), :]
            pltpu.make_async_copy(ref, ref, sems.at[slot, g]).wait()

        @pl.when(path == 2)
        def _():
            ref = buf.at[slot, g, :, :, pl.ds(0, 16 * P), :]
            pltpu.make_async_copy(ref, ref, sems.at[slot, g]).wait()

    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

    @pl.when(i == 0)
    def _():
        # One-time scratch zero: the weight matmul zero-weights every window
        # cell a DMA didn't fill, which is only NaN/Inf-safe if those cells
        # hold real values. After step 0 stale cells hold prior-ROI data.
        buf[...] = jnp.zeros_like(buf)
        bbuf[...] = jnp.zeros_like(bbuf)
        if mhead:
            # Margins + per-ROI y/x pad cells must start zero (they ARE the
            # SAME-conv padding); conv masks keep them zero thereafter.
            act_a[...] = jnp.zeros_like(act_a)
            act_b[...] = jnp.zeros_like(act_b)
        if ablate != "nodma":
            issue(0, 0)

    if ablate != "nodma":
        @pl.when(i + 1 < n)
        def _():
            issue(i + 1, 1 - slot)

    # Bilinear combine per output row p (static unroll): blend the two
    # y-corner rows with scalar slot weights (VPU), contract the window
    # axis against this ROI's x-weight matrix (MXU). Each path blends and
    # contracts only the prefix its DMAs filled; the block path reads its
    # two rows at a dynamic (untiled-dim) offset into the block buffer.
    def combine(j, g, p, width, y0, y1):
        s = (y0.astype(jnp.float32) * wy0_ref[j * P + p]
             + y1.astype(jnp.float32) * wy1_ref[j * P + p])
        res = jnp.dot(wxm_ref[g, :, :width], s.astype(buf.dtype),
                      preferred_element_type=jnp.float32)  # (qpad, C)
        out_ref[g, p, :, :] = res[:P].astype(out_ref.dtype)
        if mhead:
            # Stack the pooled row into the conv activation buffer: row
            # (g, y=p), sublanes x (res rows qpad..: wxm zero-pads past P,
            # so x >= P cells land zero — the SAME-conv padding), 1-row
            # top margin. y rows P..15 stay zero (init + conv masks).
            act_a[1 + g * 16 + p, :, :] = res.astype(act_a.dtype)

    def combine_block(j, g, p):
        ry = rs_ref[j * P + p] - meta_ref[j * 5 + 4]
        combine(j, g, p, BW, bbuf[slot, g, ry, :, :],
                bbuf[slot, g, ry + 1, :, :])

    def combine_strip(j, g, p, width):
        combine(j, g, p, width, buf[slot, g, p, 0, :width, :],
                buf[slot, g, p, 1, :width, :])

    if ablate == "nocompute":
        if ablate != "nodma":
            for g in range(G):
                wait(i * G + g, slot, g)
        out_ref[0, 0, 0, :] = (buf[slot, 0, 0, 0, 0, :]
                               + wxm_ref[0, 0, :1]).astype(out_ref.dtype)
        return

    for g in range(G):
        j = i * G + g
        if ablate != "nodma":
            wait(j, slot, g)

        if BR:
            @pl.when(meta_ref[j * 5 + 1] == 0)
            def _():
                for p in range(P):
                    combine_block(j, g, p)

        if window == FAST_W:
            @pl.when(meta_ref[j * 5 + 1] != 0)
            def _():
                for p in range(P):
                    combine_strip(j, g, p, FAST_W)
        else:
            @pl.when(meta_ref[j * 5 + 1] == 1)
            def _():
                for p in range(P):
                    combine_strip(j, g, p, FAST_W)

            @pl.when(meta_ref[j * 5 + 1] == 2)
            def _():
                for p in range(P):
                    combine_strip(j, g, p, window)

    if head:
        # Fused classifier head (models/heads.py semantics, BN folded by
        # `pack_classifier_head`). Each step stacks its G pooled ROIs as
        # flat (1, P*P*C) rows into the burst buffer; every MM_S steps the
        # whole (MM_S*G, P*P*C) burst runs the three-matmul head on the MXU
        # while the next steps' strip DMAs are already in flight — the
        # compute hides under the kernel's DMA-segment-rate floor
        # (docs/PERF.md). head_ref's block index is i // MM_S, so the
        # output block stays resident across the burst and flushes once.
        #
        # The G rows are stacked in registers and stored as ONE G-row block
        # at offset rem(i, MM_S) * G: Mosaic requires a dynamic dim-0 store
        # offset provably sublane-aligned (multiple of 8), which the *G
        # (G = 8 at pool 7) form is and a per-row `+ g` offset is not.
        vs = jnp.concatenate(
            [out_ref[g, :, :, :].reshape(1, P * P * out_ref.shape[-1])
             for g in range(G)], axis=0)
        acc[pl.ds(jax.lax.rem(i, MM_S) * G, G), :] = vs

        @pl.when((jax.lax.rem(i, MM_S) == MM_S - 1)
                 | (i == pl.num_programs(0) - 1))
        def _():
            h = jnp.dot(acc[...], w1[...],
                        preferred_element_type=jnp.float32)
            h = jnp.maximum(h + b1[...], 0.0).astype(acc.dtype)
            h = jnp.dot(h, w2[...], preferred_element_type=jnp.float32)
            h = jnp.maximum(h + b2[...], 0.0).astype(acc.dtype)
            o = jnp.dot(h, w3[...], preferred_element_type=jnp.float32)
            head_ref[...] = o + b3[...]

    if mhead:
        # Fused mask head (models/heads.py::apply_mask_head semantics, BN
        # folded by `pack_mask_head`), bottleneck_pallas pattern: each 3x3
        # conv is ONE im2col matmul (K = 9C fills the MXU contraction);
        # row taps are free dim-0 slices (1-row margins + per-ROI 16-row
        # blocks keep neighbors' rows zero), column taps are whole-buffer
        # sublane rolls whose wrap-around brings in the zero pad columns.
        ro = G * 16
        cch = act_a.shape[-1]
        col_ok = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1) < P
        row_ok = (jax.lax.broadcasted_iota(jnp.int32, (ro, 1, 1), 0)
                  % 16) < P
        okm = row_ok & col_ok  # (ro, 16, 1)

        bufs = (act_a, act_b)
        for k in range(4):
            t = bufs[k % 2][...]                     # (ro + 2, 16, C)
            tf = t.astype(jnp.float32)
            taps = (pltpu.roll(tf, 1, axis=1).astype(t.dtype), t,
                    pltpu.roll(tf, 15, axis=1).astype(t.dtype))
            patches = jnp.concatenate(
                [taps[dx][dy:dy + ro]
                 for dy in range(3) for dx in range(3)], axis=2)
            y = jnp.dot(patches.reshape(ro * 16, 9 * cch), wconv[k],
                        preferred_element_type=jnp.float32)
            y = jnp.maximum(y + bconv[k:k + 1, :], 0.0).reshape(ro, 16, cch)
            # Re-zero pad cells (they picked up relu(bias)); margins are
            # never written and stay zero from the init.
            y = jnp.where(okm, y, 0.0)
            bufs[1 - k % 2][1:1 + ro] = y.astype(t.dtype)

        # 2x2/2 deconv as one (C, 4C) matmul (lane group ab = a*2+b), then
        # the per-detection class select as a weighted lane reduction —
        # `TimeDistributedMaskLayer.swift:71-75` semantics without ever
        # materializing the (M, 2P, 2P, num_classes) tensor.
        flat = bufs[0][1:1 + ro].reshape(ro * 16, cch)
        z = jnp.dot(flat, wdec[...], preferred_element_type=jnp.float32)
        z = jnp.maximum(z + bdec[...], 0.0)          # (ro*16, 4C)
        for g in range(G):
            zg = z[g * 256:(g + 1) * 256, :]
            wg = wcls[0, g:g + 1, :].astype(jnp.float32)  # (1, 4C)
            prod = zg * wg
            cols = [jnp.sum(prod[:, ab * cch:(ab + 1) * cch], axis=1,
                            keepdims=True) for ab in range(4)]
            # Scalar bias splat: a (1, 1) vector + (256, 4) add lowers to a
            # both-axes broadcast Mosaic doesn't implement; a rank-0 scalar
            # splats fine.
            logits = jnp.concatenate(cols, axis=1) + bcls[0, g, 0]
            mask_ref[g, :, :] = jax.nn.sigmoid(logits)

    if ablate == "mmprobe":
        # Throwaway experiment: does a classifier-head-sized matmul burst
        # hide under the DMA waits? Every MM_S steps do
        # (MM_S*G, P*P*C) @ (P*P*C, 1024) on garbage scratch and fold the
        # result into the output (to defeat DCE). Timing-only; output is
        # numerically meaningless in this mode.
        @pl.when(jax.lax.rem(i, MM_S) == MM_S - 1)
        def _():
            z = jnp.dot(accmm[...], wmm[...],
                        preferred_element_type=jnp.float32)
            out_ref[0, 0, 0, :] = (
                out_ref[0, 0, 0, :]
                + jnp.sum(z, axis=0)[:out_ref.shape[-1]].astype(
                    out_ref.dtype))

    if ablate == "flatprobe":
        # Throwaway experiment: cost of the per-ROI pooled flatten a fused
        # classifier head would need — (P, P, C) sublane-major -> one
        # (1, P*P*C) lane-major row (a Mosaic relayout). Timing-only.
        c_out = out_ref.shape[-1]
        for g in range(G):
            v = out_ref[g, :, :, :].astype(jnp.float32).reshape(
                1, P * P * c_out)
            flat[0, :] += v[0, :]
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[0, 0, 0, :] = (out_ref[0, 0, 0, :]
                                   + flat[0, :c_out].astype(out_ref.dtype))


@functools.partial(
    jax.jit, static_argnames=("crop_size", "image_shape", "canonical_scale",
                              "chunk", "interpret", "ablate", "group",
                              "block"))
def pyramid_roi_align_pallas(
    features,
    rois: jnp.ndarray,
    crop_size: int,
    image_shape: tuple[int, int],
    canonical_scale: float = 224.0,
    chunk: int = 2048,
    interpret: bool = False,
    ablate: str = "",
    group: int | None = None,
    block: tuple[int, int] | None = None,
    head_params=None,
    mask_params=None,
    class_ids=None,
):
    """Batched pyramid ROIAlign: (B, N, crop, crop, C) pooled features.

    Args:
      features: P2..P5 as a list of (B, H_l, W_l, C) arrays (finest
        first), true (unpadded) widths. Narrow levels are x-padded here;
        under one jit the pool-7 and pool-14 calls CSE to a single pad.
      rois: (B, N, 4) normalized y1x1y2x2; zero rows -> zero output.
      head_params: optional `pack_classifier_head` dict — fuses the
        classifier head into the kernel (compute rides the DMA shadow) and
        returns (pooled, head_out (B*N, HEAD_OUT) f32 packed rows; decode
        with `unpack_classifier_head`).
      mask_params + class_ids: optional `pack_mask_head` dict and (B, N)
        int32 detected classes — fuses the ENTIRE mask head (4x conv3x3 +
        BN + relu, 2x2/2 deconv, per-class select, sigmoid) into the
        kernel; returns (pooled, mask_out (B*N, 256, 4) f32 parity-grouped
        rows; decode with `unpack_masks`). Requires crop_size 14 (the
        16-cell padded grid doubles as SAME-conv padding).
    """
    level_hw = [(f.shape[1], f.shape[2]) for f in features]
    srcs = [_pad_level(f) for f in features]
    bsz = srcs[0].shape[0]
    n = rois.shape[1]
    c = srcs[0].shape[-1]
    dtype = srcs[0].dtype
    window = max(FAST_W, 16 * crop_size)
    block_r, block_w = block if block is not None else _block_dims(crop_size)

    m = bsz * n
    img_idx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)
    meta, rs, ca8, wy0, wy1, wxm = _prepare(
        rois.reshape(m, 4), img_idx, level_hw,
        [s.shape[2] for s in srcs], image_shape,
        canonical_scale, crop_size, window, dtype, block_r, block_w)
    qpad = wxm.shape[1]

    # ROIs per grid step: amortizes the fixed per-step cost (measured ~14 ms
    # over 32k single-ROI steps at batch 32) while keeping the double
    # buffer inside the VMEM budget at the pool-14 window size.
    G = group if group is not None else (8 if crop_size <= 7 else 4)

    if head_params is not None:
        assert not ablate, "head fusion and ablate modes are exclusive"
        assert mask_params is None
        head_ops = [head_params[k] for k in ("w1", "b1", "w2", "b2",
                                             "w3", "b3")]
        # The burst-buffer store writes G rows at offset rem(i, MM_S) * G;
        # Mosaic requires that dynamic dim-0 offset provably %8 == 0.
        assert G % 8 == 0, f"head fusion needs G % 8 == 0, got {G}"
        assert head_ops[0].shape[0] == crop_size * crop_size * c, (
            head_ops[0].shape, crop_size, c)
    else:
        head_ops = []

    if mask_params is not None:
        assert not ablate and class_ids is not None
        assert round_up(crop_size, 8) == 16, crop_size
        mask_res = [mask_params[k] for k in ("wconv", "bconv", "wdec",
                                             "bdec")]
        assert mask_res[0].shape == (4, 9 * c, c), mask_res[0].shape
        wsel = jnp.take(mask_params["kcls"], class_ids.reshape(m), axis=0)
        wcls4 = jnp.tile(wsel, (1, 4)).astype(dtype)          # (M, 4C)
        bsel = jnp.take(mask_params["bcls"],
                        class_ids.reshape(m))[:, None]        # (M, 1)
    else:
        mask_res = []

    chunk = min(chunk, round_up(m, G * 8))
    pad = (-m) % chunk
    if pad:
        zi = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        meta, rs, ca8, wy0, wy1, wxm = map(
            zi, (meta, rs, ca8, wy0, wy1, wxm))
        if mask_res:
            wcls4, bsel = zi(wcls4), zi(bsel)
    mc = m + pad
    nc = mc // chunk
    # Flatten the scalar operands (see _kernel note on SMEM row padding).
    meta, rs, ca8, wy0, wy1 = (
        a.reshape(nc, -1) if nc > 1 else a.reshape(-1)
        for a in (meta, rs, ca8, wy0, wy1))

    steps = chunk // G
    head_rows = round_up(steps, MM_S) * G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(steps,),
        in_specs=[pl.BlockSpec((G, qpad, window), lambda i, *_: (i, 0, 0))]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(srcs)
        + [pl.BlockSpec(h.shape, lambda i, *_: (0, 0)) for h in head_ops]
        + [pl.BlockSpec(h.shape, lambda i, *_, nd=h.ndim: (0,) * nd)
           for h in mask_res]
        + ([pl.BlockSpec((1, G, 4 * c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, 1), lambda i, *_: (i, 0, 0))]
           if mask_res else []),
        out_specs=[pl.BlockSpec((G, crop_size, crop_size, c),
                                lambda i, *_: (i, 0, 0, 0))]
        + ([pl.BlockSpec((MM_S * G, HEAD_OUT),
                         lambda i, *_: (i // MM_S, 0))] if head_ops else [])
        + ([pl.BlockSpec((G, 256, 4), lambda i, *_: (i, 0, 0))]
           if mask_res else []),
        scratch_shapes=[
            pltpu.VMEM((2, G, crop_size, 2, window, c), dtype),
            pltpu.VMEM((2, G, max(block_r, 2), max(block_w, 8), c), dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ] + ([pltpu.VMEM((MM_S * G, crop_size * crop_size * c), dtype)]
             if head_ops else [])
        + ([pltpu.VMEM((G * 16 + 2, 16, c), dtype)] * 2 if mask_res else [])
        + ([pltpu.VMEM((crop_size * crop_size * c, 1024), dtype),
            pltpu.VMEM((MM_S * G, crop_size * crop_size * c), dtype)]
           if ablate == "mmprobe" else [])
        + ([pltpu.VMEM((1, crop_size * crop_size * c), jnp.float32)]
           if ablate == "flatprobe" else []),
    )
    call = pl.pallas_call(
        functools.partial(_kernel, P=crop_size, window=window,
                          L=len(srcs), BR=block_r, BW=block_w,
                          G=G, ablate=ablate, head=bool(head_ops),
                          mhead=bool(mask_res)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((chunk, crop_size, crop_size, c),
                                        dtype)]
        + ([jax.ShapeDtypeStruct((head_rows, HEAD_OUT), jnp.float32)]
           if head_ops else [])
        + ([jax.ShapeDtypeStruct((chunk, 256, 4), jnp.float32)]
           if mask_res else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )

    def run_chunk(sl):
        # Per-ROI class weights ride in G-row step blocks; Mosaic's block
        # rule wants the last two dims full or (8, 128)-divisible, so they
        # are shipped (steps, G, ·) with a (1, G, ·) block — G = 4 at pool
        # 14 is not a legal 2-D block height.
        extra = ([sl["wcls"].reshape(steps, G, 4 * c),
                  sl["bcls"].reshape(steps, G, 1)] if mask_res else [])
        outs = call(sl["meta"], sl["rs"], sl["ca8"], sl["wy0"], sl["wy1"],
                    sl["wxm"], *srcs, *head_ops, *mask_res, *extra)
        if head_ops:
            # Burst rows are ROI-ordered; rows past `chunk` are rounding pad.
            return outs[0], outs[1][:chunk]
        return (outs[0], outs[1]) if mask_res else outs[0]

    xs = {"meta": meta, "rs": rs, "ca8": ca8, "wy0": wy0, "wy1": wy1,
          "wxm": wxm}
    if mask_res:
        xs["wcls"], xs["bcls"] = wcls4, bsel
    if nc == 1:
        out = run_chunk(xs)
    else:
        for k in set(xs) - {"meta", "rs", "ca8", "wy0", "wy1"}:
            xs[k] = xs[k].reshape((nc, chunk) + xs[k].shape[1:])
        _, out = jax.lax.scan(
            lambda carry, sl: (carry, run_chunk(sl)), 0, xs)
        out = jax.tree_util.tree_map(
            lambda a: a.reshape((mc,) + a.shape[2:]), out)
    if head_ops or mask_res:
        pooled, extra_out = out
        return (pooled[:m].reshape(bsz, n, crop_size, crop_size, c),
                extra_out[:m])
    return out[:m].reshape(bsz, n, crop_size, crop_size, c)
