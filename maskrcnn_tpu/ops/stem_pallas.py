"""Fused ResNet stem as one Pallas TPU kernel: conv1 + BN + ReLU + maxpool.

The reference runs its stem inside the Core ML conv graph (the converted
Keras `conv1`/`bn_conv1` layers of the external Mask-RCNN-Keras package —
SURVEY.md §1 L2); on TPU the XLA version costs ~18 ms at batch 32 because
the 7x7 conv on 3-channel input wastes MXU lanes and the BN/ReLU epilogue
plus the 3x3/2 maxpool each make a separate full pass over the 1.07 GB
(B, 512, 512, 64) conv output (TPU convolutions cannot output-fuse
elementwise consumers). This kernel removes all of that:

  * the (B, 1024, 1024, 3) input is packed space-to-depth 4x4 into
    (B, H/4, W/4, 48) — 48 of 128 VPU lanes instead of 3;
  * the 7x7 stride-2 conv becomes an equivalent 3x3 stride-1 conv over the
    packed grid producing PACKED outputs: channel (pr, ps, o) of packed cell
    (R, S) is conv output channel o at spatial (2R+pr, 2S+ps), i.e. a
    (3, 3, 48, 256) kernel whose entries are a re-indexing of the original
    (7, 7, 3, 64) weights (zero where the tap falls outside the 7x7 window);
  * BatchNorm (inference stats) folds into the conv weights and bias;
  * ReLU and the 3x3 stride-2 SAME maxpool run in VMEM on the conv tile —
    in packed layout the pool is an elementwise max over nine 64-channel
    slices, no strided access;
  * output is the (B, H/4, W/4, 64) pooled C1 feature map; the 512-grid
    conv activation never exists in HBM.

Padding note: conv1 in the Matterport graph is ZeroPadding2D(3) + 7x7/2
VALID (`models/resnet.py`), and the maxpool is SAME (pad_right=1, windows
clipped at the edge). Zero input padding + zeroing the conv rows/cols past
the true grid reproduces the clipped pool exactly: post-ReLU values are
>= 0, so a zero tap can never exceed the true window max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 8  # output rows per grid step


def fold_stem_weights(conv1: dict, bn: dict, eps: float = 1e-3):
    """(7,7,3,64) conv1 + inference BN -> packed (9*48, 256) kernel + (256,) bias.

    Channel layouts:
      packed input  ic = (u*3 + v)*48 + pi*12 + pj*3 + c   (tap-major)
      packed output oc = pr*128 + ps*64 + o
    """
    k = jnp.asarray(conv1["kernel"], jnp.float32)  # (7,7,3,64)
    b = jnp.asarray(conv1["bias"], jnp.float32)
    scale = jnp.asarray(bn["gamma"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn["moving_variance"], jnp.float32) + eps)
    shift = jnp.asarray(bn["beta"], jnp.float32) - jnp.asarray(
        bn["moving_mean"], jnp.float32) * scale
    ks = (k * scale).reshape(147, 64)  # fold BN scale; (dy*21 + dx*3 + c, o)
    bias = b * scale + shift  # (64,)

    src, ok = _packed_index_table()  # static (432, 2, 2) maps + mask
    kp = jnp.where(jnp.asarray(ok)[..., None],
                   ks[jnp.asarray(src)], 0.0)  # (432, 2, 2, 64)
    kp = kp.reshape(432, 256)  # oc = pr*128 + ps*64 + o (row-major flatten)
    bias_t = jnp.tile(bias, 4).reshape(1, 256)
    return kp.astype(jnp.bfloat16), bias_t.astype(jnp.float32)


@functools.lru_cache(maxsize=1)
def _packed_index_table():
    """Static re-indexing (7,7,3,64)->(3,3,48,256): for packed-kernel row
    ic = (u*3+v)*48 + pi*12 + pj*3 + c and output parity (pr, ps), the flat
    source row dy*21 + dx*3 + c of the original kernel, with dy = 4(u-1) +
    pi + 3 - 2pr and dx likewise; ok=False where the tap falls outside 7x7."""
    src = np.zeros((432, 2, 2), np.int32)
    ok = np.zeros((432, 2, 2), bool)
    for u in range(3):
        for v in range(3):
            for pi in range(4):
                for pj in range(4):
                    for c in range(3):
                        r = (u * 3 + v) * 48 + pi * 12 + pj * 3 + c
                        for pr in range(2):
                            dy = 4 * (u - 1) + pi + 3 - 2 * pr
                            for ps in range(2):
                                dx = 4 * (v - 1) + pj + 3 - 2 * ps
                                if 0 <= dy < 7 and 0 <= dx < 7:
                                    src[r, pr, ps] = dy * 21 + dx * 3 + c
                                    ok[r, pr, ps] = True
    return src, ok


def pack_stem_input(images: jnp.ndarray) -> jnp.ndarray:
    """Preprocessed (B, H, W, 3) f32 -> (B, H/4 + 4, W/4 + 8, 128) bf16.

    Space-to-depth 4x4 with channel layout pi*12 + pj*3 + c, zero-padded by
    (1 top, 3 bottom) rows and (1, 1) cols: packed row -1 covers original
    rows -4..-1 (the conv reads only -3..-1 of those, which the original
    ZeroPadding2D(3) also zero-fills), and rows past H/4 keep the DMA of the
    final row tile in bounds.
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.bfloat16).reshape(b, h // 4, 4, w // 4, 4, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 48)
    # Mosaic DMA slices need the sliced dims tile-aligned: cols to the
    # 8-sublane tiling (stem_supported guarantees cols % 8 == 0, so (1, 7)
    # padding makes the width cols + 8) and channels to the full 128-lane
    # tile (the HBM memref is lane-padded to 128 regardless, so this adds
    # no real traffic). The kernel computes on lanes [:48] only.
    return jnp.pad(x, ((0, 0), (1, 3), (1, 7), (0, 80)))


def _stem_kernel(xp_hbm, kp_ref, bias_ref, out_ref, in_buf, sems, *,
                 rows: int, cols: int):
    """One grid step: _TR pooled output rows for one image.

    xp_hbm: (B, rows+4, cols+8, 128) bf16 in HBM/ANY (manually DMA'd);
      lanes 48: are zero padding.
    kp_ref: (432, 256) bf16 VMEM. bias_ref: (1, 256) f32 VMEM (pre-tiled).
    out_ref: (1, _TR, cols, 64) bf16 VMEM block.
    in_buf: (2, _TR+3, cols+8, 128) bf16 VMEM scratch (double buffer).
    """
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_b = pl.num_programs(0)

    def dma(slot, b_, t_):
        return pltpu.make_async_copy(
            xp_hbm.at[b_, pl.ds(t_ * _TR, _TR + 3)],
            in_buf.at[slot],
            sems.at[slot],
        )

    g = bi * n_t + ti  # global step — slot parity stays consistent across
    slot = g % 2       # image boundaries for any (odd or even) tile count

    @pl.when(g == 0)
    def _():  # very first step: fetch own tile (no one prefetched it)
        dma(slot, bi, ti).start()

    # prefetch the next tile (possibly of the next image)
    nxt_t = ti + 1
    has_next = jnp.logical_or(nxt_t < n_t, bi + 1 < n_b)
    nb = jnp.where(nxt_t < n_t, bi, bi + 1)
    nt = jnp.where(nxt_t < n_t, nxt_t, 0)

    @pl.when(has_next)
    def _():
        dma((slot + 1) % 2, nb, nt).start()

    dma(slot, bi, ti).wait()

    cr = _TR + 1  # conv rows computed (pool needs one extra row)
    x = in_buf[slot]  # (_TR+3, cols+8, 128)

    # im2col over the 3x3 packed taps -> ((_TR+1)*cols, 432)
    patches = jnp.concatenate(
        [x[u:u + cr, v:v + cols, :48].reshape(cr * cols, 48)
         for u in range(3) for v in range(3)], axis=1)

    ct = jnp.dot(patches, kp_ref[:],
                 preferred_element_type=jnp.float32)  # (cr*cols, 256)
    ct = ct + bias_ref[0, :][None, :]
    ct = jnp.maximum(ct, 0.0).reshape(cr, cols, 256)

    # Zero conv rows past the true packed grid (they see only pad input, so
    # they'd otherwise read relu(bias) and corrupt the last pool row).
    row_g = ti * _TR + jax.lax.broadcasted_iota(jnp.int32, (cr, 1, 1), 0)
    ct = jnp.where(row_g < rows, ct, 0.0)

    # Pool, packed layout: channel (pr, ps, o) holds conv(2R+pr, 2S+ps, o).
    p00 = ct[:, :, 0:64]      # (pr=0, ps=0)
    p01 = ct[:, :, 64:128]    # (pr=0, ps=1)
    p10 = ct[:, :, 128:192]   # (pr=1, ps=0)
    p11 = ct[:, :, 192:256]

    def shift_cols(a):  # col q+1 view, zero at the right edge
        return jnp.concatenate(
            [a[:, 1:, :], jnp.zeros((cr, 1, 64), a.dtype)], axis=1)

    m0 = jnp.maximum(jnp.maximum(p00, p01), shift_cols(p00))  # row 2R
    m1 = jnp.maximum(jnp.maximum(p10, p11), shift_cols(p10))  # row 2R+1
    # out row P = max(rows 2P, 2P+1, 2P+2) = max(m0[P], m1[P], m0[P+1])
    out = jnp.maximum(jnp.maximum(m0[:_TR], m1[:_TR]), m0[1:_TR + 1])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def stem_pallas(xp: jnp.ndarray, kp: jnp.ndarray,
                bias: jnp.ndarray) -> jnp.ndarray:
    """Packed (B, rows+4, cols+8, 48) bf16 -> pooled C1 (B, rows, cols, 64)."""
    b, rp, cp, _ = xp.shape
    rows, cols = rp - 4, cp - 8  # pack_stem_input pads rows (1,3), cols (1,7)
    assert rows % _TR == 0 and cols % 8 == 0, (rows, cols)
    grid = (b, rows // _TR)
    return pl.pallas_call(
        functools.partial(_stem_kernel, rows=rows, cols=cols),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TR, cols, 64), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, cols, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, _TR + 3, cp, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, kp, bias)


def stem_supported(images_shape, dtype, bn_ctx) -> bool:
    """Kernel applicability: inference-mode bf16 on a TPU backend, spatial
    dims divisible by 4*_TR (the 1024^2 reference shape and every /32-legal
    config shape satisfy this)."""
    import os
    if os.environ.get("MRT_NO_STEM_KERNEL"):
        return False
    if bn_ctx is not None or dtype != jnp.bfloat16:
        return False
    h, w = images_shape[1], images_shape[2]
    return (h % (4 * _TR) == 0 and w % (4 * _TR) == 0
            and jax.default_backend() == "tpu")


def apply_stem_pallas(params, images, eps: float = 1e-3):
    """conv1+bn+relu+maxpool via the fused kernel. `images` preprocessed f32."""
    kp, bias = fold_stem_weights(params["conv1"], params["bn_conv1"], eps)
    return stem_pallas(pack_stem_input(images), kp, bias)
