"""Fused ResNet bottleneck *chains* as one Pallas TPU kernel per stage.

Why: res2 of R101 @ 1024^2 batch 32 measures 26 ms against a ~5 ms MXU
floor — every conv in the stage round-trips its (B, 256, 256, 256) bf16
activations (1.07 GB each) through HBM, and XLA cannot fuse convolutions
into each other. res4/res5 measure at 90-97% MXU efficiency (deep channels,
small spatial), so only the shallow wide stages are worth hand-fusing.

This kernel runs an entire chain of stride-1 bottleneck blocks
(1x1 -> 3x3 -> 1x1 + residual, Matterport `_bottleneck` semantics,
`models/resnet.py`) over a row tile of the image, keeping every
intermediate in VMEM: the input tile is read once and only the final
block's output is written. Inference BN folds into weights/bias. The 3x3
conv is nine shifted matmuls: row shifts are free slices on the untiled
row axis; column shifts are sublane rolls, exact because both x-pad
columns of the buffer are zero (a roll wraps zeros in). Row tiles carry a
halo of one row per block side; halo recompute at tile_rows=32 with a
3-block chain is 1.19x — far cheaper than the HBM round trips it removes.

SAME-padding semantics at image borders are preserved by masking each 3x3
conv's *input* to zero outside the true image (the halo rows loaded from
the zero-padded input would otherwise hold relu(bias) after the 1x1).

Only used for inference (frozen BN) on TPU; training and other backends
take the XLA path in `models/resnet.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_XPAD = 8  # column padding: 1 zero col left, 7 right (sublane-tile aligned)


def fold_bottleneck_chain(params, stage: int, letters: str, eps: float = 1e-3):
    """Fold conv+BN of blocks `letters` of `stage` into matmul weights.

    Returns a flat list of (name, array) pairs per block:
    w1 (Cin, M) / b1 (1, M) / w2 (9, M, M) [tap dy*3+dx] / b2 / w3 (M, Cout)
    / b3, plus ws (Cin, Cout) / bs for a projection block.
    """

    def fold(conv, bn):
        k = jnp.asarray(conv["kernel"], jnp.float32)
        b = jnp.asarray(conv["bias"], jnp.float32)
        scale = jnp.asarray(bn["gamma"], jnp.float32) * jax.lax.rsqrt(
            jnp.asarray(bn["moving_variance"], jnp.float32) + eps)
        shift = (jnp.asarray(bn["beta"], jnp.float32)
                 - jnp.asarray(bn["moving_mean"], jnp.float32) * scale)
        return (k * scale).astype(jnp.bfloat16), (b * scale + shift)[None, :]

    blocks = []
    for letter in letters:
        base = f"res{stage}{letter}_branch"
        bnb = f"bn{stage}{letter}_branch"
        w1, b1 = fold(params[base + "2a"], params[bnb + "2a"])
        w2, b2 = fold(params[base + "2b"], params[bnb + "2b"])
        w3, b3 = fold(params[base + "2c"], params[bnb + "2c"])
        blk = {
            "w1": w1.reshape(w1.shape[2], w1.shape[3]),
            "b1": b1,
            "w2": w2.reshape(9, w2.shape[2], w2.shape[3]),
            "b2": b2,
            "w3": w3.reshape(w3.shape[2], w3.shape[3]),
            "b3": b3,
        }
        if base + "1" in params:
            ws, bs = fold(params[base + "1"], params[bnb + "1"])
            blk["ws"] = ws.reshape(ws.shape[2], ws.shape[3])
            blk["bs"] = bs
        blocks.append(blk)
    return blocks


def _chain_kernel(*refs, n_blocks: int, has_proj: tuple, tr: int, w: int,
                  h: int, cin: int):
    nw = [8 if p else 6 for p in has_proj]  # weight refs per block
    widx = []
    off = 0
    for k in range(n_blocks):
        widx.append(refs[off:off + nw[k]])
        off += nw[k]
    src = refs[off]
    out_ref = refs[off + 1]
    in_buf = refs[off + 2]
    sems = refs[off + 3]

    n = n_blocks
    rl = tr + 2 * n
    wp = w + _XPAD

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_b = pl.num_programs(0)

    def dma(slot, b_, t_):
        return pltpu.make_async_copy(
            src.at[b_, pl.ds(t_ * tr, rl)], in_buf.at[slot], sems.at[slot])

    g = bi * n_t + ti
    slot = g % 2

    @pl.when(g == 0)
    def _():
        dma(slot, bi, ti).start()

    nxt_ok = jnp.logical_or(ti + 1 < n_t, bi + 1 < n_b)
    nb = jnp.where(ti + 1 < n_t, bi, bi + 1)
    nt = jnp.where(ti + 1 < n_t, ti + 1, 0)

    @pl.when(nxt_ok)
    def _():
        dma((slot + 1) % 2, nb, nt).start()

    dma(slot, bi, ti).wait()

    col_ok = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    col_ok = (col_ok >= 1) & (col_ok < w + 1)

    def mask3(x3, gbase):
        """Zero rows outside the image and the x-pad columns (SAME conv
        semantics at borders; halo rows otherwise hold relu(bias))."""
        r = x3.shape[0]
        rg = gbase + jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
        ok = (rg >= 0) & (rg < h) & col_ok
        return jnp.where(ok, x3, jnp.zeros((), x3.dtype))

    def mm(x3, wref, bref):
        """(r, wp, C) @ (C, D) + b -> (r, wp, D) f32 (flatten is free: wp
        is a sublane-tile multiple)."""
        r = x3.shape[0]
        flat = x3.reshape(r * wp, x3.shape[2])
        y = jnp.dot(flat, wref[:], preferred_element_type=jnp.float32)
        return (y + bref[0][None, :]).reshape(r, wp, -1)

    cur = in_buf[slot][:, :, :cin]  # (rl, wp, cin) bf16
    for k in range(n):
        wrefs = widx[k]
        w1, b1, w2, b2, w3, b3 = wrefs[:6]
        rows = rl - 2 * k
        gbase = ti * tr - n + k  # image row of buffer row 0

        t1f = mask3(jnp.maximum(mm(cur, w1, b1), 0.0), gbase)
        # Column taps as whole-buffer rolls done ONCE in f32 (Mosaic has no
        # bf16 rotate): both x-pad columns are zero, so the wrap-around
        # brings in exactly the SAME-conv zero padding.
        taps = (pltpu.roll(t1f, 1, axis=1).astype(jnp.bfloat16),
                t1f.astype(jnp.bfloat16),
                pltpu.roll(t1f, wp - 1, axis=1).astype(jnp.bfloat16))

        ro = rows - 2
        # One im2col matmul instead of nine: K = 9*M fills the MXU's
        # contraction depth (nine K=64 matmuls each pad K and N to 128;
        # concatenated, the same MACs run in ceil(9M/128) K-passes).
        mch = t1f.shape[2]
        patches = jnp.concatenate(
            [taps[dx][dy:dy + ro] for dy in range(3) for dx in range(3)],
            axis=2)  # (ro, wp, 9M)
        w2cat = w2[:].reshape(9 * mch, mch)
        acc = jnp.dot(patches.reshape(ro * wp, 9 * mch),
                      w2cat, preferred_element_type=jnp.float32)
        t2 = jnp.maximum(acc + b2[0][None, :], 0.0)
        t2 = t2.reshape(ro, wp, -1).astype(jnp.bfloat16)

        t3 = mm(t2, w3, b3)  # (ro, wp, Cout) f32
        short = cur[1:1 + ro]
        if has_proj[k]:
            short = mm(short, wrefs[6], wrefs[7])
        else:
            short = short.astype(jnp.float32)
        out = jnp.maximum(t3 + short, 0.0)
        cur = mask3(out, gbase + 1).astype(jnp.bfloat16)

    out_ref[0] = cur[:tr, 1:w + 1, :]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_bottleneck_chain(x, blocks, tile_rows: int = 32,
                           interpret: bool = False):
    """Run stride-1 bottleneck blocks fused. x: (B, H, W, Cin) -> Cout.

    `blocks`: list from `fold_bottleneck_chain` (block 0 may carry a
    projection shortcut; all strides 1).
    """
    b, hh, ww, cin = x.shape
    n = len(blocks)
    # Largest row-tile <= tile_rows that divides H (legal /32 image sizes
    # can give H = 208 etc. where the preferred tile doesn't divide).
    tr = min(tile_rows, hh)
    while hh % tr:
        tr -= 1
    cout = blocks[-1]["w3"].shape[-1]
    has_proj = tuple("ws" in blk for blk in blocks)

    # DMA slices must cover whole 128-lane tiles; the HBM memref is
    # lane-padded to 128 regardless, so padding narrow channel counts adds
    # no real traffic. The kernel computes on lanes [:cin].
    cdma = max(cin, 128) if cin < 128 else cin
    xpad = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (n, n), (1, _XPAD - 1),
                                            (0, cdma - cin)))
    wp = ww + _XPAD

    keys = ("w1", "b1", "w2", "b2", "w3", "b3", "ws", "bs")
    flat_w = [blk[k] for blk in blocks for k in keys if k in blk]

    grid = (b, hh // tr)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, n_blocks=n, has_proj=has_proj,
                          tr=tr, w=ww, h=hh, cin=cin),
        # (kernel reads lanes [:cin] of the DMA buffer)
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat_w)
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tr, ww, cout),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * n, wp, cdma), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*flat_w, xpad)
    return out


def chain_supported(x_shape, dtype, bn_ctx) -> bool:
    """Inference-mode bf16 on TPU (any height: the row tile adapts)."""
    import os
    if os.environ.get("MRT_NO_CHAIN_KERNEL"):
        return False
    if bn_ctx is not None or dtype != jnp.bfloat16:
        return False
    return x_shape[1] >= 8 and jax.default_backend() == "tpu"
