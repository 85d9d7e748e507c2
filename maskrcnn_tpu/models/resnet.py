"""ResNet-50/101 backbone (Matterport graph topology and layer names).

The reference never ships this graph in-repo — it lives in the external pip
package `edouardlp/Mask-RCNN-Keras` consumed by the conversion pipeline
(`Sources/maskrcnn/Python/Conversion/requirements.txt:4`, SURVEY.md intro).
The new framework owns it. Topology is the classic Matterport/caffe ResNet:

  conv1 7x7/2 (pad 3) -> bn_conv1 -> relu -> maxpool 3x3/2 SAME      = C1
  stage 2: conv_block [64,64,256]/1   + 2 identity blocks            = C2
  stage 3: conv_block [128,128,512]/2 + 3 identity blocks            = C3
  stage 4: conv_block [256,256,1024]/2 + {5 | 22} identity blocks    = C4
  stage 5: conv_block [512,512,2048]/2 + 2 identity blocks           = C5

Layer names follow the caffe/Keras convention the pretrained `weights.h5`
uses: `res{stage}{block}_branch{2a,2b,2c,1}` + `bn...` — block letters
'a','b','c',... ('b'..'w' for the 22 stage-4 blocks of ResNet-101).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maskrcnn_tpu.models import nn

_BLOCK_COUNTS = {"resnet50": 5, "resnet101": 22}


def _stage_blocks(architecture: str):
    """Yield (stage, block_letter, is_conv_block, filters, stride) specs."""
    n4 = _BLOCK_COUNTS[architecture]
    spec = [
        (2, [64, 64, 256], 1, 2),
        (3, [128, 128, 512], 2, 3),
        (4, [256, 256, 1024], 2, n4),
        (5, [512, 512, 2048], 2, 2),
    ]
    for stage, filters, stride, n_identity in spec:
        yield stage, "a", True, filters, stride
        for i in range(n_identity):
            yield stage, chr(ord("b") + i), False, filters, 1


def init_resnet(key, architecture: str = "resnet101") -> nn.Params:
    """Random init with sane activation magnitudes.

    Two departures from plain He init, both standard practice and both
    overwritten by pretrained weights:
      * conv1 kernel scaled by 1/128 — inputs are mean-subtracted but NOT
        std-normalized (the reference's preprocessing contract,
        `Conversion/task.py:73-75`), so raw activations are O(100); without
        this, 30+ residual blocks amplify to O(1e5) and downstream
        exp(box_delta) overflows;
      * zero-init gamma on each block's last BN ("zero-init residual"), so
        every block starts as identity — also the right init for training.
    """
    params: nn.Params = {}
    keys = iter(jax.random.split(key, 512))
    params["conv1"] = nn.conv_init(next(keys), 7, 7, 3, 64)
    params["conv1"]["kernel"] = params["conv1"]["kernel"] / 128.0
    params["bn_conv1"] = nn.bn_init(64)

    cin = 64
    for stage, block, is_conv, filters, _ in _stage_blocks(architecture):
        f1, f2, f3 = filters
        base = f"res{stage}{block}_branch"
        bnb = f"bn{stage}{block}_branch"
        params[base + "2a"] = nn.conv_init(next(keys), 1, 1, cin, f1)
        params[bnb + "2a"] = nn.bn_init(f1)
        params[base + "2b"] = nn.conv_init(next(keys), 3, 3, f1, f2)
        params[bnb + "2b"] = nn.bn_init(f2)
        params[base + "2c"] = nn.conv_init(next(keys), 1, 1, f2, f3)
        params[bnb + "2c"] = nn.bn_init(f3)
        params[bnb + "2c"]["gamma"] = jnp.zeros((f3,), jnp.float32)
        if is_conv:
            params[base + "1"] = nn.conv_init(next(keys), 1, 1, cin, f3)
            params[bnb + "1"] = nn.bn_init(f3)
        cin = f3
    return params


def _bottleneck(x, params, stage, block, is_conv, stride, dtype, bn_ctx):
    base = f"res{stage}{block}_branch"
    bnb = f"bn{stage}{block}_branch"

    y = nn.conv2d(x, params[base + "2a"], stride=stride, padding="VALID",
                  dtype=dtype)
    y = nn.relu(nn.bn_apply(y, params, bnb + "2a", bn_ctx))
    y = nn.conv2d(y, params[base + "2b"], padding="SAME", dtype=dtype)
    y = nn.relu(nn.bn_apply(y, params, bnb + "2b", bn_ctx))
    y = nn.conv2d(y, params[base + "2c"], padding="VALID", dtype=dtype)
    y = nn.bn_apply(y, params, bnb + "2c", bn_ctx)

    if is_conv:
        sc = nn.conv2d(x, params[base + "1"], stride=stride, padding="VALID",
                       dtype=dtype)
        sc = nn.bn_apply(sc, params, bnb + "1", bn_ctx)
    else:
        sc = x
    return nn.relu(y + sc)


def _stem_xla(params, images, dtype, bn_ctx=None):
    """Differentiable XLA stem: ZeroPadding2D(3) + 7x7/2 valid conv + BN +
    ReLU + 3x3/2 SAME maxpool (the Matterport conv1 sub-graph)."""
    x = images.astype(dtype)
    x = nn.conv2d(x, params["conv1"], stride=2,
                  padding=[(3, 3), (3, 3)], dtype=dtype)
    x = nn.relu(nn.bn_apply(x, params, "bn_conv1", bn_ctx))
    return nn.max_pool(x, 3, 2, padding="SAME")


# --- training-path Pallas kernels (VERDICT r03 missing #3) -----------------
# The fused stem / bottleneck-chain kernels are forward-only (no Pallas
# backward). For frozen-BN training — the Matterport fine-tuning recipe,
# where the kernels' folded-BN math is exact — custom_vjp runs the Pallas
# kernel in the FORWARD and rematerializes the equivalent XLA sub-graph in
# the BACKWARD (jax.vjp over `_stem_xla` / the `_bottleneck` chain). The
# cotangents are therefore identical to the plain XLA path's; the forward
# saves the measured kernel-vs-XLA gap (PERF.md: stem+res2/res3 ~18 ms at
# batch 8). Batch-BN from-scratch training still takes the pure XLA path:
# batch statistics can't fold into conv weights.

@jax.custom_vjp
def _stem_fused_diff(stem_params, images):
    from maskrcnn_tpu.ops import stem_pallas
    return stem_pallas.apply_stem_pallas(stem_params, images)


def _stem_fused_diff_fwd(stem_params, images):
    return _stem_fused_diff(stem_params, images), (stem_params, images)


def _stem_fused_diff_bwd(res, g):
    stem_params, images = res
    _, vjp = jax.vjp(
        lambda p, im: _stem_xla(p, im, jnp.bfloat16, None),
        stem_params, images)
    return vjp(g.astype(jnp.bfloat16))


_stem_fused_diff.defvjp(_stem_fused_diff_fwd, _stem_fused_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _chain_fused_diff(stage, letters, tile_rows, block_params, x):
    from maskrcnn_tpu.ops import bottleneck_pallas as bp
    return bp.fused_bottleneck_chain(
        x, bp.fold_bottleneck_chain(block_params, stage, letters),
        tile_rows=tile_rows)


def _chain_fused_diff_fwd(stage, letters, tile_rows, block_params, x):
    return (_chain_fused_diff(stage, letters, tile_rows, block_params, x),
            (block_params, x))


def _chain_fused_diff_bwd(stage, letters, tile_rows, res, g):
    block_params, x = res

    def ref(p, xx):
        y = xx
        for letter in letters:
            y = _bottleneck(y, p, stage, letter, letter == "a", 1,
                            jnp.bfloat16, None)
        return y

    _, vjp = jax.vjp(ref, block_params, x)
    return vjp(g.astype(jnp.bfloat16))


_chain_fused_diff.defvjp(_chain_fused_diff_fwd, _chain_fused_diff_bwd)

_STEM_KEYS = ("conv1", "bn_conv1")


def _chain_keys(stage: int, letters: str) -> list[str]:
    keys = []
    for letter in letters:
        for branch in ("2a", "2b", "2c") + (("1",) if letter == "a" else ()):
            keys += [f"res{stage}{letter}_branch{branch}",
                     f"bn{stage}{letter}_branch{branch}"]
    return keys


def apply_resnet(params, images, architecture: str = "resnet101",
                 dtype=jnp.bfloat16, bn_ctx=None, inference: bool = True,
                 train_fused_kernels: bool = False):
    """(B, H, W, 3) preprocessed images -> feature maps C2, C3, C4, C5.

    The fused Pallas kernels engage whenever their folded-BN math is exact
    (bf16 + frozen BN stats, `stem_supported`/`chain_supported`) AND a
    gradient path exists. Under `inference=False` that path is the
    custom_vjp wrappers (kernel forward, XLA-vjp backward) — opt-in via
    `train_fused_kernels` because the backward's XLA rematerialization
    measured slower than the kernel forward saves on v5e (PERF.md negative
    result #17); batch-BN training (bn_ctx set) always takes the pure XLA
    path."""
    from maskrcnn_tpu.ops import stem_pallas
    train_kernels = (not inference) and train_fused_kernels
    if stem_pallas.stem_supported(images.shape, dtype, bn_ctx) and (
            inference or train_kernels):
        # Fused Pallas stem: conv1+BN+ReLU+maxpool in one kernel (~18 ms ->
        # ~5 ms at batch 32 on v5e).
        if inference:
            x = stem_pallas.apply_stem_pallas(params, images)
        else:
            x = _stem_fused_diff({k: params[k] for k in _STEM_KEYS}, images)
    else:
        x = _stem_xla(params, images, dtype, bn_ctx)

    from maskrcnn_tpu.ops import bottleneck_pallas as bp
    fused_chains = {}
    if bp.chain_supported(x.shape, dtype, bn_ctx) and (
            inference or train_kernels):
        # Fuse the shallow wide stages (res2 fully; res3 minus its stride-2
        # entry): their convs are HBM-round-trip bound in XLA (26 ms vs a
        # ~5 ms floor for res2 at batch 32 / 1024^2). res4/res5 already run
        # at 90%+ MXU efficiency — the XLA path is optimal there.
        fused_chains = {(2, "a"): ("abc", 64), (3, "b"): ("bcd", 32)}

    feats = {}
    skip = set()
    for stage, block, is_conv, _, stride in _stage_blocks(architecture):
        if (stage, block) in skip:
            continue
        chain = fused_chains.get((stage, block))
        if chain:
            letters, tile_rows = chain
            if inference:
                x = bp.fused_bottleneck_chain(
                    x, bp.fold_bottleneck_chain(params, stage, letters),
                    tile_rows=tile_rows)
            else:
                x = _chain_fused_diff(
                    stage, letters, tile_rows,
                    {k: params[k] for k in _chain_keys(stage, letters)}, x)
            skip.update((stage, l) for l in letters)
        else:
            x = _bottleneck(x, params, stage, block, is_conv, stride, dtype,
                            bn_ctx)
        feats[stage] = x
    return feats[2], feats[3], feats[4], feats[5]
