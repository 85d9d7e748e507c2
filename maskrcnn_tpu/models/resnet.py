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


def apply_resnet(params, images, architecture: str = "resnet101",
                 dtype=jnp.bfloat16, bn_ctx=None, inference: bool = True):
    """(B, H, W, 3) preprocessed images -> feature maps C2, C3, C4, C5.

    `inference=False` disables the fused Pallas kernels (no autodiff rule)
    regardless of BN mode — required for frozen-BN fine-tuning, where
    bn_ctx is None but gradients still flow through the backbone."""
    from maskrcnn_tpu.ops import stem_pallas
    if inference and stem_pallas.stem_supported(images.shape, dtype, bn_ctx):
        # Fused Pallas stem: conv1+BN+ReLU+maxpool in one kernel (~18 ms ->
        # ~5 ms at batch 32 on v5e); inference-mode only (frozen BN).
        x = stem_pallas.apply_stem_pallas(params, images)
    else:
        x = images.astype(dtype)
        # conv1: ZeroPadding2D(3) + 7x7/2 valid == explicit (3,3) padding.
        x = nn.conv2d(x, params["conv1"], stride=2,
                      padding=[(3, 3), (3, 3)], dtype=dtype)
        x = nn.relu(nn.bn_apply(x, params, "bn_conv1", bn_ctx))
        x = nn.max_pool(x, 3, 2, padding="SAME")

    from maskrcnn_tpu.ops import bottleneck_pallas as bp
    fused_chains = {}
    if inference and bp.chain_supported(x.shape, dtype, bn_ctx):
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
            x = bp.fused_bottleneck_chain(
                x, bp.fold_bottleneck_chain(params, stage, letters),
                tile_rows=tile_rows)
            skip.update((stage, l) for l in letters)
        else:
            x = _bottleneck(x, params, stage, block, is_conv, stride, dtype,
                            bn_ctx)
        feats[stage] = x
    return feats[2], feats[3], feats[4], feats[5]
