#!/usr/bin/env python
"""Generate the layer-name + shape census of the real `mask_rcnn_coco.h5`.

The reference's entire purpose is running the released Matterport COCO
weights (`Sources/maskrcnn/DownloadCommand.swift:32` fetches the converted
artifacts; `Sources/maskrcnn/Python/Conversion/task.py:173` consumes
`weights.h5`). That artifact cannot be downloaded here (zero egress), so this
script encodes its structure from the PUBLIC Matterport `model.py`
architecture definition — independently of `maskrcnn_tpu` (importing nothing
from it), so the emitted fixture is an external contract the loader is tested
against, not a self-referential round-trip.

Facts encoded (all from the public Matterport Mask_RCNN repo + Keras 2.x
`save_weights` HDF5 serialization):
  * datasets live at the file ROOT (no `model_weights` wrapper group —
    the artifact was written by `save_weights`, not `model.save`);
  * one HDF5 group per layer; each weight is a dataset INSIDE that group
    named by the full variable name, so the layer name appears twice in the
    path: `/conv1/conv1/kernel:0`;
  * the RPN is a nested Keras Model named `rpn_model` shared across FPN
    levels; its weights serialize under ONE `rpn_model` group with
    doubly-qualified variable names:
    `/rpn_model/rpn_model/rpn_conv_shared/kernel:0`;
  * weight order inside a group: kernel, bias for convs/dense;
    gamma, beta, moving_mean, moving_variance for BatchNorm;
  * `mrcnn_mask_deconv` is a Conv2DTranspose — Keras stores its kernel as
    (kh, kw, out_channels, in_channels) = (2, 2, 256, 256);
  * resnet101 stage-4 has 1 conv block + 22 identity blocks named
    res4a, res4b..res4w (`chr(98+i)`), per Matterport `resnet_graph`;
  * heads: TimeDistributed conv/dense variables are scoped under the
    TimeDistributed layer's name (`mrcnn_class_conv1/kernel:0`, ...);
  * hyperparameters of the released COCO model: 81 classes, FPN 256
    channels, 3 anchor ratios per location, pool size 7, mask pool 14,
    1024 head FC width.

Usage: python tools/make_matterport_manifest.py [out.json]
"""

from __future__ import annotations

import json
import sys

NUM_CLASSES = 81
TOP_DOWN = 256            # FPN channel width (Matterport TOP_DOWN_PYRAMID_SIZE)
ANCHORS_PER_LOC = 3       # len(RPN_ANCHOR_RATIOS)
POOL = 7                  # classifier ROI pool
FC = 1024                 # FPN_CLASSIF_FC_LAYERS_SIZE
MASK_CH = 256


def conv(shapes, name, kh, kw, cin, cout):
    shapes[name] = {"kernel": [kh, kw, cin, cout], "bias": [cout]}


def bn(shapes, name, c):
    shapes[name] = {w: [c] for w in
                    ("gamma", "beta", "moving_mean", "moving_variance")}


def dense(shapes, name, din, dout):
    shapes[name] = {"kernel": [din, dout], "bias": [dout]}


def resnet101_shapes():
    """Matterport `resnet_graph(architecture='resnet101')`."""
    shapes = {}
    conv(shapes, "conv1", 7, 7, 3, 64)
    bn(shapes, "bn_conv1", 64)
    stage_filters = {2: (64, 64, 256), 3: (128, 128, 512),
                     4: (256, 256, 1024), 5: (512, 512, 2048)}
    stage_blocks = {2: 2, 3: 3, 4: 22, 5: 2}  # identity blocks after 'a'
    cin = 64
    for stage in (2, 3, 4, 5):
        f1, f2, f3 = stage_filters[stage]
        blocks = ["a"] + [chr(98 + i) for i in range(stage_blocks[stage])]
        for block in blocks:
            pfx = f"res{stage}{block}_branch"
            bpfx = f"bn{stage}{block}_branch"
            cin_block = cin if block == "a" else f3
            conv(shapes, pfx + "2a", 1, 1, cin_block, f1)
            bn(shapes, bpfx + "2a", f1)
            conv(shapes, pfx + "2b", 3, 3, f1, f2)
            bn(shapes, bpfx + "2b", f2)
            conv(shapes, pfx + "2c", 1, 1, f2, f3)
            bn(shapes, bpfx + "2c", f3)
            if block == "a":
                conv(shapes, pfx + "1", 1, 1, cin_block, f3)
                bn(shapes, bpfx + "1", f3)
        cin = f3
    return shapes


def fpn_shapes():
    shapes = {}
    for lvl, cin in (("c2p2", 256), ("c3p3", 512), ("c4p4", 1024),
                     ("c5p5", 2048)):
        conv(shapes, f"fpn_{lvl}", 1, 1, cin, TOP_DOWN)
    for p in (2, 3, 4, 5):
        conv(shapes, f"fpn_p{p}", 3, 3, TOP_DOWN, TOP_DOWN)
    return shapes


def rpn_shapes():
    shapes = {}
    conv(shapes, "rpn_conv_shared", 3, 3, TOP_DOWN, 512)
    conv(shapes, "rpn_class_raw", 1, 1, 512, 2 * ANCHORS_PER_LOC)
    conv(shapes, "rpn_bbox_pred", 1, 1, 512, 4 * ANCHORS_PER_LOC)
    return shapes


def head_shapes():
    shapes = {}
    conv(shapes, "mrcnn_class_conv1", POOL, POOL, TOP_DOWN, FC)
    bn(shapes, "mrcnn_class_bn1", FC)
    conv(shapes, "mrcnn_class_conv2", 1, 1, FC, FC)
    bn(shapes, "mrcnn_class_bn2", FC)
    dense(shapes, "mrcnn_class_logits", FC, NUM_CLASSES)
    dense(shapes, "mrcnn_bbox_fc", FC, 4 * NUM_CLASSES)
    for i in (1, 2, 3, 4):
        conv(shapes, f"mrcnn_mask_conv{i}", 3, 3,
             TOP_DOWN if i == 1 else MASK_CH, MASK_CH)
        bn(shapes, f"mrcnn_mask_bn{i}", MASK_CH)
    # Conv2DTranspose: Keras kernel layout (kh, kw, OUT, IN)
    shapes["mrcnn_mask_deconv"] = {"kernel": [2, 2, MASK_CH, MASK_CH],
                                   "bias": [MASK_CH]}
    conv(shapes, "mrcnn_mask", 1, 1, MASK_CH, NUM_CLASSES)
    return shapes


# Keras BatchNorm serialization order; convs/dense are kernel-then-bias.
_BN_ORDER = ("gamma", "beta", "moving_mean", "moving_variance")
_RPN_LAYERS = ("rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred")


def build_manifest():
    layers = {}
    layers.update(resnet101_shapes())
    layers.update(fpn_shapes())
    layers.update(rpn_shapes())
    layers.update(head_shapes())

    groups = {}
    for layer, weights in layers.items():
        if layer in _RPN_LAYERS:
            continue  # serialized inside the nested rpn_model group
        order = [w for w in ("kernel", "bias") if w in weights]
        order += [w for w in _BN_ORDER if w in weights]
        groups[layer] = {
            "weight_names": [f"{layer}/{w}:0" for w in order],
            "datasets": {f"{layer}/{layer}/{w}:0": weights[w]
                         for w in order},
        }
    groups["rpn_model"] = {
        "weight_names": [f"rpn_model/{l}/{w}:0" for l in _RPN_LAYERS
                         for w in ("kernel", "bias")],
        "datasets": {f"rpn_model/rpn_model/{l}/{w}:0": layers[l][w]
                     for l in _RPN_LAYERS for w in ("kernel", "bias")},
    }

    n_params = sum(
        int(__import__("math").prod(s))
        for g in groups.values() for s in g["datasets"].values())
    return {
        "artifact": "mask_rcnn_coco.h5 (Matterport Mask_RCNN release, "
                    "resnet101, 81 COCO classes)",
        "note": "weighted layers only; the real file's root "
                "`layer_names` attr also lists weightless layers "
                "(inputs, activations, lambdas) with empty weight_names, "
                "which by-name loading ignores",
        "root_attrs": {"backend": "tensorflow"},
        "dataset_dtype": "float32",
        "total_params": n_params,
        "groups": groups,
    }


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else (
        "tests/fixtures/matterport_coco_h5_manifest.json")
    manifest = build_manifest()
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"{out}: {len(manifest['groups'])} groups, "
          f"{manifest['total_params']:,} params")
