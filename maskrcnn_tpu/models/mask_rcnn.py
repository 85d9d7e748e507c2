"""The full Mask-RCNN graph as ONE jittable function.

This is the architecture translation at the heart of the rebuild (SURVEY.md
§7): the reference splits inference across three Core ML models plus five
custom CPU/Metal layers, crossing a device boundary 4+ times per image
(SURVEY.md §3.1). On TPU the entire forward pass — preprocess, ResNet-FPN,
RPN, proposal NMS, pyramid ROIAlign, classifier head, detection filtering,
mask head, per-class mask select — is a single static-shape XLA program.

Output contract matches the reference main model
(`Conversion/task.py:69-92`): `detections` (B, max_detections, 6) rows
(y1, x1, y2, x2, class_id, score) in normalized coordinates, zero-padded;
`masks` (B, max_detections, mask_size, mask_size) — the detected class's
sigmoid mask, selected the way `TimeDistributedMaskLayer.swift:71-83` copies
the classId channel.

Parameters are ONE flat dict keyed by Matterport layer names (backbone +
FPN + RPN + heads share no names), mirroring the `weights.h5` layout.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import anchor_spec
from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.models import fpn, heads, resnet, rpn
from maskrcnn_tpu.ops.detection import refine_detections
from maskrcnn_tpu.ops.proposals import generate_proposals
from maskrcnn_tpu.ops.roi_align import (build_flat_pyramid,
                                        pyramid_roi_align_flat)
from maskrcnn_tpu.utils.profiling import stage


def init_mask_rcnn(key, config: MaskRCNNConfig) -> dict[str, Any]:
    """Random-init the full parameter pytree (flat, Matterport-named)."""
    k_bb, k_fpn, k_rpn, k_cls, k_mask = jax.random.split(key, 5)
    params: dict[str, Any] = {}
    if config.architecture == "mobilenetv2":
        from maskrcnn_tpu.models import mobilenet
        params.update(mobilenet.init_mobilenetv2(k_bb))
        params.update(fpn.init_fpn(k_fpn, config.fpn_channels,
                                   c_channels=mobilenet.C_CHANNELS))
        params.update(rpn.init_rpn(
            k_rpn, config.fpn_channels, config.anchors_per_location))
        params.update(heads.init_classifier_head(
            k_cls, config.num_classes, config.fpn_channels, config.pool_size,
            config.head_fc_dim))
        params.update(heads.init_mask_head(
            k_mask, config.num_classes, config.fpn_channels))
        return params
    params.update(resnet.init_resnet(k_bb, config.architecture))
    params.update(fpn.init_fpn(k_fpn, config.fpn_channels))
    params.update(rpn.init_rpn(
        k_rpn, config.fpn_channels, config.anchors_per_location))
    params.update(heads.init_classifier_head(
        k_cls, config.num_classes, config.fpn_channels, config.pool_size,
        config.head_fc_dim))
    params.update(heads.init_mask_head(
        k_mask, config.num_classes, config.fpn_channels))
    return params


def preprocess(images: jnp.ndarray, config: MaskRCNNConfig) -> jnp.ndarray:
    """RGB [0,255] -> mean-subtracted float. Fused into the graph — the
    reference baked the same biases into the Core ML model input
    (`Conversion/task.py:73-75`)."""
    mean = jnp.asarray(config.mean_pixel, jnp.float32)
    return images.astype(jnp.float32) - mean


def backbone_fpn(params, images, config: MaskRCNNConfig, dtype,
                 bn_ctx=None, inference: bool = True):
    """`inference=False` (training/calibration) needs gradients: batch-BN
    runs the pure XLA path, while frozen-BN fine-tuning (bn_ctx None, bf16)
    still gets the fused Pallas stem/chain forwards via custom_vjp wrappers
    whose backward rematerializes the equivalent XLA sub-graph
    (models/resnet.py)."""
    if config.architecture == "mobilenetv2":
        from maskrcnn_tpu.models import mobilenet
        c2, c3, c4, c5 = mobilenet.apply_mobilenetv2(
            params, images, dtype=dtype, bn_ctx=bn_ctx)
    else:
        c2, c3, c4, c5 = resnet.apply_resnet(
            params, images, config.architecture, dtype=dtype, bn_ctx=bn_ctx,
            inference=inference,
            train_fused_kernels=config.train_fused_kernels)
    return fpn.apply_fpn(params, c2, c3, c4, c5, dtype=dtype)


def _forward(
    params,
    images: jnp.ndarray,
    anchors: jnp.ndarray,
    config: MaskRCNNConfig,
    with_features: bool = False,
    paste_size: int | None = None,
):
    """Raw (B, H, W, 3) RGB images -> detections + masks.

    Args:
      params: flat Matterport-named parameter dict.
      images: (B, H, W, 3) RGB in [0, 255] (any float/int dtype), already
        letterboxed to `config.input_image_shape`.
      anchors: (A, 4) normalized anchor table (`core/anchors.generate_anchors`).
      config: hashable static config.
      paste_size: if set, also paste full-resolution boolean masks ON DEVICE
        inside the same XLA program (BASELINE streaming config: "persistent
        compiled pipeline + on-device mask pasting"). Fused here, the paste
        costs only its compute — a separate dispatch per frame pays an RPC
        round-trip and serializes with the next frame's forward.

    Returns dict:
      detections: (B, max_detections, 6) fp32 (y1,x1,y2,x2,class_id,score).
      masks: (B, max_detections, mask_size, mask_size) fp32 in [0,1].
      valid: (B, max_detections) bool.
      rois / roi_valid: (B, max_proposals, 4) proposals (debug/training).
      [pasted: (B, max_detections, paste_size, paste_size) uint8 if paste_size]
      [rpn_logits, rpn_deltas, pyramid if with_features]
    """
    dtype = jnp.dtype(config.compute_dtype)
    b = images.shape[0]
    image_hw = (config.image_height, config.image_width)

    with stage("preprocess"):
        x = preprocess(images, config)
    with stage("backbone_fpn"):
        pyramid = backbone_fpn(params, x, config, dtype)  # P2..P6
    with stage("rpn"):
        rpn_logits, rpn_deltas = rpn.apply_rpn(params, pyramid, dtype=dtype)
    # Proposal selection only needs the fg ORDER; the logit margin is a
    # monotonic transform of softmax fg probability (ProposalLayer consumes
    # probabilities purely for sorting, ProposalLayer.swift:124-134), so the
    # 262k-anchor softmax reduces to one subtraction. The margin order is a
    # strict REFINEMENT of the probability order: saturated fp32 softmax
    # collapses the top scores to exactly 1.0 (observed: entire top-k tied),
    # where the reference's vDSP sort breaks ties in unspecified order.
    fg_scores = rpn_logits[..., 1] - rpn_logits[..., 0]  # (B, A)

    propose = functools.partial(
        generate_proposals,
        bbox_std_dev=config.bbox_std_dev,
        pre_nms_max_proposals=config.pre_nms_max_proposals,
        max_proposals=config.max_proposals,
        nms_threshold=config.proposal_nms_threshold,
        topk_recall=config.proposal_topk_recall,
        anchor_spec=(anchor_spec(config) if config.analytic_anchors
                     else None))
    with stage("proposals"):
        rois, roi_valid = jax.vmap(propose, in_axes=(0, 0, None))(
            fg_scores, rpn_deltas, anchors)  # (B, R, 4)

    # P2..P5 feed ROIAlign. On TPU the Pallas strip-DMA kernel streams
    # straight from the four level arrays (ops/roi_align_pallas.py);
    # elsewhere the XLA gather path shares a widened flat pair table.
    use_pallas_align = jax.default_backend() == "tpu"
    fuse_cls = use_pallas_align and config.fuse_classifier_head
    r = config.max_proposals
    if use_pallas_align:
        from maskrcnn_tpu.ops.roi_align_pallas import (
            pack_classifier_head, pyramid_roi_align_pallas,
            unpack_classifier_head)
        with stage("roi_align_classifier"):
            if fuse_cls:
                packed = pack_classifier_head(params, config.num_classes,
                                              dtype)
                pooled, head_out = pyramid_roi_align_pallas(
                    list(pyramid[:4]), rois, config.pool_size, image_hw,
                    config.roi_canonical_scale, head_params=packed)
            else:
                pooled = pyramid_roi_align_pallas(
                    list(pyramid[:4]), rois, config.pool_size, image_hw,
                    config.roi_canonical_scale)
    else:
        with stage("flat_pyramid"):
            flat_pyr = jax.vmap(lambda *f: build_flat_pyramid(f))(*pyramid[:4])
        align_cls = functools.partial(
            pyramid_roi_align_flat, crop_size=config.pool_size,
            image_shape=image_hw, canonical_scale=config.roi_canonical_scale)
        with stage("roi_align_classifier"):
            pooled = jax.vmap(lambda f, r: align_cls(f, r))(flat_pyr, rois)
    # (B, R, pool, pool, C) -> heads run dense over B*R

    with stage("classifier_head"):
        if fuse_cls:
            probs, deltas, _ = unpack_classifier_head(
                head_out, config.num_classes)
        else:
            probs, deltas = heads.apply_classifier_head(
                params, pooled.reshape((b * r,) + pooled.shape[2:]),
                config.num_classes, dtype=dtype)
    probs = probs.reshape(b, r, -1)
    deltas = deltas.reshape(b, r, config.num_classes, 4)

    refine = functools.partial(
        refine_detections,
        bbox_std_dev=config.bbox_std_dev,
        score_threshold=config.detection_score_threshold,
        nms_threshold=config.detection_nms_threshold,
        max_detections=config.max_detections)
    with stage("detection"):
        detections, det_valid, _ = jax.vmap(refine)(rois, probs, deltas)

    det_boxes = detections[..., :4]  # (B, D, 4)
    d = config.max_detections
    # Per-detection class channel select (TimeDistributedMaskLayer.swift:71-75)
    # fused into the head's final 1x1 conv — only the detected class's mask
    # is ever computed.
    class_ids = detections[..., 4].astype(jnp.int32)  # (B, D)
    fuse_mask = (use_pallas_align and config.fuse_mask_head
                 and config.mask_pool_size == 14)
    if fuse_mask:
        # The whole mask head runs inside the pool-14 ROIAlign kernel; the
        # pooled activations never touch HBM.
        from maskrcnn_tpu.ops.roi_align_pallas import (pack_mask_head,
                                                       unpack_masks)
        with stage("roi_align_mask_fused"):
            _, mask_raw = pyramid_roi_align_pallas(
                list(pyramid[:4]), det_boxes, config.mask_pool_size,
                image_hw, config.roi_canonical_scale,
                mask_params=pack_mask_head(params, dtype),
                class_ids=class_ids)
            masks = unpack_masks(mask_raw, config.mask_pool_size)
    else:
        if use_pallas_align:
            with stage("roi_align_mask"):
                mask_pooled = pyramid_roi_align_pallas(
                    list(pyramid[:4]), det_boxes, config.mask_pool_size,
                    image_hw, config.roi_canonical_scale)
        else:
            align_mask = functools.partial(
                pyramid_roi_align_flat, crop_size=config.mask_pool_size,
                image_shape=image_hw,
                canonical_scale=config.roi_canonical_scale)
            with stage("roi_align_mask"):
                mask_pooled = jax.vmap(lambda f, r_: align_mask(f, r_))(
                    flat_pyr, det_boxes)
        with stage("mask_head"):
            masks = heads.apply_mask_head(
                params, mask_pooled.reshape((b * d,) + mask_pooled.shape[2:]),
                dtype=dtype, class_ids=class_ids.reshape(b * d))
    masks = masks.reshape(b, d, config.mask_size, config.mask_size)
    masks = masks * det_valid[:, :, None, None].astype(masks.dtype)

    out = {
        "detections": detections,
        "masks": masks,
        "valid": det_valid,
        "rois": rois,
        "roi_valid": roi_valid,
    }
    if paste_size is not None:
        from maskrcnn_tpu.pipeline.paste import paste_masks
        with stage("paste"):
            out["pasted"] = jax.vmap(
                lambda m_, b_, v_: paste_masks(m_, b_, v_, paste_size))(
                masks.astype(jnp.float32), det_boxes, det_valid)
    if with_features:
        out.update(rpn_logits=rpn_logits, rpn_deltas=rpn_deltas,
                   pyramid=pyramid)
    return out


_forward_jit = jax.jit(
    _forward, static_argnames=("config", "with_features", "paste_size"))
# The fused ROIAlign+head kernels (config.fuse_classifier_head /
# fuse_mask_head) keep the folded head weights VMEM-resident for the whole
# grid — ~40 MB for the classifier head's (12544, 1024) bf16 dense — which
# exceeds XLA's default 16 MB scoped-VMEM budget for the surrounding module
# even though the kernel itself fits v5e's 128 MB VMEM. Raise the budget
# only for modules compiled with fusion on; the default path keeps XLA's
# stock fusion heuristics.
_forward_jit_fused = jax.jit(
    _forward, static_argnames=("config", "with_features", "paste_size"),
    compiler_options={"xla_tpu_scoped_vmem_limit_kib": 64 * 1024})


def forward(params, images, anchors, config, with_features=False,
            paste_size=None):
    """Jitted detector forward; see `_forward` for the contract."""
    fused = config.fuse_classifier_head or config.fuse_mask_head
    fn = _forward_jit_fused if fused else _forward_jit
    return fn(params, images, anchors, config, with_features=with_features,
              paste_size=paste_size)
