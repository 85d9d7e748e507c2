"""Prefix-parity probe: WHERE does trained-weights exact-vs-oracle diverge?

`docs/flagship_proof_r04.json` shows that at trained weights, the f32-exact
JAX forward and the TF oracle agree to 0.002 AP50 but matched detections
carry box L-inf mean ~10 px — versus <=6.3e-6 at random weights
(`docs/parity_flagship.json`). The standing explanation is chaotic
amplification through proposal selection (1e-4-level backbone drift flips
near-tie top-k/NMS picks whose downstream boxes then differ by pixels while
the SET of detections stays the same). This probe turns that assertion into
measured stage deltas (VERDICT r04 #7):

  1. backbone+FPN feature L-inf per level (pure numerics, no selection);
  2. RPN logit / fg-margin L-inf (still selection-free);
  3. proposal top-k index overlap + NMS'd proposal-set overlap (the first
     SELECTION stages — where ulp drift becomes discrete flips);
  4. matched final detections: box L-inf and score deltas, split by
     whether the underlying proposal survived identically in both.

Reference analog: `Sources/maskrcnn/Python/COCOEval/task.py:99-105` (the
same-weights cross-framework comparison this decomposes).

Usage:
  python tools/parity_prefix.py \
      --weights /tmp/flagship_proof/checkpoint.npz \
      --config /tmp/flagship_proof/config_exact.json \
      --images /tmp/flagship_proof/data/coco/val2017 --limit 8 \
      --out docs/parity_prefix_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def linf(a, b):
    return float(np.abs(np.asarray(a, np.float64)
                        - np.asarray(b, np.float64)).max())


def box_iou_np(a, b):
    """(N,4) x (M,4) IoU, y1x1y2x2."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    yx1 = np.maximum(a[:, None, :2], b[None, :, :2])
    yx2 = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(yx2 - yx1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-30)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--images", required=True)
    ap.add_argument("--limit", type=int, default=8)
    ap.add_argument("--precision", default="default",
                    choices=("default", "highest"),
                    help="JAX matmul precision: 'highest' forces true f32 "
                         "MXU accumulation — the control arm that should "
                         "collapse every stage delta if default-precision "
                         "conv accumulation is the whole cause")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.evalkit import tf_forward as tfm
    from maskrcnn_tpu.io.weights import load_npz_checkpoint
    from maskrcnn_tpu.models.mask_rcnn import forward
    from maskrcnn_tpu.pipeline.loader import load_letterboxed

    config = MaskRCNNConfig.from_json(args.config).exact_numerics()
    params = load_npz_checkpoint(args.weights)
    anchors = np.asarray(generate_anchors(config))
    params_np = {k: {kk: np.asarray(vv, np.float32) for kk, vv in v.items()}
                 for k, v in params.items()}

    paths = sorted(
        os.path.join(args.images, n) for n in os.listdir(args.images)
        if n.lower().endswith((".jpg", ".jpeg", ".png")))[:args.limit]
    if not paths:
        print("no images found", file=sys.stderr)
        return 1

    mean = np.asarray(config.mean_pixel, np.float32)
    k_pre = config.pre_nms_max_proposals

    per_image = []
    for path in paths:
        canvas, _ = load_letterboxed(path, config.image_height)
        images = canvas[None].astype(np.float32)

        # --- JAX exact forward with intermediates ------------------------
        with jax.default_matmul_precision(args.precision):
            out = forward(params, jnp.asarray(images), jnp.asarray(anchors),
                          config, with_features=True)
        pyr_j = [np.asarray(p, np.float32) for p in out["pyramid"]]
        logits_j = np.asarray(out["rpn_logits"], np.float32)[0]
        rois_j = np.asarray(out["rois"], np.float32)[0]
        roi_valid_j = np.asarray(out["roi_valid"])[0]
        det_j = np.asarray(out["detections"])[0]
        valid_j = np.asarray(out["valid"])[0]

        # --- TF oracle intermediates (same stages, its own graph) --------
        x_tf = tf.constant(images - mean)
        pyr_t = tfm._backbone_fpn(tf, params_np, x_tf, config.architecture)
        logits_t, deltas_t = tfm._rpn(tf, params_np, pyr_t)
        logits_t = logits_t.numpy()[0]
        margin_j = logits_j[:, 1] - logits_j[:, 0]
        margin_t = logits_t[:, 1] - logits_t[:, 0]

        # exact top-k on both margins -> index overlap
        idx_j = np.argsort(-margin_j, kind="stable")[:k_pre]
        idx_t = np.argsort(-margin_t, kind="stable")[:k_pre]
        topk_overlap = len(set(idx_j) & set(idx_t)) / k_pre

        # TF-side proposals (oracle's own decode+NMS)
        std = np.asarray(config.bbox_std_dev, np.float32)
        sel_d = tf.gather(deltas_t[0], idx_t) * std
        sel_a = tf.gather(tf.constant(anchors), idx_t)
        boxes_t = tf.clip_by_value(
            tfm._apply_deltas(tf, sel_a, sel_d), 0.0, 1.0)
        keep_t = tf.image.non_max_suppression(
            boxes_t, tf.gather(margin_t, idx_t), config.max_proposals,
            iou_threshold=config.proposal_nms_threshold)
        props_t = tf.gather(boxes_t, keep_t).numpy()
        props_j = rois_j[roi_valid_j]

        # proposal-set overlap: fraction of JAX proposals with an
        # IoU>=0.99 twin in the TF set (discrete selection agreement) and
        # the matched-pair L-inf (numeric drift on agreeing picks)
        iou_p = box_iou_np(props_j, props_t)
        best = iou_p.max(axis=1) if props_t.size else np.zeros(len(props_j))
        prop_overlap = float((best >= 0.99).mean()) if len(props_j) else 1.0
        m = best >= 0.99
        prop_match_linf = (
            float(np.abs(props_j[m]
                         - props_t[iou_p.argmax(axis=1)[m]]).max())
            if m.any() else 0.0)

        # final detections via the oracle's full path
        oracle = tfm.tf_forward(params_np, images, anchors, config)[0]
        n_j = int(valid_j.sum())
        dj = det_j[:n_j]
        db, dc = oracle["boxes"], oracle["class_ids"]
        matched_linf, score_d, n_matched = 0.0, 0.0, 0
        if n_j and len(dc):
            iou_d = box_iou_np(dj[:, :4], db)
            same_cls = dj[:, 4:5].astype(int) == dc[None, :]
            iou_d = np.where(same_cls, iou_d, 0.0)
            bi = iou_d.argmax(axis=1)
            bv = iou_d.max(axis=1)
            mm = bv >= 0.5
            n_matched = int(mm.sum())
            if n_matched:
                # px scale, like flagship_proof's cross_mode_deltas
                s = config.image_height
                matched_linf = float(
                    np.abs(dj[mm, :4] - db[bi[mm]]).max() * s)
                score_d = float(
                    np.abs(dj[mm, 5] - oracle["scores"][bi[mm]]).max())

        per_image.append({
            "image": os.path.basename(path),
            "pyramid_linf": [round(linf(a, b.numpy()), 8)
                             for a, b in zip(pyr_j, pyr_t)],
            "pyramid_absmax": [round(float(np.abs(p).max()), 3)
                               for p in pyr_j],
            "rpn_logit_linf": round(linf(logits_j, logits_t), 8),
            "rpn_margin_linf": round(linf(margin_j, margin_t), 8),
            "topk_index_overlap": round(topk_overlap, 5),
            "proposal_set_overlap@0.99": round(prop_overlap, 5),
            "proposal_matched_linf": round(prop_match_linf, 8),
            "n_proposals_jax_tf": [int(len(props_j)), int(len(props_t))],
            "n_detections_jax_tf": [n_j, int(len(dc))],
            "n_matched_detections": n_matched,
            "matched_box_linf_px": round(matched_linf, 3),
            "matched_score_delta_max": round(score_d, 5),
        })
        print(json.dumps(per_image[-1]), file=sys.stderr)

    def agg(key, fn=max):
        vals = [im[key] for im in per_image]
        if isinstance(vals[0], list):
            return [round(fn(v[i] for v in vals), 8)
                    for i in range(len(vals[0]))]
        return round(fn(vals), 8)

    report = {
        "config": "exact_numerics (f32, exact top-k, table anchors)",
        "matmul_precision": args.precision,
        "weights": args.weights,
        "images": len(per_image),
        "summary": {
            "pyramid_linf_max": agg("pyramid_linf"),
            "rpn_margin_linf_max": agg("rpn_margin_linf"),
            "topk_index_overlap_min": agg("topk_index_overlap", min),
            "proposal_set_overlap_min": agg("proposal_set_overlap@0.99",
                                            min),
            "proposal_matched_linf_max": agg("proposal_matched_linf"),
            "matched_box_linf_px_max": agg("matched_box_linf_px"),
            "matched_score_delta_max": agg("matched_score_delta_max"),
        },
        "per_image": per_image,
    }
    print(json.dumps(report["summary"], indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
