"""Per-knob production-numerics attribution at TRAINED weights.

VERDICT r03 weak #5: the one-knob parity rows in docs/parity_flagship.json
are random-weights-only (scores pinned at the 1/81 floor, threshold 0.02 —
deliberately adversarial). This tool re-runs the attribution on the
flagship proof's TRAINED checkpoint and its 64-image disjoint val set:
starting from reference-exact numerics, flip ONE production knob at a time

    bf16      : compute_dtype float32 -> bfloat16
    topk      : exact lax.top_k -> approx_max_k(recall 0.95)
    anchors   : table anchors -> analytic in-graph decode
    fused     : XLA heads -> in-kernel fused Pallas classifier+mask heads

and score each through the full evaluate -> COCO AP chain, plus
per-detection cross-mode deltas vs the exact baseline (matched box L-inf,
score absdiff, pairwise mask IoU, GT-IoU threshold crossings).

Prereq: a completed `tools/flagship_proof.py` run (dataset + checkpoint
under --root). Reference analog: the reference's oracle comparison concept
(`COCOEval/task.py:99-105`) — here applied knob-by-knob.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/parity_trained.py --root /tmp/flagship_proof \
    --out docs/parity_trained_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flagship_proof import cross_mode_deltas, score  # noqa: E402


KNOBS = {
    "exact": {},
    "bf16": {"compute_dtype": "bfloat16"},
    "topk": {"proposal_topk_recall": 0.95},
    "anchors": {"analytic_anchors": True},
    "fused": {"fuse_classifier_head": True, "fuse_mask_head": True},
    "production": None,  # the shipped defaults (all knobs on)
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/flagship_proof")
    ap.add_argument("--val-images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="docs/parity_trained_r04.json")
    args = ap.parse_args()

    from maskrcnn_tpu.cli.main import main as cli
    from maskrcnn_tpu.core.config import MaskRCNNConfig

    root = os.path.abspath(args.root)
    ckpt = os.path.join(root, "checkpoint.npz")
    ann_dir = os.path.join(root, "data/coco")
    if not os.path.exists(ckpt):
        print(f"no trained checkpoint at {ckpt} — run tools/"
              f"flagship_proof.py first", file=sys.stderr)
        return 2

    base = MaskRCNNConfig.from_json(
        os.path.join(root, "config_production.json"))
    exact = base.exact_numerics()

    report = {"root": root, "val_images": args.val_images,
              "knob_rows": {}}
    results_by_mode = {}
    for name, overrides in KNOBS.items():
        cfg = base if overrides is None else exact.replace(**overrides)
        cfg_path = os.path.join(root, f"config_knob_{name}.json")
        cfg.to_json(cfg_path)
        res_dir = os.path.join(root, f"results_knob_{name}")
        t0 = time.time()
        rc = cli(["evaluate", "knob", "coco",
                  "--limit", str(args.val_images),
                  "--batch", str(args.batch),
                  "--config", cfg_path, "--weights", ckpt,
                  "--annotations_dir", ann_dir,
                  "--images_dir", os.path.join(ann_dir, "val2017"),
                  "--results_dir", res_dir])
        if rc != 0:
            print(f"evaluate ({name}) failed", file=sys.stderr)
            return rc
        res_json = os.path.join(res_dir, "results.json")
        stats = score(root, res_json, args.val_images)
        stats["eval_seconds_incl_compile"] = round(time.time() - t0, 1)
        report["knob_rows"][name] = stats
        results_by_mode[name] = res_json
        print(f"# {name}: bbox AP {stats['bbox']['AP']} "
              f"segm AP {stats['segm']['AP']} ({stats['eval_seconds_incl_compile']}s)",
              file=sys.stderr)

    report["ap_delta_vs_exact"] = {
        name: {t: round(report["knob_rows"][name][t]["AP"]
                        - report["knob_rows"]["exact"][t]["AP"], 4)
               for t in ("bbox", "segm")}
        for name in KNOBS if name != "exact"}

    # per-detection deltas of each knob vs the exact baseline
    pairs = {n: p for n, p in results_by_mode.items()}
    report["cross_mode_deltas_vs_exact"] = {}
    for name in KNOBS:
        if name == "exact":
            continue
        d = cross_mode_deltas(
            root, {"exact": pairs["exact"], name: pairs[name]},
            args.val_images)
        report["cross_mode_deltas_vs_exact"][name] = d
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps(report["ap_delta_vs_exact"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
