"""bf16-momentum lever: AP parity on the flagship synthetic train->AP chain.

VERDICT r04 #8: PERF.md names bf16 accumulation games as the last untried
training lever; `config.train_momentum_dtype='bfloat16'` (optax SGD
accumulator dtype) halves optimizer-state HBM footprint/traffic. Throughput
is measured by `bench.py --mode train --bf16-momentum` arms
(docs/bench_train_r05.json); this probe measures what the lever COSTS in
model quality: retrain the flagship proof config (same seed-0 dataset,
same steps/batch/seed — the only delta is the momentum dtype) and score
production AP on the same 64 disjoint val images.

Requires a completed `tools/flagship_proof.py --root <root>` run (dataset +
the f32-momentum reference report). Reference analog: the capability
surface the reference stubs entirely (`TrainCommand.swift:4-15`).

Usage (TPU, ~25 min):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bf16mom_ap_probe.py \
      --root /tmp/flagship_proof --ref-report /tmp/flagship_proof_seed0_r05.json \
      --out /tmp/bf16mom_ap_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/flagship_proof")
    ap.add_argument("--ref-report", required=True,
                    help="flagship_proof JSON for the f32-momentum arm")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-images", type=int, default=64)
    ap.add_argument("--out", default="/tmp/bf16mom_ap_r05.json")
    args = ap.parse_args()

    from maskrcnn_tpu.cli.main import main as cli

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from flagship_proof import score

    root = os.path.abspath(args.root)
    ann_dir = os.path.join(root, "data/coco")
    cfg_prod = os.path.join(root, "config_production.json")
    ckpt = os.path.join(root, "checkpoint_bf16mom.npz")
    with open(args.ref_report) as f:
        ref = json.load(f)

    t0 = time.time()
    rc = cli(["train", "proof", "--config", cfg_prod,
              "--annotations",
              os.path.join(ann_dir, "instances_train2017.json"),
              "--images_dir", os.path.join(ann_dir, "train2017"),
              "--steps", str(args.steps), "--batch", str(args.batch),
              "--seed", str(args.seed), "--log-every", "100",
              "--output", ckpt, "--bf16-momentum",
              "--cache-images", "64",
              "--checkpoint-dir", os.path.join(root, "ckpts_bf16mom"),
              "--checkpoint-every", "200", "--resume",
              "--metrics-log", os.path.join(root, "metrics_bf16mom.jsonl")])
    if rc != 0:
        print("train failed", file=sys.stderr)
        return rc
    train_s = round(time.time() - t0, 1)

    res_dir = os.path.join(root, "results_bf16mom")
    rc = cli(["evaluate", "proof", "coco",
              "--limit", str(args.val_images), "--batch", "8",
              "--config", cfg_prod, "--weights", ckpt,
              "--annotations_dir", ann_dir,
              "--images_dir", os.path.join(ann_dir, "val2017"),
              "--results_dir", res_dir])
    if rc != 0:
        print("evaluate failed", file=sys.stderr)
        return rc
    stats = score(root, os.path.join(res_dir, "results.json"),
                  args.val_images)

    report = {
        "comment": (
            "Same flagship train (seed-0 dataset, identical steps/batch/"
            "seed) with train_momentum_dtype=bfloat16; production-numerics "
            "eval on the same 64 disjoint val images. Reference arm = the "
            "f32-momentum flagship proof."),
        "steps": args.steps, "batch": args.batch, "seed": args.seed,
        "train_seconds": train_s,
        "bf16_momentum": {t: stats[t] for t in ("bbox", "segm")},
        "f32_momentum": {t: ref["production"][t] for t in ("bbox", "segm")},
        "ap_delta_bf16_vs_f32_momentum": {
            t: round(stats[t]["AP"] - ref["production"][t]["AP"], 4)
            for t in ("bbox", "segm")},
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["ap_delta_bf16_vs_f32_momentum"]))
    print(f"# wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
