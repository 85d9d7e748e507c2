"""Aggregate per-seed flagship proofs into a seed-band artifact (VERDICT r04 #5).

Each seed re-draws BOTH the synthetic train set and the disjoint val set
(seed feeds `flagship_proof.make_dataset` and the train loader), so the
band below is the combined seed + val-resample variability — exactly the
error bar VERDICT r04 asked to put under the single-seed r04 headline
deltas (production −0.009 bbox / −0.007 segm AP vs exact).

Reference analog: `Sources/maskrcnn/Python/COCOEval/task.py:97-105` — the
same-weights oracle comparison whose agreement is being error-barred.

Usage:
  python tools/flagship_seed_band.py \
      --inputs seed0.json seed1.json seed2.json \
      --out docs/flagship_proof_seeds_r05.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


MODES = ("production", "exact_fp32", "tf_oracle")
METRICS = ("AP", "AP50", "AP75")


def band(vals):
    a = np.asarray(vals, np.float64)
    return {"values": [round(float(v), 4) for v in a],
            "mean": round(float(a.mean()), 4),
            "min": round(float(a.min()), 4),
            "max": round(float(a.max()), 4),
            "spread": round(float(a.max() - a.min()), 4)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="+", required=True,
                    help="per-seed flagship_proof JSONs (seed order)")
    ap.add_argument("--out", default="docs/flagship_proof_seeds_r05.json")
    args = ap.parse_args()

    reports = []
    for p in args.inputs:
        with open(p) as f:
            reports.append(json.load(f))
    seeds = [r["seed"] for r in reports]

    out = {
        "comment": (
            "Flagship proof (train->calibrate->evaluate, resnet101 @ 1024^2, "
            "64 disjoint val images) repeated across seeds; each seed "
            "re-draws train AND val data, so spreads are seed + "
            "val-resample variability combined."),
        "seeds": seeds,
        "per_seed_sources": args.inputs,
        "ap": {}, "deltas": {}, "cross_mode": {},
    }

    for mode in MODES:
        if not all(mode in r for r in reports):
            continue
        for iou_type in ("bbox", "segm"):
            for met in METRICS:
                key = f"{mode}.{iou_type}.{met}"
                out["ap"][key] = band(
                    [r[mode][iou_type][met] for r in reports])

    # the headline deltas, per seed and banded
    for iou_type in ("bbox", "segm"):
        out["deltas"][f"production_vs_exact.{iou_type}.AP"] = band(
            [r["production"][iou_type]["AP"] - r["exact_fp32"][iou_type]["AP"]
             for r in reports])
        if all("tf_oracle" in r for r in reports):
            out["deltas"][f"exact_vs_tf_oracle.{iou_type}.AP50"] = band(
                [r["exact_fp32"][iou_type]["AP50"]
                 - r["tf_oracle"][iou_type]["AP50"] for r in reports])
            out["deltas"][f"production_vs_tf_oracle.{iou_type}.AP"] = band(
                [r["production"][iou_type]["AP"]
                 - r["tf_oracle"][iou_type]["AP"] for r in reports])

    # cross-mode per-detection stability across seeds (the r04 proof's
    # attribution statistics, now with a band)
    for pair in ("production_vs_exact_fp32", "exact_fp32_vs_tf_oracle",
                 "production_vs_tf_oracle"):
        rows = [r.get("cross_mode_deltas", {}).get(pair) for r in reports]
        if not all(rows):
            continue
        out["cross_mode"][pair] = {
            "n_matched": [r["n_matched"] for r in rows],
            "pairwise_mask_iou_mean": band(
                [r["pairwise_mask_iou_mean"] for r in rows]),
            "gt_iou_crossings_at_0.5": [r["gt_iou_crossings_at_0.5"]
                                        for r in rows],
        }

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out["deltas"].items()}, indent=1))
    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
