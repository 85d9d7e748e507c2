"""Benchmark the in-process COCO evaluator at val2017 scale.

The reference scored 5-image smoke runs with pycocotools in Docker
(`Sources/maskrcnn/Python/COCOEval/task.py:97-98`); this framework must
score the full 5k-image val set without host time dominating a batched TPU
eval run. Generates a synthetic val2017-shaped workload (5k images, 80
categories, ~7 gts and ~20 detections per image, jittered boxes) and times
evaluate/accumulate/summarize for bbox eval.

Usage: python tools/bench_cocoeval.py [--images 5000] [--numpy]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from maskrcnn_tpu.evalkit.coco import COCODataset
from maskrcnn_tpu.evalkit.cocoeval import COCOEvaluator


def synth(n_images: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    images, anns, results = [], [], []
    ann_id = 1
    for img in range(1, n_images + 1):
        images.append({"id": img, "width": 640, "height": 480,
                       "file_name": f"{img}.jpg"})
        n_gt = int(rng.poisson(7))
        cats = rng.integers(1, 81, size=n_gt)
        for c in cats:
            x, y = rng.uniform(0, 560), rng.uniform(0, 400)
            w, h = rng.uniform(4, 80), rng.uniform(4, 80)
            anns.append({"id": ann_id, "image_id": img,
                         "category_id": int(c), "bbox": [x, y, w, h],
                         "area": w * h,
                         "iscrowd": int(rng.random() < 0.02)})
            # ~2 detections near each gt + noise below
            for _ in range(2):
                results.append({
                    "image_id": img, "category_id": int(c),
                    "bbox": [x + rng.normal(0, 4), y + rng.normal(0, 4),
                             w * rng.uniform(0.8, 1.2),
                             h * rng.uniform(0.8, 1.2)],
                    "score": float(rng.random())})
            ann_id += 1
        for _ in range(6):  # pure false positives
            results.append({
                "image_id": img, "category_id": int(rng.integers(1, 81)),
                "bbox": [rng.uniform(0, 560), rng.uniform(0, 400),
                         rng.uniform(4, 80), rng.uniform(4, 80)],
                "score": float(rng.random() * 0.5)})
    cats = [{"id": i, "name": f"c{i}"} for i in range(1, 81)]
    ds = COCODataset({"images": images, "annotations": anns,
                      "categories": cats})
    return ds, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--numpy", action="store_true",
                    help="force the numpy fallback matcher")
    ap.add_argument("--json", help="write a stats JSON artifact here")
    args = ap.parse_args()

    t0 = time.perf_counter()
    ds, results = synth(args.images)
    t1 = time.perf_counter()
    print(f"synth: {args.images} images, {len(ds.anns)} gts, "
          f"{len(results)} dts in {t1 - t0:.1f}s")

    if args.numpy:
        import maskrcnn_tpu.evalkit.cocoeval as ce
        ce.get_evalmatch_lib = lambda: None

    ev = COCOEvaluator(ds, results, "bbox")
    t2 = time.perf_counter()
    ev.evaluate()
    t3 = time.perf_counter()
    ev.accumulate()
    t4 = time.perf_counter()
    stats = ev.summarize(verbose=False)
    t5 = time.perf_counter()
    print(f"evaluate:   {t3 - t2:7.2f}s")
    print(f"accumulate: {t4 - t3:7.2f}s")
    print(f"summarize:  {t5 - t4:7.2f}s")
    print(f"TOTAL:      {t5 - t2:7.2f}s   AP={stats[0]:.4f} "
          f"AR100={stats[8]:.4f}")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump({
                "metric": "cocoeval_bbox_seconds_val2017_scale",
                "images": args.images,
                "gts": len(ds.anns),
                "dts": len(results),
                "matcher": "numpy" if args.numpy else "native",
                "evaluate_s": round(t3 - t2, 2),
                "accumulate_s": round(t4 - t3, 2),
                "total_s": round(t5 - t2, 2),
                "ap": round(float(stats[0]), 4),
                "ar100": round(float(stats[8]), 4),
            }, f, indent=1)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
