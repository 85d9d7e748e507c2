"""COCO-style AP/AR evaluation (bbox + segm), pycocotools-compatible.

The reference delegated scoring to pycocotools inside a Docker container
(`Sources/maskrcnn/Python/COCOEval/task.py:93-98`); this is an in-process
from-scratch implementation of the same published evaluation protocol:
greedy score-ordered matching per (category, IoU threshold, area range,
maxDets), crowd/ignore handling, 101-point interpolated precision, and the
standard 12-number summary. Mask IoU runs on the native RLE core.

Detection results use the standard COCO results-list format:
    {"image_id", "category_id", "bbox": [x,y,w,h], "score",
     "segmentation": {"size": [h,w], "counts": str}}   # segm only
"""

from __future__ import annotations

import numpy as np

from maskrcnn_tpu.evalkit import mask_rle as M
from maskrcnn_tpu.evalkit.coco import COCODataset

IOU_THRS = np.round(np.arange(0.5, 0.951, 0.05), 2)      # 10 thresholds
REC_THRS = np.round(np.arange(0.0, 1.001, 0.01), 2)      # 101 recall points
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _img_ious(dataset: COCODataset, results_by_img, img_id, cat_id,
              iou_type: str):
    """Returns (gts, dts, ious, dt_areas) — detection area follows
    pycocotools' loadRes convention: bbox area for bbox eval, MASK area for
    segm eval (a segm-only results file need not carry a bbox at all)."""
    gts = [a for a in dataset.annotations_for(img_id)
           if int(a["category_id"]) == cat_id]
    dts = [d for d in results_by_img.get(img_id, [])
           if int(d["category_id"]) == cat_id]
    dts = sorted(dts, key=lambda d: -d["score"])
    if not gts and not dts:
        return gts, dts, np.zeros((0, 0)), []
    iscrowd = [bool(g.get("iscrowd", 0)) for g in gts]
    if iou_type == "bbox":
        dt_areas = [float(d["bbox"][2]) * float(d["bbox"][3]) for d in dts]
        ious = M.iou_boxes(
            np.asarray([d["bbox"] for d in dts], float).reshape(-1, 4),
            np.asarray([g["bbox"] for g in gts], float).reshape(-1, 4),
            iscrowd)
    else:
        im = dataset.images[img_id]
        g_rle = [M.from_coco_segmentation(g["segmentation"], im.height,
                                          im.width) for g in gts]
        d_rle = [M.from_coco_segmentation(d["segmentation"], im.height,
                                          im.width) for d in dts]
        dt_areas = [float(M.area(r)) for r in d_rle]
        ious = M.iou_masks(d_rle, g_rle, iscrowd)
    return gts, dts, ious, dt_areas


def _evaluate_img(gts, dts, ious, dt_areas, area_rng, max_det):
    """Greedy matching for one (image, category): returns per-dt match /
    ignore flags for every IoU threshold plus gt ignore flags."""
    t_n = len(IOU_THRS)
    g_n = len(gts)

    g_ignore = np.asarray([
        bool(g.get("iscrowd", 0))
        or not (area_rng[0] <= g.get("area", _ann_area(g)) < area_rng[1])
        for g in gts], bool)
    # process non-ignored gts first (pycocotools sorts by ignore flag)
    g_order = np.argsort(g_ignore, kind="stable")

    dts = dts[:max_det]
    d_n = len(dts)
    dtm = np.zeros((t_n, d_n), np.int64) - 1   # matched gt (original index)
    gtm = np.zeros((t_n, g_n), np.int64) - 1
    for ti, thr in enumerate(IOU_THRS):
        for di in range(d_n):
            best_iou = min(thr, 1 - 1e-10)
            best_g = -1
            for g_pos in g_order:
                if gtm[ti, g_pos] >= 0 and not gts[g_pos].get("iscrowd", 0):
                    continue
                # past the best non-ignored match, stop at ignored gts
                if (best_g >= 0 and not g_ignore[best_g]
                        and g_ignore[g_pos]):
                    break
                if ious[di, g_pos] < best_iou:
                    continue
                best_iou = ious[di, g_pos]
                best_g = g_pos
            if best_g >= 0:
                dtm[ti, di] = best_g
                gtm[ti, best_g] = di

    a0, a1 = area_rng
    d_out_of_range = np.asarray(
        [not (a0 <= a < a1) for a in dt_areas[:max_det]], bool)
    d_ignore = np.zeros((t_n, d_n), bool)
    for ti in range(t_n):
        matched = dtm[ti] >= 0
        matched_ignored = np.zeros(d_n, bool)
        matched_ignored[matched] = g_ignore[dtm[ti][matched]]
        d_ignore[ti] = matched_ignored | (~matched & d_out_of_range)

    scores = np.asarray([d["score"] for d in dts], float)
    return {
        "dtm": dtm, "d_ignore": d_ignore, "scores": scores,
        "n_gt": int((~g_ignore).sum()),
    }


def _ann_area(g):
    b = g.get("bbox", [0, 0, 0, 0])
    return float(b[2] * b[3])


class COCOEvaluator:
    """evaluate() -> accumulate() -> summarize(), like pycocotools."""

    def __init__(self, dataset: COCODataset, results: list[dict],
                 iou_type: str = "bbox",
                 img_ids: list[int] | None = None):
        assert iou_type in ("bbox", "segm")
        self.dataset = dataset
        self.iou_type = iou_type
        self.img_ids = sorted(img_ids if img_ids is not None
                              else dataset.images)
        self.cat_ids = dataset.sorted_category_ids
        self.results_by_img: dict[int, list[dict]] = {}
        for r in results:
            self.results_by_img.setdefault(int(r["image_id"]), []).append(r)
        self._evals = None
        self.stats: np.ndarray | None = None
        self.precision = None
        self.recall = None

    def evaluate(self):
        evals = {}
        for cat in self.cat_ids:
            for img in self.img_ids:
                gts, dts, ious, dt_areas = _img_ious(
                    self.dataset, self.results_by_img, img, cat,
                    self.iou_type)
                if not gts and not dts:
                    continue
                for aname, arng in AREA_RNG.items():
                    evals[(cat, img, aname)] = _evaluate_img(
                        gts, dts, ious, dt_areas, arng, max(MAX_DETS))
        self._evals = evals
        return self

    def accumulate(self):
        if self._evals is None:
            self.evaluate()
        t_n, r_n = len(IOU_THRS), len(REC_THRS)
        k_n, a_n, m_n = len(self.cat_ids), len(AREA_RNG), len(MAX_DETS)
        precision = -np.ones((t_n, r_n, k_n, a_n, m_n))
        recall = -np.ones((t_n, k_n, a_n, m_n))

        for ki, cat in enumerate(self.cat_ids):
            for ai, aname in enumerate(AREA_RNG):
                per_img = [self._evals[(cat, img, aname)]
                           for img in self.img_ids
                           if (cat, img, aname) in self._evals]
                if not per_img:
                    continue
                n_gt = sum(e["n_gt"] for e in per_img)
                for mi, max_det in enumerate(MAX_DETS):
                    scores = np.concatenate(
                        [e["scores"][:max_det] for e in per_img])
                    order = np.argsort(-scores, kind="mergesort")
                    if n_gt == 0:
                        continue
                    tps, fps = [], []
                    for e in per_img:
                        m = e["dtm"][:, :max_det]
                        ig = e["d_ignore"][:, :max_det]
                        tps.append((m >= 0) & ~ig)
                        fps.append((m < 0) & ~ig)
                    tp = np.concatenate(tps, axis=1)[:, order]
                    fp = np.concatenate(fps, axis=1)[:, order]
                    tp_cum = np.cumsum(tp, axis=1).astype(float)
                    fp_cum = np.cumsum(fp, axis=1).astype(float)
                    for ti in range(t_n):
                        tpc, fpc = tp_cum[ti], fp_cum[ti]
                        rc = tpc / n_gt
                        pr = tpc / np.maximum(tpc + fpc, np.spacing(1))
                        recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                        # monotone-decreasing interpolation from the right
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(r_n)
                        for rj, pi in enumerate(inds):
                            if pi < len(pr):
                                q[rj] = pr[pi]
                        precision[ti, :, ki, ai, mi] = q
        self.precision = precision
        self.recall = recall
        return self

    def _summary(self, ap=True, iou_thr=None, area="all", max_det=100):
        ai = list(AREA_RNG).index(area)
        mi = MAX_DETS.index(max_det)
        if ap:
            s = self.precision
            if iou_thr is not None:
                ti = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                s = s[ti]
            s = s[:, :, :, ai, mi]
        else:
            s = self.recall
            if iou_thr is not None:
                ti = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                s = s[ti]
            s = s[:, :, ai, mi]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    def summarize(self, verbose: bool = True) -> np.ndarray:
        if self.precision is None:
            self.accumulate()
        stats = np.array([
            self._summary(True),
            self._summary(True, iou_thr=0.5),
            self._summary(True, iou_thr=0.75),
            self._summary(True, area="small"),
            self._summary(True, area="medium"),
            self._summary(True, area="large"),
            self._summary(False, max_det=1),
            self._summary(False, max_det=10),
            self._summary(False, max_det=100),
            self._summary(False, area="small"),
            self._summary(False, area="medium"),
            self._summary(False, area="large"),
        ])
        self.stats = stats
        if verbose:
            names = [
                "AP @[0.50:0.95]", "AP @0.50", "AP @0.75",
                "AP small", "AP medium", "AP large",
                "AR maxDets=1", "AR maxDets=10", "AR maxDets=100",
                "AR small", "AR medium", "AR large",
            ]
            t = self.iou_type
            for n, v in zip(names, stats):
                print(f"  [{t}] {n:<16} = {v:.3f}")
        return stats
