"""Deliberately naive, independent COCO AP/AR scorer — the fuzz oracle.

A second implementation of the published COCO evaluation protocol
(https://cocodataset.org/#detection-eval, as implemented by pycocotools'
`cocoeval.py`), written scalar-first with NO shared helpers with
`maskrcnn_tpu.evalkit` — its own RLE decoder, its own IoU, its own greedy
matcher and its own accumulation. Exists solely so the production evaluator
(`evalkit/cocoeval.py`, vectorized (A,T) broadcasting + native C++ matcher)
can be property-tested against a separately-authored mind: a protocol
misunderstanding embedded in both the evaluator and its hand-made golden
fixtures would have to be independently re-invented here to survive the
fuzz corpus (VERDICT r2 missing #2).

Everything is plain Python loops over (category, image, area range, IoU
threshold, maxDet) — O(everything), intended for tiny fuzz datasets only.

Reference for the protocol being reproduced (NOT this code's source):
the reference repo scored with pycocotools
(`Sources/maskrcnn/Python/COCOEval/task.py:97-98`).
"""

from __future__ import annotations

import numpy as np

IOU_THRS = [round(0.5 + 0.05 * i, 2) for i in range(10)]
REC_THRS = [round(0.01 * i, 2) for i in range(101)]
AREA_RNGS = [(0.0, 1e10), (0.0, 32.0 ** 2),
             (32.0 ** 2, 96.0 ** 2), (96.0 ** 2, 1e10)]
MAX_DETS = [1, 10, 100]


def decode_rle(seg: dict) -> np.ndarray:
    """Uncompressed COCO RLE dict {"size": [h, w], "counts": [ints]} ->
    (h, w) uint8 mask. Column-major runs, first run counts zeros."""
    h, w = seg["size"]
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in seg["counts"]:
        if val:
            flat[pos:pos + int(c)] = 1
        pos += int(c)
        val ^= 1
    return flat.reshape(w, h).T  # column-major


def box_iou(d: list, g: list, crowd: bool) -> float:
    dx, dy, dw, dh = d
    gx, gy, gw, gh = g
    ix = max(0.0, min(dx + dw, gx + gw) - max(dx, gx))
    iy = max(0.0, min(dy + dh, gy + gh) - max(dy, gy))
    inter = ix * iy
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def mask_iou(d: np.ndarray, g: np.ndarray, crowd: bool) -> float:
    inter = float(np.logical_and(d, g).sum())
    union = float(d.sum()) if crowd else float(np.logical_or(d, g).sum())
    return inter / union if union > 0 else 0.0


def _dt_sorted(dts: list[dict]) -> list[dict]:
    # stable sort by descending score (pycocotools: mergesort on -score)
    return sorted(dts, key=lambda d: -d["score"])


def _match_one(gts: list[dict], dts: list[dict], iou_fn,
               area_rng: tuple, thr: float, iou_type: str):
    """Greedy match for one (category, image, areaRng, iouThr).

    Returns (dt_matched: list[bool], dt_ignore: list[bool],
    n_gt_nonignored: int), dts already sorted and capped by the caller.
    """
    lo, hi = area_rng
    # gts scanned non-ignored first (stable), as the protocol specifies
    g_ig = []
    for g in gts:
        ig = bool(g.get("ignore", 0)) or bool(g.get("iscrowd", 0))
        area = float(g["area"])
        g_ig.append(1 if (ig or area < lo or area > hi) else 0)
    order = sorted(range(len(gts)), key=lambda i: g_ig[i])
    gts = [gts[i] for i in order]
    g_ig = [g_ig[i] for i in order]

    gtm = [-1] * len(gts)
    dtm = [-1] * len(dts)
    dt_ig = [False] * len(dts)
    t = min(thr, 1 - 1e-10)
    for di, d in enumerate(dts):
        best = t
        m = -1
        for gi, g in enumerate(gts):
            crowd = bool(g.get("iscrowd", 0))
            if gtm[gi] != -1 and not crowd:
                continue
            # gts are ignore-last: once a non-ignored match exists, stop
            # at the first ignored gt
            if m > -1 and g_ig[m] == 0 and g_ig[gi] == 1:
                break
            iou = iou_fn(d, g)
            if iou < best:
                continue
            best = iou
            m = gi
        if m == -1:
            continue
        dt_ig[di] = bool(g_ig[m])
        dtm[di] = m
        gtm[m] = di
    for di, d in enumerate(dts):
        if dtm[di] == -1:
            a = d["_area"]
            if a < lo or a > hi:
                dt_ig[di] = True
    matched = [m_ != -1 for m_ in dtm]
    n_gt = sum(1 for ig in g_ig if ig == 0)
    return matched, dt_ig, n_gt


def evaluate_brute(dataset_dict: dict, results: list[dict],
                   iou_type: str = "bbox") -> np.ndarray:
    """Full 12-stat COCO summary vector, brute force.

    dataset_dict: raw COCO-format dict {"images", "annotations",
    "categories"}; results: standard results list.
    """
    images = {im["id"]: im for im in dataset_dict["images"]}
    img_ids = sorted(images)
    cat_ids = sorted(c["id"] for c in dataset_dict["categories"])

    gts_by = {}
    for a in dataset_dict["annotations"]:
        gts_by.setdefault((a["category_id"], a["image_id"]), []).append(a)
    dts_by = {}
    for r in results:
        dts_by.setdefault((r["category_id"], r["image_id"]), []).append(r)

    # Precompute per-dt area + decoded masks; mask decoding is the only
    # shape-dependent work.
    def prep(cat, img):
        gts = gts_by.get((cat, img), [])
        dts = _dt_sorted(dts_by.get((cat, img), []))[: max(MAX_DETS)]
        if iou_type == "bbox":
            for d in dts:
                d["_area"] = float(d["bbox"][2]) * float(d["bbox"][3])

            def iou_fn(d, g):
                return box_iou(d["bbox"], g["bbox"],
                               bool(g.get("iscrowd", 0)))
        else:
            for d in dts:
                d["_m"] = decode_rle(d["segmentation"])
                d["_area"] = float(d["_m"].sum())
            for g in gts:
                g["_m"] = decode_rle(g["segmentation"])

            def iou_fn(d, g):
                return mask_iou(d["_m"], g["_m"],
                                bool(g.get("iscrowd", 0)))
        return gts, dts, iou_fn

    def memoized(fn):
        # IoU depends only on (dt, gt) — cache across the (A, T, M) sweep
        # (a speed memo only; the protocol logic stays fully scalar)
        cache = {}

        def wrapped(d, g):
            key = (id(d), id(g))
            if key not in cache:
                cache[key] = fn(d, g)
            return cache[key]
        return wrapped

    prepped = {}
    for c in cat_ids:
        for i in img_ids:
            gts, dts, iou_fn = prep(c, i)
            prepped[(c, i)] = (gts, dts, memoized(iou_fn))

    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(AREA_RNGS), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))

    for ki, cat in enumerate(cat_ids):
        for ai, rng in enumerate(AREA_RNGS):
            for mi, max_det in enumerate(MAX_DETS):
                # concatenate per-image matches in image-id order
                all_scores, all_matched, all_ig = [], [], []
                npig = 0
                for img in img_ids:
                    gts, dts, iou_fn = prepped[(cat, img)]
                    dts_m = dts[:max_det]
                    per_thr_matched, per_thr_ig = [], []
                    for thr in IOU_THRS:
                        mt, ig, n_gt = _match_one(
                            gts, dts_m, iou_fn, rng, thr, iou_type)
                        per_thr_matched.append(mt)
                        per_thr_ig.append(ig)
                    npig += n_gt
                    all_scores.extend(d["score"] for d in dts_m)
                    all_matched.append(np.asarray(per_thr_matched, bool)
                                       .reshape(T, len(dts_m)))
                    all_ig.append(np.asarray(per_thr_ig, bool)
                                  .reshape(T, len(dts_m)))
                if npig == 0:
                    continue
                scores = np.asarray(all_scores, float)
                order = np.argsort(-scores, kind="mergesort")
                matched = np.concatenate(all_matched, axis=1)[:, order]
                ig = np.concatenate(all_ig, axis=1)[:, order]

                for ti in range(T):
                    tp = np.cumsum(matched[ti] & ~ig[ti]).astype(float)
                    fp = np.cumsum(~matched[ti] & ~ig[ti]).astype(float)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / np.maximum(tp + fp, np.spacing(1))
                    recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                    q = np.zeros(R)
                    # monotone non-increasing envelope, scanned backwards
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[ti, :, ki, ai, mi] = q

    def summ(ap, thr=None, area_i=0, max_det=100):
        mi = MAX_DETS.index(max_det)
        if ap:
            s = precision if thr is None else precision[
                [IOU_THRS.index(thr)]]
            s = s[:, :, :, area_i, mi]
        else:
            s = recall if thr is None else recall[[IOU_THRS.index(thr)]]
            s = s[:, :, area_i, mi]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    return np.array([
        summ(True), summ(True, thr=0.5), summ(True, thr=0.75),
        summ(True, area_i=1), summ(True, area_i=2), summ(True, area_i=3),
        summ(False, max_det=1), summ(False, max_det=10),
        summ(False, max_det=100),
        summ(False, area_i=1), summ(False, area_i=2),
        summ(False, area_i=3),
    ])
