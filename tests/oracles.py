"""Pure-numpy oracle implementations of the reference's algorithms.

Each function is a direct, scalar-loop transcription of the documented
semantics of the reference Swift code (file:line cited per function), used
only to validate the vectorized JAX/Pallas implementations in unit tests.
"""

from __future__ import annotations

import numpy as np


def oracle_apply_box_deltas(boxes: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """Reference `BoxReference.applyBoxDeltas` (BoxUtils.swift:32-70)."""
    boxes = boxes.astype(np.float32).copy()
    out = np.empty_like(boxes)
    for i in range(boxes.shape[0]):
        y1, x1, y2, x2 = boxes[i]
        dy, dx, dh, dw = deltas[i].astype(np.float32)
        height = y2 - y1
        width = x2 - x1
        cy = y1 + 0.5 * height + dy * height
        cx = x1 + 0.5 * width + dx * width
        height = height * np.exp(dh)
        width = width * np.exp(dw)
        ny1 = cy - 0.5 * height
        nx1 = cx - 0.5 * width
        out[i] = (ny1, nx1, ny1 + height, nx1 + width)
    return out


def oracle_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Reference `IOU` (Utils.swift:232-246): 0 for non-positive areas."""
    ah = a[2] - a[0]
    aw = a[3] - a[1]
    bh = b[2] - b[0]
    bw = b[3] - b[1]
    area_a = ah * aw
    area_b = bh * bw
    if area_a <= 0 or area_b <= 0:
        return 0.0
    iy1 = max(a[0], b[0])
    ix1 = max(a[1], b[1])
    iy2 = min(a[2], b[2])
    ix2 = min(a[3], b[3])
    inter = max(iy2 - iy1, 0) * max(ix2 - ix1, 0)
    return float(inter / (area_a + area_b - inter))


def oracle_nms(
    boxes: np.ndarray,
    indices: list[int],
    iou_threshold: float,
    max_out: int,
) -> list[int]:
    """Reference greedy `nonMaxSupression` (Utils.swift:185-218).

    `indices` iterates candidate boxes in priority (descending-score) order;
    zero-area boxes are skipped; selection stops at `max_out`.
    """
    selected: list[int] = []
    for index in indices:
        if len(selected) >= max_out:
            return selected
        a = boxes[index]
        should = (a[3] - a[1]) > 0 and (a[2] - a[0]) > 0
        if should:
            for j in selected:
                if oracle_iou(a, boxes[j]) > iou_threshold:
                    should = False
                    break
        if should:
            selected.append(index)
    return selected


def oracle_crop_and_resize(
    image: np.ndarray,
    box: np.ndarray,
    crop_size: tuple[int, int],
) -> np.ndarray:
    """`tf.image.crop_and_resize` semantics for one (H,W,C) image and one
    normalized y1x1y2x2 box — the reference's correctness oracle for pyramid
    ROIAlign is the TF comparison path (SURVEY.md §7 "hard parts" #2), whose
    sampling grid is: y = y1*(H-1) + i * (y2-y1)*(H-1)/(crop_h-1), bilinear,
    out-of-range samples -> 0.
    """
    h, w, c = image.shape
    ch, cw = crop_size
    y1, x1, y2, x2 = [float(v) for v in box]
    out = np.zeros((ch, cw, c), dtype=np.float32)
    for i in range(ch):
        if ch > 1:
            y = y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (ch - 1)
        else:
            y = 0.5 * (y1 + y2) * (h - 1)
        if y < 0 or y > h - 1:
            continue
        y0 = int(np.floor(y))
        y1i = min(y0 + 1, h - 1)
        wy = y - y0
        for j in range(cw):
            if cw > 1:
                x = x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (cw - 1)
            else:
                x = 0.5 * (x1 + x2) * (w - 1)
            if x < 0 or x > w - 1:
                continue
            x0 = int(np.floor(x))
            x1i = min(x0 + 1, w - 1)
            wx = x - x0
            top = image[y0, x0] * (1 - wx) + image[y0, x1i] * wx
            bot = image[y1i, x0] * (1 - wx) + image[y1i, x1i] * wx
            out[i, j] = top * (1 - wy) + bot * wy
    return out
