"""User-facing detector: load → jit once → detect → unmold.

The TPU equivalent of the reference's app-side flow (SURVEY.md §3.1):
Vision request + Core ML evaluation + `Detection.detectionsFromFeatureValue`
decoding (`Sources/Mask-RCNN-CoreML/Detection.swift:23-62`) collapses into a
persistent jitted pipeline plus host-side unmolding of normalized outputs
back to original-image pixel space (boxes and full-resolution masks).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn
from maskrcnn_tpu.pipeline.preprocess import LetterboxWindow


@dataclasses.dataclass
class Detection:
    """One decoded instance — the analog of the reference's `Detection`
    struct (`Detection.swift:14-21`): pixel box in the ORIGINAL image frame,
    class id, score, and (optionally) a full-size boolean mask."""
    box: tuple[float, float, float, float]  # (y1, x1, y2, x2) pixels
    class_id: int
    score: float
    mask: np.ndarray | None = None  # (orig_h, orig_w) bool, if pasted
    #: COCO RLE dict {"size": [h, w], "counts": str} when unmolded with
    #: paste_masks="rle" — O(box area) instead of a full canvas per
    #: detection (the eval/serve path; full canvases at val2017 scale are
    #: ~30 GB live and dominate results-construction wall time).
    rle: dict | None = None


class MaskRCNNDetector:
    """Persistent compiled pipeline over a fixed config.

    Usage:
        det = MaskRCNNDetector(config, params)      # or .from_checkpoint()
        results = det.detect_images([img1, img2])   # list of list[Detection]
    """

    def __init__(self, config: MaskRCNNConfig, params: dict[str, Any],
                 mask_threshold: float = 0.5, data_parallel: int = 0):
        """`data_parallel`: shard inference batches over this many local
        devices (0 = single device, -1 = all). Params/anchors are
        replicated once; XLA needs no cross-image collectives (SURVEY.md §2
        parallelism inventory), so throughput scales linearly over ICI."""
        self.config = config
        self.params = params
        self.mask_threshold = mask_threshold
        self.anchors = jnp.asarray(generate_anchors(config))
        self._mesh = None
        if data_parallel:
            from maskrcnn_tpu.parallel.mesh import make_mesh, replicate
            n = len(jax.devices()) if data_parallel < 0 else data_parallel
            self._mesh = make_mesh(n)
            self.params = replicate(self._mesh, self.params)
            self.anchors = replicate(self._mesh, self.anchors)

    @classmethod
    def from_random(cls, config: MaskRCNNConfig, seed: int = 0):
        return cls(config, init_mask_rcnn(jax.random.PRNGKey(seed), config))

    @classmethod
    def from_checkpoint(cls, config: MaskRCNNConfig, path: str):
        from maskrcnn_tpu.io.weights import (
            load_h5_weights, load_npz_checkpoint, merge_pretrained)
        init = init_mask_rcnn(jax.random.PRNGKey(0), config)
        loaded = (load_npz_checkpoint(path) if path.endswith(".npz")
                  else load_h5_weights(path))
        params, _, _ = merge_pretrained(init, loaded)
        return cls(config, params)

    # --- device step -------------------------------------------------------

    def run_batch(self, images: np.ndarray | jnp.ndarray,
                  paste_size: int | None = None) -> dict[str, Any]:
        """(B, S, S, 3) RGB [0,255] letterboxed batch -> raw padded outputs
        (normalized coords, on device; batch-sharded when data-parallel).

        `paste_size`: also emit full-resolution uint8 masks pasted ON DEVICE
        inside the same compiled program (`out["pasted"]`) — the streaming
        path's zero-extra-dispatch mask pasting."""
        if self._mesh is not None:
            return self._run_batch_dp(images, paste_size)
        return forward(self.params, jnp.asarray(images), self.anchors,
                       self.config, paste_size=paste_size)

    def _run_batch_dp(self, images, paste_size=None) -> dict[str, Any]:
        from maskrcnn_tpu.parallel.mesh import (data_parallel_forward,
                                                shard_batch)

        n = self._mesh.devices.size
        b = images.shape[0]
        pad = (-b) % n
        if pad:  # keep the per-device shape static and equal
            images = np.asarray(images)
            # pad in the batch's OWN dtype — float32 zeros would promote
            # a uint8_wire batch back to f32 and silently defeat the
            # 4x-smaller transfer the caller asked for
            images = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]), images.dtype)])
        out = data_parallel_forward(self._mesh, self.config, self.params,
                                    shard_batch(self._mesh, images),
                                    self.anchors, paste_size=paste_size)
        if pad:
            out = {k: v[:b] for k, v in out.items()}
        return out

    # --- host decode -------------------------------------------------------

    def detect_images(self, images: Sequence[np.ndarray],
                      paste_masks: bool | str = True,
                      batch_size: int | None = None,
                      uint8_wire: bool = False) -> list[list[Detection]]:
        """Arbitrary-size RGB uint8 images -> per-image decoded detections.

        `paste_masks`: True -> full-canvas boolean masks (demo/render);
        "rle" -> COCO RLE dicts only, O(box area) per detection (eval/
        serve); False -> boxes only.

        `batch_size` pads the final chunk so only ONE jit program is compiled
        per configured size (None = one batch of len(images)).
        `uint8_wire`: see `detect_canvases`."""
        if not images:
            return []
        from maskrcnn_tpu.pipeline.loader import letterbox_rgb

        size = self.config.image_height
        canvases, windows = [], []
        for img in images:
            canvas, win = letterbox_rgb(img, size)  # native C++ resample
            canvases.append(canvas)
            windows.append(win)
        return self.detect_canvases(canvases, windows,
                                    paste_masks=paste_masks,
                                    batch_size=batch_size,
                                    uint8_wire=uint8_wire)

    def detect_canvases(self, canvases: Sequence[np.ndarray],
                        windows: Sequence[LetterboxWindow],
                        paste_masks: bool | str = True,
                        batch_size: int | None = None,
                        uint8_wire: bool = False) -> list[list[Detection]]:
        """Pre-letterboxed (S, S, 3) float32 canvases (e.g. from
        `pipeline.loader`) -> per-image decoded detections.

        `uint8_wire`: quantize canvases to uint8 before the host->device
        transfer (±0.5 LSB; the reference feeds uint8 frames to CoreML) —
        4× fewer wire bytes, and the recommended setting for long-running
        or large-batch use over the axon tunnel, whose client retains
        ~every transferred byte (PERF.md r04)."""
        if not canvases:
            return []
        if uint8_wire:
            from maskrcnn_tpu.pipeline.preprocess import quantize_canvas_u8
            canvases = [quantize_canvas_u8(c) for c in canvases]
        results: list[list[Detection]] = []
        bs = batch_size or len(canvases)
        for start in range(0, len(canvases), bs):
            chunk = list(canvases[start:start + bs])
            n_real = len(chunk)
            while len(chunk) < bs:  # pad tail to keep the shape static
                chunk.append(np.zeros_like(chunk[0]))
            out = self.run_batch(np.stack(chunk))
            det = np.asarray(out["detections"])
            masks = np.asarray(out["masks"])
            valid = np.asarray(out["valid"])
            for i in range(n_real):
                results.append(self.unmold(
                    det[i], masks[i], valid[i], windows[start + i],
                    paste_masks=paste_masks))
        return results

    def unmold(self, detections: np.ndarray, masks: np.ndarray,
               valid: np.ndarray, win: LetterboxWindow,
               paste_masks: bool | str = True) -> list[Detection]:
        """Map padded normalized outputs back to original image space.

        Inverse of the letterbox: normalized canvas coords -> canvas pixels
        -> minus window offset -> divided by scale. Masks follow the
        reference's decode path semantics (`Detection.swift:83-98` produces a
        28x28 image scaled into the box) but paste at full resolution with a
        0.5 threshold, which is what the Matterport/TF oracle does.
        """
        size = self.config.image_height
        s = size - 1
        results: list[Detection] = []
        for row, mask, ok in zip(detections, masks, valid):
            if not ok:
                continue
            y1, x1, y2, x2, class_id, score = row
            # normalized -> canvas pixels (Matterport denorm convention)
            cy1, cx1 = y1 * s, x1 * s
            cy2, cx2 = y2 * s + 1, x2 * s + 1
            # canvas -> original image pixels
            oy1 = (cy1 - win.y1) / win.scale
            ox1 = (cx1 - win.x1) / win.scale
            oy2 = (cy2 - win.y1) / win.scale
            ox2 = (cx2 - win.x1) / win.scale
            oy1 = float(np.clip(oy1, 0, win.orig_height))
            oy2 = float(np.clip(oy2, 0, win.orig_height))
            ox1 = float(np.clip(ox1, 0, win.orig_width))
            ox2 = float(np.clip(ox2, 0, win.orig_width))
            full = None
            rle = None
            shape = (win.orig_height, win.orig_width)
            if paste_masks == "rle":
                from maskrcnn_tpu.evalkit import mask_rle as M
                region, ry, rx = paste_mask_region(
                    mask, (oy1, ox1, oy2, ox2), shape, self.mask_threshold)
                r = M.encode_region(region, ry, rx, *shape)
                rle = {"size": [shape[0], shape[1]],
                       "counts": M.to_coco_counts(r)}
            elif paste_masks:
                full = paste_mask(mask, (oy1, ox1, oy2, ox2), shape,
                                  self.mask_threshold)
            results.append(Detection(
                box=(oy1, ox1, oy2, ox2),
                class_id=int(class_id), score=float(score), mask=full,
                rle=rle))
        return results


def paste_window(box, image_shape) -> tuple[int, int, int, int]:
    """The clipped integer rectangle the paste writes: (yy1, xx1, yy2, xx2),
    with the same nearbyint/max/min arithmetic as the native core."""
    oy1, ox1, oy2, ox2 = box
    y0, x0 = int(np.rint(oy1)), int(np.rint(ox1))
    bh = max(int(np.rint(oy2)) - y0, 1)
    bw = max(int(np.rint(ox2)) - x0, 1)
    return (max(y0, 0), max(x0, 0),
            min(y0 + bh, image_shape[0]), min(x0 + bw, image_shape[1]))


def paste_mask_region(mask: np.ndarray, box, image_shape,
                      threshold: float = 0.5
                      ) -> tuple[np.ndarray, int, int]:
    """Like `paste_mask` but returns only the clipped box region:
    ((yy2-yy1, xx2-xx1) bool, yy1, xx1). The canvas is zero everywhere
    else, so consumers (RLE encode via `mask_rle.encode_region`) never
    materialize or scan the full image — O(box area) per detection."""
    yy1, xx1, yy2, xx2 = paste_window(box, image_shape)
    if yy1 >= yy2 or xx1 >= xx2:
        return np.zeros((0, 0), bool), yy1, xx1

    from maskrcnn_tpu.native import get_imageio_lib

    lib = get_imageio_lib()
    if lib is not None:
        import ctypes

        m = np.ascontiguousarray(mask, np.float32)
        region = np.empty((yy2 - yy1, xx2 - xx1), np.uint8)
        rc = lib.img_paste_mask_region(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m.shape[0],
            float(box[0]), float(box[1]), float(box[2]), float(box[3]),
            image_shape[0], image_shape[1], float(threshold),
            region.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            xx2 - xx1)
        if rc == 0:
            return region.view(bool), yy1, xx1

    full = paste_mask(mask, box, image_shape, threshold)
    return full[yy1:yy2, xx1:xx2], yy1, xx1


def paste_mask(mask: np.ndarray, box, image_shape, threshold: float = 0.5
               ) -> np.ndarray:
    """Scale a (m, m) soft mask into its box and paste into a full-size
    boolean canvas (Matterport `unmold_mask` semantics).

    Native C++ fast path (~30x: this runs once per detection on the host and
    dominated COCO-eval wall time at 3.2 ms/mask under PIL); falls back to
    the PIL resample it replicates."""
    from maskrcnn_tpu.native import get_imageio_lib

    lib = get_imageio_lib()
    if lib is not None:
        import ctypes

        m = np.ascontiguousarray(mask, np.float32)
        canvas = np.empty(image_shape, np.uint8)
        rc = lib.img_paste_mask(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m.shape[0],
            float(box[0]), float(box[1]), float(box[2]), float(box[3]),
            image_shape[0], image_shape[1], float(threshold),
            canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc == 0:
            return canvas.view(bool)

    from PIL import Image

    oy1, ox1, oy2, ox2 = box
    h = max(int(round(oy2)) - int(round(oy1)), 1)
    w = max(int(round(ox2)) - int(round(ox1)), 1)
    y0, x0 = int(round(oy1)), int(round(ox1))

    resized = Image.fromarray((mask * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR)
    resized = np.asarray(resized, np.float32) / 255.0

    canvas = np.zeros(image_shape, bool)
    yy1, xx1 = max(y0, 0), max(x0, 0)
    yy2 = min(y0 + h, image_shape[0])
    xx2 = min(x0 + w, image_shape[1])
    canvas[yy1:yy2, xx1:xx2] = (
        resized[yy1 - y0:yy2 - y0, xx1 - x0:xx2 - x0] >= threshold)
    return canvas
