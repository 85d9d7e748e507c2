"""COCO training data loader: images + padded GT batches.

Host-side analog of the preprocessing the reference's comparison path does
inside `Mask-RCNN-Keras` (`COCOEval/task.py:99-105` calls
`coco_dataset.preprocess(...)`): letterbox the image to the square network
input, transform GT boxes into normalized canvas coordinates, and convert
instance segmentations into fixed-size box-relative mini-masks. Everything
is padded to `max_instances` so batches are static-shape for jit.
"""

from __future__ import annotations

import os

import numpy as np

from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.evalkit import mask_rle as M
from maskrcnn_tpu.evalkit.coco import COCODataset


def minimask_from_annotation(ann, image_h: int, image_w: int,
                             mask_size: int) -> np.ndarray:
    """COCO segmentation -> (mask_size, mask_size) box-relative mini-mask."""
    from PIL import Image

    rle = M.from_coco_segmentation(ann["segmentation"], image_h, image_w)
    full = M.decode(rle)
    x, y, w, h = [int(round(v)) for v in ann["bbox"]]
    x2 = min(x + max(w, 1), image_w)
    y2 = min(y + max(h, 1), image_h)
    x, y = max(x, 0), max(y, 0)
    crop = full[y:y2, x:x2]
    if crop.size == 0:
        return np.zeros((mask_size, mask_size), np.float32)
    resized = Image.fromarray(crop * 255).resize(
        (mask_size, mask_size), Image.BILINEAR)
    return (np.asarray(resized, np.float32) / 255.0 >= 0.5).astype(np.float32)


class COCOTrainLoader:
    """Random-order batch provider over a COCO-format dataset directory.

    `flip_prob`: probability of horizontal-flip augmentation per example
    (Matterport's standard fine-tuning augmentation, Fliplr(0.5)) — the
    canvas, normalized boxes, and mini-masks flip together; mini-masks are
    box-relative, so flipping the mask array alone stays consistent.

    `cache_images`: keep up to N decoded pre-flip examples (letterboxed
    canvas + padded GT arrays) in host RAM, keyed by image id. Small
    fine-tuning datasets are re-decoded every epoch otherwise — on a
    1-core host the JPEG decode + resample (~0.4 s per 1024² image)
    dominates the whole training step (measured 3.96 s/step vs 0.43 s of
    device compute on the 32-image flagship proof). ~3.2 MB per cached
    1024² example (uint8 canvas; 12.6 MB at float32); 0 disables.

    `image_dtype`: canvas dtype handed to the device. uint8 (default)
    quantizes the resampled canvas (±0.5 LSB, below augmentation noise)
    for 4x less transfer — see the leak note in `_load_raw`; float32
    keeps exact resample values (the --exact training path).
    """

    def __init__(self, annotations_path: str, images_dir: str,
                 config: MaskRCNNConfig, batch_size: int = 2,
                 max_instances: int = 32, seed: int = 0,
                 flip_prob: float = 0.5, cache_images: int = 0,
                 image_dtype=np.uint8):
        self.dataset = COCODataset.from_file(annotations_path)
        self.images_dir = images_dir
        self.config = config
        self.batch_size = batch_size
        self.max_instances = max_instances
        self.flip_prob = flip_prob
        self.cache_images = cache_images
        self.image_dtype = np.dtype(image_dtype)
        self._cache: dict[int, tuple] = {}
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.image_ids = [
            im.id for im in self.dataset.iter_images()
            if self.dataset.annotations_for(im.id)]
        if not self.image_ids:
            raise ValueError("dataset has no annotated images")

    def load_example(self, image_id: int, flip: bool = False):
        if self.cache_images:
            raw = self._cache.get(image_id)
            if raw is None:
                raw = self._load_raw(image_id)
                if len(self._cache) < self.cache_images:
                    self._cache[image_id] = raw
            # hand out copies — the flip path mutates boxes in place, and
            # callers own what they get (a ~2 ms memcpy vs a 400 ms decode)
            canvas, boxes, classes, masks = (a.copy() for a in raw)
        else:
            canvas, boxes, classes, masks = self._load_raw(image_id)
        if flip:
            canvas = canvas[:, ::-1].copy()
            # flip every REAL instance (crowds are negative), including
            # boxes degenerate to <= 1 canvas px — padding rows stay zero
            real = classes != 0
            fx1 = 1.0 - boxes[:, 3]
            fx2 = 1.0 - boxes[:, 1]
            boxes[real, 1] = fx1[real]
            boxes[real, 3] = fx2[real]
            masks = masks[:, :, ::-1].copy()
        return canvas, boxes, classes, masks

    def _load_raw(self, image_id: int):
        """Decode + letterbox + GT arrays for one example, no augmentation."""
        from maskrcnn_tpu.pipeline.loader import load_letterboxed

        im = self.dataset.images[image_id]
        path = os.path.join(self.images_dir, im.file_name)
        size = self.config.image_height
        canvas, win = load_letterboxed(path, size)  # native decode+resample
        if self.image_dtype == np.uint8:
            # Round the resampled canvas to uint8: 4x fewer host->device
            # bytes per step (the model's preprocess consumes RGB [0,255]
            # of any dtype), and ±0.5 LSB of resample precision is far
            # below augmentation noise — the reference feeds uint8 frames
            # to CoreML (`EvaluateCommand.swift:159-165`). Also the
            # mitigation for the axon-tunnel host-memory leak: the plugin
            # retains ~every transferred byte (measured 96 MB/step at f32
            # batch 8, OOM at step ~1250 of the r04 flagship proof; uint8
            # stretches the same budget 4x). float32 keeps exact values
            # (--exact uses it).
            from maskrcnn_tpu.pipeline.preprocess import quantize_canvas_u8
            canvas = quantize_canvas_u8(canvas)

        g = self.max_instances
        boxes = np.zeros((g, 4), np.float32)
        classes = np.zeros((g,), np.int32)
        masks = np.zeros((g, self.config.mask_size, self.config.mask_size),
                         np.float32)
        s = size - 1
        anns = self.dataset.annotations_for(image_id)[:g]
        for i, ann in enumerate(anns):
            x, y, w, h = ann["bbox"]
            # original pixels -> canvas pixels -> normalized (Matterport
            # norm convention, matching core/anchors.norm_boxes)
            cy1 = y * win.scale + win.y1
            cx1 = x * win.scale + win.x1
            cy2 = (y + h) * win.scale + win.y1
            cx2 = (x + w) * win.scale + win.x1
            boxes[i] = [cy1 / s, cx1 / s, (cy2 - 1) / s, (cx2 - 1) / s]
            cls = self.dataset.class_id_for_category(ann["category_id"])
            if ann.get("iscrowd", 0):
                # Crowd regions carry NEGATIVE class ids: excluded from
                # matching, and overlapping anchors/proposals become neutral
                # instead of hard negatives (see train/targets.py).
                classes[i] = -cls
                continue
            classes[i] = cls
            if "segmentation" in ann:
                masks[i] = minimask_from_annotation(
                    ann, im.height, im.width, self.config.mask_size)
        return canvas, boxes, classes, masks

    def get_batch(self, step: int | None = None) -> dict[str, np.ndarray]:
        # Batch composition is a pure function of (seed, step): a resumed
        # run at step S draws exactly the batch an uninterrupted run would
        # have drawn, instead of replaying the epoch from the start
        # (ADVICE r03). Stateful fallback only when no step is supplied.
        rng = (self.rng if step is None
               else np.random.default_rng((self.seed, step)))
        ids = rng.choice(self.image_ids, self.batch_size,
                         replace=len(self.image_ids) < self.batch_size)
        flips = rng.random(self.batch_size) < self.flip_prob
        images, boxes, classes, masks = [], [], [], []
        for i, flip in zip(ids, flips):
            c, b, cl, m = self.load_example(int(i), flip=bool(flip))
            images.append(c)
            boxes.append(b)
            classes.append(cl)
            masks.append(m)
        return {
            "images": np.stack(images),
            "gt_boxes": np.stack(boxes),
            "gt_class_ids": np.stack(classes),
            "gt_masks": np.stack(masks),
        }


class PrefetchBatcher:
    """One-ahead batch prefetch: load batch t+1 on a worker thread while the
    device runs step t (the training-side analog of `pipeline.loader`'s
    eval prefetch — decode/resample release the GIL in native code)."""

    def __init__(self, loader: COCOTrainLoader):
        from concurrent.futures import ThreadPoolExecutor

        self._loader = loader
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._next = None  # (step, future) for the NEXT expected step

    def get_batch(self, step: int | None = None) -> dict[str, np.ndarray]:
        pre, self._next = self._next, None
        if pre is not None and pre[0] == step:
            batch = pre[1].result()
        else:  # first call, or caller skipped/repeated a step
            if pre is not None:
                pre[1].cancel()
            batch = self._loader.get_batch(step)
        nxt = None if step is None else step + 1
        self._next = (nxt, self._pool.submit(self._loader.get_batch, nxt))
        return batch

    def close(self) -> None:
        """Cancel the in-flight prefetch and release the worker thread."""
        if self._next is not None:
            self._next[1].cancel()
            self._next = None
        self._pool.shutdown(wait=False, cancel_futures=True)
