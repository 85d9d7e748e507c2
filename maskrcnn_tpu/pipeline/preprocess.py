"""Image preprocessing: letterbox resize to the square network input.

Reproduces the reference's preprocessing contract: Vision's `.scaleFit`
letterbox into 1024x1024 (`Example/Source/ViewController.swift:42`,
`Sources/maskrcnn/EvaluateCommand.swift:155-157`) — aspect-preserving scale,
centered, zero-padded — with the RGB mean subtraction handled inside the
graph (`models/mask_rcnn.preprocess`, matching the biases baked into the
Core ML model at `Conversion/task.py:73-75`).

Two paths:
  * `letterbox_numpy` — host-side (PIL bilinear) for CLI/demo/eval loaders;
  * `letterbox_jax` — jitted `jax.image.resize` path for fused on-device
    preprocessing when the source size is static (e.g. video streams).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np


@dataclasses.dataclass(frozen=True)
class LetterboxWindow:
    """Where the real image landed inside the square canvas (pixel coords),
    plus the scale applied. Needed to unmold boxes/masks back."""
    y1: int
    x1: int
    y2: int
    x2: int
    scale: float
    orig_height: int
    orig_width: int


def quantize_canvas_u8(canvas: np.ndarray) -> np.ndarray:
    """Round an RGB [0,255] float canvas to uint8 (round-half-even, the
    single quantization convention for every wire-format path: stream
    frames, train canvases, evaluate --uint8). ±0.5 LSB of resample
    precision — below bf16 input rounding; 4× fewer host→device bytes."""
    if canvas.dtype == np.uint8:
        return canvas
    return np.clip(np.rint(canvas), 0, 255).astype(np.uint8)


def compute_window(orig_h: int, orig_w: int, size: int) -> LetterboxWindow:
    scale = min(size / orig_h, size / orig_w)
    # Clamp to >= 1 px so extreme aspect ratios keep a nonzero window.
    new_h = max(int(round(orig_h * scale)), 1)
    new_w = max(int(round(orig_w * scale)), 1)
    top = (size - new_h) // 2
    left = (size - new_w) // 2
    return LetterboxWindow(top, left, top + new_h, left + new_w, scale,
                           orig_h, orig_w)


def letterbox_numpy(image: np.ndarray, size: int) -> tuple[np.ndarray,
                                                           LetterboxWindow]:
    """(H, W, 3) uint8/float RGB -> (size, size, 3) float32 canvas + window."""
    from PIL import Image

    h, w = image.shape[:2]
    win = compute_window(h, w, size)
    pil = Image.fromarray(np.asarray(image, np.uint8))
    resized = pil.resize((win.x2 - win.x1, win.y2 - win.y1), Image.BILINEAR)
    canvas = np.zeros((size, size, 3), np.float32)
    canvas[win.y1:win.y2, win.x1:win.x2] = np.asarray(resized, np.float32)
    return canvas, win


@functools.partial(__import__("jax").jit, static_argnames=("size",))
def letterbox_jax(image, size: int):
    """Jitted letterbox for a statically-shaped (H, W, 3) image."""
    import jax
    import jax.numpy as jnp

    h, w = image.shape[:2]
    win = compute_window(h, w, size)
    resized = jax.image.resize(
        image.astype(jnp.float32),
        (win.y2 - win.y1, win.x2 - win.x1, 3), method="bilinear")
    canvas = jnp.zeros((size, size, 3), jnp.float32)
    return jax.lax.dynamic_update_slice(canvas, resized, (win.y1, win.x1, 0))

