"""On-device full-resolution mask pasting (jitted).

BASELINE.json's streaming config calls for "persistent compiled pipeline +
on-device mask pasting": instead of shipping (D, 28, 28) soft masks to the
host and pasting with PIL (`pipeline/detector.py::paste_mask`), paste on the
TPU — the inverse of ROIAlign's sampling: every output pixel maps to a mask
coordinate via the detection box, sampled bilinearly, zero outside the box.

Matterport's unmold semantics (resize mask into the box, threshold 0.5) are
reproduced; output is uint8 {0,1} at a configurable resolution (full 1024²
for 100 detections is 100 MB/image at uint8 — `out_size` can downscale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_size", "threshold"))
def paste_masks_device(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_size: int,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """(D, m, m) soft masks + (D, 4) normalized boxes -> (D, S, S) uint8.

    Pixel centers at (i + 0.5)/S in normalized canvas coordinates; a pixel is
    set when it falls inside its box and the bilinearly-sampled mask value
    passes the threshold — matching the host-side PIL resize+threshold path
    to within resampling differences.
    """
    d, m, _ = masks.shape
    s = out_size
    masks = masks.astype(jnp.float32)

    centers = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # (S,)
    y1, x1, y2, x2 = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    h = jnp.maximum(y2 - y1, 1e-8)
    w = jnp.maximum(x2 - x1, 1e-8)

    # Normalized canvas -> continuous mask coordinates (align like PIL
    # resize: box edge -> mask edge, pixel centers at half-steps).
    my = (centers[None, :] - y1[:, None]) / h[:, None] * m - 0.5  # (D, S)
    mx = (centers[None, :] - x1[:, None]) / w[:, None] * m - 0.5  # (D, S)
    in_y = (centers[None, :] >= y1[:, None]) & (centers[None, :] <= y2[:, None])
    in_x = (centers[None, :] >= x1[:, None]) & (centers[None, :] <= x2[:, None])

    def sample_axis(coords):
        c0 = jnp.clip(jnp.floor(coords), 0, m - 1).astype(jnp.int32)
        c1 = jnp.minimum(c0 + 1, m - 1)
        wfrac = jnp.clip(coords - c0, 0.0, 1.0)
        return c0, c1, wfrac

    y0i, y1i, wy = sample_axis(my)  # (D, S)
    x0i, x1i, wx = sample_axis(mx)

    def per_det(mask, y0i, y1i, wy, x0i, x1i, wx, ok_y, ok_x, is_valid):
        top = mask[y0i][:, x0i] * (1 - wx)[None, :] + \
              mask[y0i][:, x1i] * wx[None, :]
        bot = mask[y1i][:, x0i] * (1 - wx)[None, :] + \
              mask[y1i][:, x1i] * wx[None, :]
        val = top * (1 - wy)[:, None] + bot * wy[:, None]
        inside = ok_y[:, None] & ok_x[None, :] & is_valid
        return ((val >= threshold) & inside).astype(jnp.uint8)

    return jax.vmap(per_det)(masks, y0i, y1i, wy, x0i, x1i, wx, in_y, in_x,
                             valid)
