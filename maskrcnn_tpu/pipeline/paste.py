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

import jax
import jax.numpy as jnp


def paste_masks(
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

    Traceable core — call inside a jitted graph (models/mask_rcnn.py fuses it
    into the forward when `paste_size` is set, so streaming pays ZERO extra
    dispatches per frame) or via the standalone `paste_masks_device` wrapper.
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

    # Bilinear sampling as two interpolation MATMULS per detection instead
    # of 2-D fancy gathers: on TPU only plain row gathers hit the gather
    # fast path (docs/PERF.md) — the original gather formulation cost
    # ~700 ms/frame at 100 detections x 1024²; dense (S, m) interpolation
    # matrices put the same arithmetic on the MXU (Wy @ mask @ Wxᵀ),
    # ~3 GFLOP/frame. Where c0 == c1 (edge clamp) the two indicator terms
    # land on the same column and sum to (1-w) + w = 1, so no special case.
    def interp_matrix(coords, ok):
        c0 = jnp.clip(jnp.floor(coords), 0, m - 1).astype(jnp.int32)
        c1 = jnp.minimum(c0 + 1, m - 1)
        wfrac = jnp.clip(coords - c0, 0.0, 1.0)
        j = jnp.arange(m, dtype=jnp.int32)  # (m,)
        w_mat = ((j[None, None, :] == c0[..., None]) * (1 - wfrac)[..., None]
                 + (j[None, None, :] == c1[..., None]) * wfrac[..., None])
        return w_mat * ok[..., None]  # (D, S, m)

    wy_mat = interp_matrix(my, in_y.astype(jnp.float32))
    wx_mat = interp_matrix(mx, in_x.astype(jnp.float32))

    # (D, S, m) @ (D, m, m) @ (D, m, S) -> (D, S, S), batched on the MXU.
    val = jnp.einsum("dsm,dmn->dsn", wy_mat, masks,
                     preferred_element_type=jnp.float32)
    val = jnp.einsum("dsn,dtn->dst", val, wx_mat,
                     preferred_element_type=jnp.float32)
    return ((val >= threshold)
            & valid[:, None, None]).astype(jnp.uint8)


#: Standalone jitted entry point (one dispatch per call). For streaming,
#: prefer fusing into the forward (`forward(..., paste_size=S)`): a separate
#: dispatch costs ~30 ms of RPC round-trip over a tunnel-attached chip even
#: though the paste compute itself is a few ms (docs/PERF.md).
paste_masks_device = jax.jit(
    paste_masks, static_argnames=("out_size", "threshold"))
