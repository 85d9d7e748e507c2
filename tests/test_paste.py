"""On-device mask pasting vs the host PIL path."""

import numpy as np
import jax.numpy as jnp

from maskrcnn_tpu.pipeline.detector import paste_mask
from maskrcnn_tpu.pipeline.paste import paste_masks_device


def test_device_paste_matches_host(rng):
    s = 128
    d = 4
    # Structured soft masks (disks of random radius/center): thresholded
    # speckle would make any resampling difference look catastrophic.
    yy, xx = np.mgrid[0:28, 0:28]
    masks = []
    for _ in range(d):
        cy, cx = rng.uniform(8, 20, 2)
        r = rng.uniform(6, 12)
        dist = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        masks.append(np.clip(1.2 - dist / r, 0, 1))
    masks = np.asarray(masks, np.float32)
    boxes = []
    for _ in range(d):
        y1, x1 = rng.uniform(0, 0.5, 2)
        y2, x2 = y1 + rng.uniform(0.2, 0.45), x1 + rng.uniform(0.2, 0.45)
        boxes.append([y1, x1, y2, x2])
    boxes = np.asarray(boxes, np.float32)
    valid = np.array([True, True, True, False])

    dev = np.asarray(paste_masks_device(
        jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(valid), s))
    assert dev.shape == (d, s, s) and dev.dtype == np.uint8
    assert dev[3].sum() == 0  # invalid slot fully empty

    for i in range(3):
        # host path works in pixel coords of the same canvas
        px = boxes[i] * (s - 1)
        px[2:] += 1
        host = paste_mask(masks[i], (px[0], px[1], px[2], px[3]), (s, s))
        inter = np.logical_and(dev[i] > 0, host).sum()
        union = np.logical_or(dev[i] > 0, host).sum()
        assert union > 0
        iou = inter / union
        assert iou > 0.85, f"det {i}: device/host paste IoU {iou:.3f}"
        # device mask confined to its box (with 1px slack)
        ys, xs = np.nonzero(dev[i])
        assert ys.min() >= int(boxes[i][0] * s) - 1
        assert xs.max() <= int(np.ceil(boxes[i][3] * s)) + 1


def test_forward_fused_paste_matches_standalone(rng):
    """forward(..., paste_size=S) pastes INSIDE the jitted program (the
    streaming path's zero-extra-dispatch on-device pasting) and must equal
    the standalone paste of the same outputs."""
    import jax

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import tiny_test_config
    from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn

    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    images = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)

    out = forward(params, images, anchors, cfg, paste_size=64)
    assert out["pasted"].shape == (2, cfg.max_detections, 64, 64)
    assert out["pasted"].dtype == jnp.uint8
    for b in range(2):
        ref = paste_masks_device(out["masks"][b].astype(jnp.float32),
                                 out["detections"][b, :, :4],
                                 out["valid"][b], 64)
        np.testing.assert_array_equal(np.asarray(out["pasted"][b]),
                                      np.asarray(ref))
    # without the flag the key is absent (no silent extra output)
    assert "pasted" not in forward(params, images, anchors, cfg)


def test_empty_mask_stays_empty():
    masks = jnp.zeros((2, 28, 28))
    boxes = jnp.asarray([[0.1, 0.1, 0.6, 0.6], [0.2, 0.2, 0.9, 0.9]])
    out = np.asarray(paste_masks_device(
        masks, boxes, jnp.ones(2, bool), 64))
    assert out.sum() == 0
