"""Model variants (MobileNetV2-FPN) and the streaming pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn
from maskrcnn_tpu.models.mobilenet import apply_mobilenetv2, init_mobilenetv2
from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector
from maskrcnn_tpu.pipeline.stream import run_stream, synthetic_frames
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (full-model jits / subprocess)


def test_mobilenet_backbone_shapes(rng):
    params = init_mobilenetv2(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.uniform(-128, 128, (1, 128, 128, 3)), jnp.float32)
    c2, c3, c4, c5 = apply_mobilenetv2(params, img)
    assert c2.shape == (1, 32, 32, 24)
    assert c3.shape == (1, 16, 16, 32)
    assert c4.shape == (1, 8, 8, 96)
    assert c5.shape == (1, 4, 4, 320)


def test_mobilenet_full_forward(rng):
    cfg = tiny_test_config().replace(architecture="mobilenetv2")
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    img = jnp.asarray(rng.uniform(0, 255, (1, 128, 128, 3)), jnp.float32)
    out = forward(params, img, anchors, cfg)
    assert out["detections"].shape == (1, cfg.max_detections, 6)
    for v in out.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()


def test_stream_pipeline(rng):
    cfg = tiny_test_config()
    det = MaskRCNNDetector.from_random(cfg, seed=0)
    seen = []
    stats = run_stream(
        det, synthetic_frames(6, cfg.image_height),
        on_result=lambda i, out: seen.append(i), micro_batch=2)
    assert stats.frames == 6
    assert seen == [0, 2, 4]
    assert stats.fps > 0
    # odd tail handled
    stats2 = run_stream(det, synthetic_frames(5, cfg.image_height),
                        micro_batch=2)
    assert stats2.frames == 5
