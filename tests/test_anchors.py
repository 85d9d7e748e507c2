"""Anchor generation: counts, ordering, round-trip, bin format."""

import numpy as np

from maskrcnn_tpu.core.anchors import (
    denorm_boxes,
    generate_anchors,
    generate_pyramid_anchors_pixels,
    load_anchors_bin,
    norm_boxes,
    save_anchors_bin,
)
from maskrcnn_tpu.core.config import MaskRCNNConfig, tiny_test_config


def test_anchor_count_1024():
    cfg = MaskRCNNConfig()
    # 261,888 anchors at 1024² (SURVEY.md §2 hyperparameter table).
    assert cfg.num_anchors == 261_888
    a = generate_anchors(cfg)
    assert a.shape == (261_888, 4)
    assert a.dtype == np.float32


def test_anchor_ordering_and_geometry():
    cfg = tiny_test_config()
    pix = generate_pyramid_anchors_pixels(cfg)
    r = cfg.anchors_per_location
    # First anchor cell sits at image origin; ratio varies fastest.
    s0 = cfg.anchor_scales[0]
    for k, ratio in enumerate(cfg.anchor_ratios):
        h = s0 / np.sqrt(ratio)
        w = s0 * np.sqrt(ratio)
        np.testing.assert_allclose(
            pix[k], [-h / 2, -w / 2, h / 2, w / 2], rtol=1e-12)
    # Second cell is one feature stride to the right (x shifts, y fixed).
    stride0 = cfg.backbone_strides[0]
    np.testing.assert_allclose(pix[r][1] - pix[0][1], stride0, rtol=1e-12)
    np.testing.assert_allclose(pix[r][0], pix[0][0], rtol=1e-12)
    # Level boundary: anchors per level = fh*fw*r.
    fh, fw = cfg.feature_shapes[0]
    lvl1_start = fh * fw * r
    s1 = cfg.anchor_scales[1]
    h1 = s1 / np.sqrt(cfg.anchor_ratios[0])
    np.testing.assert_allclose(
        pix[lvl1_start][2] - pix[lvl1_start][0], h1, rtol=1e-12)


def test_norm_denorm_roundtrip(rng):
    shape = (1024, 1024)
    boxes = rng.uniform(0, 1024, size=(100, 4))
    np.testing.assert_allclose(
        denorm_boxes(norm_boxes(boxes, shape), shape), boxes, rtol=1e-10)


def test_norm_boxes_convention():
    # Matterport: (box - [0,0,1,1]) / [H-1, W-1, H-1, W-1].
    box = np.array([[0.0, 0.0, 1024.0, 1024.0]])
    n = norm_boxes(box, (1024, 1024))
    np.testing.assert_allclose(n, [[0.0, 0.0, 1.0, 1.0]], atol=1e-12)


def test_anchors_bin_roundtrip(tmp_path):
    cfg = tiny_test_config()
    a = generate_anchors(cfg)
    p = str(tmp_path / "anchors.bin")
    save_anchors_bin(a, p)
    b = load_anchors_bin(p, expect_count=cfg.num_anchors)
    np.testing.assert_array_equal(a, b)


def test_config_json_roundtrip(tmp_path):
    cfg = MaskRCNNConfig(architecture="resnet50", num_classes=81)
    p = str(tmp_path / "config.json")
    cfg.to_json(p)
    cfg2 = MaskRCNNConfig.from_json(p)
    assert cfg2 == cfg


def test_config_reference_schema():
    # The reference's config.json keys (README.md:85-92) must be accepted.
    cfg = MaskRCNNConfig.from_dict({
        "architecture": "resnet101",
        "input_image_shape": [1024, 1024, 3],
        "num_classes": 81,
        "pre_nms_max_proposals": 6000,
        "max_proposals": 1000,
        "some_unknown_key": 42,
    })
    assert cfg.pre_nms_max_proposals == 6000
    assert cfg.num_anchors == 261_888
    # COCOEval-side width/height spelling also accepted.
    cfg2 = MaskRCNNConfig.from_dict(
        {"input_width": 512, "input_height": 512, "num_classes": 81})
    assert cfg2.input_image_shape == (512, 512, 3)
