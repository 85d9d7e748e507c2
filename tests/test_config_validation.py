"""Config construction fails loudly on invalid values.

The reference accepts config.json silently and misbehaves later; here
every enum-like knob is validated at dataclass construction (core/
config.py __post_init__) — a typo'd config dies at load, not as a
silently wrong run (the r04 review found `train_bn: "Frozen"` would have
produced a half-frozen training regime across its two string-comparing
consumers).
"""

import json

import pytest

from maskrcnn_tpu.core.config import MaskRCNNConfig, tiny_test_config


def test_bad_architecture():
    with pytest.raises(ValueError, match="architecture"):
        tiny_test_config().replace(architecture="resnet152")


def test_bad_train_bn():
    with pytest.raises(ValueError, match="train_bn"):
        tiny_test_config().replace(train_bn="Frozen")


def test_bad_sampling_topk():
    with pytest.raises(ValueError, match="train_sampling_topk"):
        tiny_test_config().replace(train_sampling_topk="fast")


def test_bad_image_shape():
    # not divisible by the backbone strides
    with pytest.raises(ValueError):
        tiny_test_config().replace(input_image_shape=(100, 100, 3))


def test_from_json_validates(tmp_path):
    """A config FILE with a bad knob dies at load, not later."""
    good = tiny_test_config()
    p = tmp_path / "cfg.json"
    good.to_json(str(p))
    d = json.load(open(p))
    d["train_bn"] = "frozen "  # trailing space — the classic silent typo
    json.dump(d, open(p, "w"))
    with pytest.raises(ValueError, match="train_bn"):
        MaskRCNNConfig.from_json(str(p))
