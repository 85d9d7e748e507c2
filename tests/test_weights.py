"""Weight I/O: Matterport-layout HDF5 round trip, npz cache, error paths."""

import numpy as np
import jax
import pytest

from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.io.weights import (
    load_h5_weights,
    load_npz_checkpoint,
    merge_pretrained,
    load_mask_rcnn_weights,
    save_h5_weights,
    save_npz_checkpoint,
)
from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn


@pytest.fixture(scope="module")
def params():
    return init_mask_rcnn(jax.random.PRNGKey(3), tiny_test_config())


def _tree_equal(a, b):
    for layer in a:
        for w in a[layer]:
            np.testing.assert_array_equal(
                np.asarray(a[layer][w]), np.asarray(b[layer][w]),
                err_msg=f"{layer}/{w}")


def test_h5_roundtrip_with_nested_rpn(params, tmp_path):
    p = str(tmp_path / "weights.h5")
    save_h5_weights(params, p, nest_rpn=True)
    loaded = load_h5_weights(p)
    # nested rpn_model resolves to the inner layer names
    assert "rpn_conv_shared" in loaded
    assert "rpn_model" not in loaded
    merged, missing, unused = merge_pretrained(params, loaded)
    assert missing == [] and unused == []
    _tree_equal(params, merged)


def test_h5_deconv_kernel_transposed(params, tmp_path):
    p = str(tmp_path / "weights.h5")
    save_h5_weights(params, p)
    import h5py
    with h5py.File(p) as f:
        # Keras layout: dataset inside the layer group under the full
        # variable name (layer name appears twice in the path).
        stored = np.asarray(f["mrcnn_mask_deconv/mrcnn_mask_deconv/kernel:0"])
    ours = np.asarray(params["mrcnn_mask_deconv"]["kernel"])
    # File layout is Keras (kh, kw, out, in); ours is HWIO.
    assert stored.shape == (ours.shape[0], ours.shape[1], ours.shape[3],
                            ours.shape[2])
    loaded = load_h5_weights(p)
    np.testing.assert_array_equal(loaded["mrcnn_mask_deconv"]["kernel"], ours)


def test_merge_rejects_shape_mismatch(params, tmp_path):
    p = str(tmp_path / "weights.h5")
    save_h5_weights(params, p)
    loaded = load_h5_weights(p)
    loaded["conv1"]["kernel"] = loaded["conv1"]["kernel"][:, :, :, :32]
    with pytest.raises(ValueError, match="file shape"):
        merge_pretrained(params, loaded)


def test_merge_strict_missing_layer(params, tmp_path):
    p = str(tmp_path / "weights.h5")
    save_h5_weights(params, p)
    loaded = load_h5_weights(p)
    del loaded["fpn_p2"]
    with pytest.raises(KeyError, match="missing"):
        merge_pretrained(params, loaded)
    merged, missing, _ = merge_pretrained(params, loaded, strict=False)
    assert missing == ["fpn_p2"]


def test_unused_layers_reported(params, tmp_path):
    p = str(tmp_path / "weights.h5")
    save_h5_weights(params, p)
    loaded = load_h5_weights(p)
    loaded["mrcnn_class_loss_extra"] = {"kernel": np.zeros((1, 1), np.float32)}
    merged, _, unused = merge_pretrained(params, loaded)
    assert unused == ["mrcnn_class_loss_extra"]


def test_model_weights_prefix_group(params, tmp_path):
    # Keras `save_model` nests everything under /model_weights.
    import h5py
    p1 = str(tmp_path / "flat.h5")
    p2 = str(tmp_path / "nested.h5")
    save_h5_weights(params, p1)
    with h5py.File(p1) as src, h5py.File(p2, "w") as dst:
        g = dst.create_group("model_weights")
        for k in src:
            src.copy(k, g)
    loaded = load_h5_weights(p2)
    merged, missing, _ = merge_pretrained(params, loaded)
    assert missing == []


def test_npz_cache_roundtrip(params, tmp_path):
    p = str(tmp_path / "ckpt.npz")
    save_npz_checkpoint(params, p)
    loaded = load_npz_checkpoint(p)
    merged, missing, unused = merge_pretrained(params, loaded)
    assert missing == [] and unused == []
    _tree_equal(params, merged)


def test_npz_fp16_quantized_roundtrip(params, tmp_path):
    """fp16 product quantization (the reference quantizes all three
    converted models to fp16, `Conversion/task.py:90,102,114`): halves
    the artifact, loads back as float32 within fp16 rounding."""
    import os

    p32 = str(tmp_path / "ckpt32.npz")
    p16 = str(tmp_path / "ckpt16.npz")
    save_npz_checkpoint(params, p32)
    save_npz_checkpoint(params, p16, dtype=np.float16)
    assert os.path.getsize(p16) < 0.6 * os.path.getsize(p32)
    loaded = load_npz_checkpoint(p16)
    for layer, weights in loaded.items():
        for w, arr in weights.items():
            assert arr.dtype == np.float32
            ref = np.asarray(params[layer][w], np.float32)
            np.testing.assert_allclose(arr, ref, rtol=1e-3, atol=1e-6)


def test_load_mask_rcnn_weights_e2e(params, tmp_path):
    p = str(tmp_path / "weights.h5")
    save_h5_weights(params, p)
    merged = load_mask_rcnn_weights(params, p)
    _tree_equal(params, merged)
