"""Train-state checkpoint save/resume."""

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn
from maskrcnn_tpu.train.checkpoint import restore_train_state, save_train_state
from maskrcnn_tpu.train.step import make_train_state, train_step
from tests.test_training import make_gt


def test_save_restore_roundtrip_and_resume(rng, tmp_path):
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    boxes, classes, masks = make_gt(rng, num_classes=cfg.num_classes)
    batch = {
        "images": jnp.asarray(
            rng.uniform(0, 255, (1, 128, 128, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(boxes)[None],
        "gt_class_ids": jnp.asarray(classes)[None],
        "gt_masks": jnp.asarray(masks)[None],
    }
    state, txm = make_train_state(params, cfg)
    key = jax.random.PRNGKey(9)
    state, _ = train_step(state, batch, anchors, key, cfg, txm)
    state, _ = train_step(state, batch, anchors, key, cfg, txm)

    path = str(tmp_path / "train_state.msgpack")
    save_train_state(state, path)

    # restore into a fresh template
    fresh, txm2 = make_train_state(
        init_mask_rcnn(jax.random.PRNGKey(1), cfg), cfg)
    restored = restore_train_state(fresh, path)
    assert int(restored.step) == 2
    np.testing.assert_array_equal(
        np.asarray(state.params["conv1"]["kernel"]),
        np.asarray(restored.params["conv1"]["kernel"]))

    # continuing from restored must equal continuing from original
    s1, m1 = train_step(state, batch, anchors, key, cfg, txm)
    s2, m2 = train_step(restored, batch, anchors, key, cfg, txm2)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(s1.params["rpn_conv_shared"]["kernel"]),
        np.asarray(s2.params["rpn_conv_shared"]["kernel"]))
