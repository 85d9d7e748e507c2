"""Train-state checkpoint save/resume."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.core.config import tiny_test_config
from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn
from maskrcnn_tpu.train.checkpoint import (CheckpointManager, MetricsLogger,
                                           restore_train_state,
                                           save_train_state)
from maskrcnn_tpu.train.step import make_train_state, train_step
from tests.test_training import make_gt


@pytest.mark.slow
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


@pytest.mark.slow
def test_checkpoint_manager_retention_and_resume(rng, tmp_path):
    """Periodic saves prune to `keep`; restore_latest picks the newest."""
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    state, txm = make_train_state(params, cfg)

    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep=2)
    for step in (1, 2, 3, 4):
        mgr.save(state._replace(step=jnp.asarray(step)))
    mgr.wait()

    import os
    names = sorted(os.listdir(tmp_path / "ckpts"))
    assert names == ["ckpt_00000003.msgpack", "ckpt_00000004.msgpack"]
    assert mgr.latest_step_path()[0] == 4

    fresh, _ = make_train_state(
        init_mask_rcnn(jax.random.PRNGKey(1), cfg), cfg)
    restored = mgr.restore_latest(fresh)
    assert int(restored.step) == 4
    np.testing.assert_array_equal(
        np.asarray(state.params["conv1"]["kernel"]),
        np.asarray(restored.params["conv1"]["kernel"]))


def test_checkpoint_manager_empty_and_sync(tmp_path):
    cfg = tiny_test_config()
    params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
    state, _ = make_train_state(params, cfg)

    mgr = CheckpointManager(str(tmp_path / "none"), keep=1)
    assert mgr.latest_step_path() is None
    assert mgr.restore_latest(state) is None

    sync = CheckpointManager(str(tmp_path / "sync"), keep=1,
                             background=False)
    path = sync.save(state)
    import os
    assert os.path.exists(path)  # synchronous write landed immediately


def test_checkpoint_write_failure_raises(tmp_path):
    import shutil

    import pytest

    cfg = tiny_test_config()
    state, _ = make_train_state(init_mask_rcnn(jax.random.PRNGKey(0), cfg),
                                cfg)
    mgr = CheckpointManager(str(tmp_path / "gone"))
    shutil.rmtree(tmp_path / "gone")  # make the write fail
    mgr.save(state)
    with pytest.raises(RuntimeError, match="checkpoint write"):
        mgr.wait()


def test_metrics_logger(tmp_path):
    import json
    path = str(tmp_path / "m" / "metrics.jsonl")
    log = MetricsLogger(path)
    log.log(0, {"loss": np.float32(2.5)}, 1.0)
    log.log(5, {"loss": np.float32(1.25), "rpn_class_loss": 0.5}, 2.0)
    rows = [json.loads(line) for line in open(path)]
    assert [r["step"] for r in rows] == [0, 5]
    assert rows[1]["loss"] == 1.25 and rows[1]["rpn_class_loss"] == 0.5
    MetricsLogger(None).log(0, {}, 0.0)  # disabled: no-op, no crash
