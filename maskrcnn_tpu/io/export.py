"""Deployment export: the jitted JAX forward as a TensorFlow SavedModel.

The reference's whole purpose is a CONVERSION pipeline — Keras weights in,
a deployable artifact out (three Core ML models + anchors,
`Sources/maskrcnn/ConvertCommand.swift`, `Conversion/task.py`). This
framework's native deployment format is the npz products + JAX; this
module adds the cross-framework leg for non-JAX consumers: the SAME
single-program forward (weights baked in, anchors baked in, fused
preprocess — the in-graph analog of the reference baking the mean-pixel
biases into the Core ML input, `Conversion/task.py:73-75`) staged out
through `jax2tf` into one TF SavedModel with a `detect` signature, ready
for TF Serving / tf.js-style consumers.

Export runs the pure-XLA path (CPU trace): the Pallas kernels gate
themselves off away from TPU, and the XLA graph is the exact production
math minus device-specific kernels — the tiny-config round-trip test
asserts bit-identical outputs vs the JAX forward.
"""

from __future__ import annotations

import os

import numpy as np

# TF's oneDNN custom ops round differently from XLA and flip near-tie
# NMS selections (observed at random weights); pure-XLA TF execution is
# bit-compatible with the JAX CPU path. Must be set before the process's
# FIRST tensorflow import (tests/conftest.py sets it for the suite).
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")


def export_savedmodel(params, config, out_dir: str, batch: int = 1,
                      paste_size: int | None = None) -> str:
    """Write a TF SavedModel wrapping `forward(params, ., anchors, config)`.

    `batch`: the exported signature's static batch size (XLA static-shape
    discipline carries over). `paste_size`: also emit full-resolution
    pasted masks (the streaming config's fused paste stage).

    Must run on the CPU backend: the exported graph must not capture
    TPU-only Pallas custom calls. Raises RuntimeError otherwise.
    """
    import jax

    if jax.default_backend() != "cpu":
        raise RuntimeError(
            "export_savedmodel must run on the CPU backend so the traced "
            "graph takes the pure-XLA (Pallas-free) path — run with "
            "JAX_PLATFORMS=cpu (cli convert --export-savedmodel sets this "
            "up before first device use)")

    import jax.numpy as jnp
    import tensorflow as tf
    from jax.experimental import jax2tf

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.models.mask_rcnn import forward

    anchors = jnp.asarray(generate_anchors(config))
    params = jax.tree.map(jnp.asarray, params)

    def fwd(images):
        return forward(params, images, anchors, config,
                       paste_size=paste_size)

    tf_fn = jax2tf.convert(fwd, with_gradient=False)
    keys = ("detections", "masks", "valid") + (
        ("pasted",) if paste_size else ())
    spec = tf.TensorSpec(
        [batch, config.image_height, config.image_width, 3], tf.float32,
        name="images")

    class MaskRCNNModule(tf.Module):
        @tf.function(autograph=False, input_signature=[spec])
        def detect(self, images):
            out = tf_fn(images)
            return {k: out[k] for k in keys}

    mod = MaskRCNNModule()
    # trace once so save() embeds the concrete function
    mod.detect(tf.zeros([batch, config.image_height,
                         config.image_width, 3], tf.float32))
    tf.saved_model.save(mod, out_dir)
    return out_dir


def verify_savedmodel(out_dir: str, params, config, batch: int = 1,
                      seed: int = 0,
                      paste_size: int | None = None) -> float:
    """Reload the SavedModel and compare against the JAX forward on one
    random batch; returns the max abs difference across outputs.
    `paste_size` must match the export's (the JAX side runs the same
    fused-paste stage and the `pasted` output is compared too)."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.models.mask_rcnn import forward

    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 255, (batch, config.image_height,
                                config.image_width, 3)).astype(np.float32)
    anchors = jnp.asarray(generate_anchors(config))
    want = forward(params, jnp.asarray(imgs), anchors, config,
                   paste_size=paste_size)
    got = tf.saved_model.load(out_dir).detect(tf.constant(imgs))
    keys = ("detections", "masks", "valid") + (
        ("pasted",) if paste_size else ())
    worst = 0.0
    for k in keys:
        a = np.asarray(want[k], np.float32)
        b = got[k].numpy().astype(np.float32)
        if a.size:
            worst = max(worst, float(np.abs(a - b).max()))
    return worst
