"""Training-state checkpointing (save/resume).

The reference's persistence story is immutable inference artifacts only
(SURVEY.md §5 "checkpoint/resume: not applicable — inference-only"). Since
this framework actually trains, it needs real checkpoint/resume: the full
TrainState (params + optimizer state + step) is serialized with
flax.serialization msgpack, restored against a template state built from the
same config (structure validation for free).
"""

from __future__ import annotations

import os

import jax
from flax import serialization

from maskrcnn_tpu.train.step import TrainState


def save_train_state(state: TrainState, path: str) -> None:
    data = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore_train_state(template: TrainState, path: str) -> TrainState:
    """Restore into the structure of `template` (same config/optimizer)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)
