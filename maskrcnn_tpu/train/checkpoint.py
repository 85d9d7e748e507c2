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


class CheckpointManager:
    """Periodic training checkpoints: async writes + retention + resume.

    Production training needs more than the reference's immutable-artifact
    story (SURVEY.md §5): crash resilience during long runs. This manager
    writes `ckpt_<step>.msgpack` files into a directory, serializing on the
    caller's thread (cheap host readback) but writing the bytes on a
    background thread so the train loop never blocks on disk; old
    checkpoints beyond `keep` are pruned. `latest_step_path` finds the
    resume point.
    """

    PREFIX, SUFFIX = "ckpt_", ".msgpack"

    def __init__(self, directory: str, keep: int = 3,
                 background: bool = True):
        import threading

        self.directory = directory
        self.keep = max(keep, 1)
        self.background = background
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory,
                            f"{self.PREFIX}{step:08d}{self.SUFFIX}")

    def save(self, state: TrainState) -> str:
        """Serialize now, write (and prune) asynchronously. Returns the
        checkpoint path that will exist once the write completes."""
        import threading

        step = int(state.step)
        # to_bytes forces device->host transfer here, so the caller holds a
        # consistent snapshot even if the loop mutates `state` right after.
        data = serialization.to_bytes(state)
        path = self._path(step)

        def write():
            try:
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)
                self._prune()
            except BaseException as e:  # surfaced by the next wait()/save()
                self._error = e

        self.wait()  # at most one write in flight; raises a prior failure
        if self.background:
            self._thread = threading.Thread(target=write, daemon=True)
            self._thread.start()
        else:
            write()
            self.wait()  # re-raise synchronous failures too
        return path

    def wait(self) -> None:
        """Block until any in-flight write has landed; re-raise its error
        (disk full, permissions) instead of reporting phantom success."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(
                f"checkpoint write to {self.directory} failed") from err

    def _steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith(self.PREFIX) and name.endswith(self.SUFFIX):
                try:
                    out.append(int(name[len(self.PREFIX):-len(self.SUFFIX)]))
                except ValueError:
                    continue
        return sorted(out)

    def _prune(self) -> None:
        steps = self._steps()
        for step in steps[:-self.keep]:
            try:
                os.remove(self._path(step))
            except OSError:
                pass

    def latest_step_path(self) -> tuple[int, str] | None:
        """(step, path) of the newest checkpoint, or None if empty."""
        steps = self._steps()
        if not steps:
            return None
        return steps[-1], self._path(steps[-1])

    def restore_latest(self, template: TrainState) -> TrainState | None:
        self.wait()
        found = self.latest_step_path()
        if found is None:
            return None
        return restore_train_state(template, found[1])


class MetricsLogger:
    """Append-only JSONL training metrics (one line per logged step) — the
    structured-observability counterpart of the reference's os_signpost
    tracing (SURVEY.md §5), but for training, which the reference lacks."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, step: int, metrics: dict, wall_s: float) -> None:
        if not self.path:
            return
        import json

        row = {"step": step, "wall_s": round(wall_s, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
