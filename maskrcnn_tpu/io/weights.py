"""Matterport Keras HDF5 weight loading (replaces the conversion pipeline).

The reference turns `weights.h5` + `config.json` into three Core ML models
through a Dockerized Keras/coremltools pipeline
(`Sources/maskrcnn/Python/Conversion/task.py:118-177`, SURVEY.md §3.2). Here
the same `weights.h5` loads directly into the flat Matterport-named parameter
dict the model functions consume — no Docker, no Keras, no conversion graph.
The weight *names* are the interchange contract (SURVEY.md §7 step 3).

Keras `save_weights` layout handled:
  * root attr `layer_names`; per-layer group attr `weight_names` with entries
    like ``conv1/kernel:0``; datasets stored under those paths;
  * nested models (Matterport wraps the RPN in an inner `rpn_model`) produce
    doubly-qualified names ``rpn_model/rpn_conv_shared/kernel:0`` — resolved
    by taking the *penultimate* path component as the layer name;
  * `Conv2DTranspose` kernels are stored (kh, kw, out_ch, in_ch) and are
    transposed to our HWIO (kh, kw, in, out) on load (`mrcnn_mask_deconv`);
  * names with or without the ``:0`` tensor suffix.

Also provides the converted-checkpoint cache the SURVEY recommends (§5
"checkpoint/resume"): a plain ``.npz`` with ``<layer>/<weight>`` keys —
loads in milliseconds vs. HDF5 walking, and is the artifact `convert`
produces (the analog of the reference's compiled products directory).
"""

from __future__ import annotations

import io as _stdlib_io
import os
from typing import Any, Mapping

import numpy as np

_BN_WEIGHTS = ("gamma", "beta", "moving_mean", "moving_variance")
_TRANSPOSED_KERNELS = {"mrcnn_mask_deconv"}


def _normalize_weight_name(name: str) -> tuple[str, str]:
    """'rpn_model/rpn_conv_shared/kernel:0' -> ('rpn_conv_shared', 'kernel')."""
    name = name.decode() if isinstance(name, bytes) else name
    if name.endswith(":0"):
        name = name[:-2]
    parts = name.split("/")
    if len(parts) == 1:
        return parts[0], parts[0]
    return parts[-2], parts[-1]


def load_h5_weights(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Read a Matterport-layout weights.h5 into {layer: {weight: array}}."""
    import h5py

    params: dict[str, dict[str, np.ndarray]] = {}

    def visit(name, obj):
        if not isinstance(obj, h5py.Dataset):
            return
        layer, weight = _normalize_weight_name(name)
        arr = np.asarray(obj, dtype=np.float32)
        if weight == "kernel" and layer in _TRANSPOSED_KERNELS and arr.ndim == 4:
            arr = np.transpose(arr, (0, 1, 3, 2))  # (kh,kw,out,in) -> HWIO
        params.setdefault(layer, {})[weight] = arr

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        root.visititems(visit)
    if not params:
        raise ValueError(f"{path}: no weight datasets found")
    return params


def _as_numpy_tree(params: Mapping[str, Any]) -> dict[str, dict[str, np.ndarray]]:
    return {
        layer: {w: np.asarray(v, np.float32) for w, v in weights.items()}
        for layer, weights in params.items()
    }


def merge_pretrained(
    init_params: Mapping[str, Any],
    loaded: Mapping[str, Mapping[str, np.ndarray]],
    *,
    strict: bool = True,
) -> tuple[dict[str, Any], list[str], list[str]]:
    """Overlay loaded weights onto an init pytree; shape-check everything.

    Returns (params, missing, unused): layers expected by the model but
    absent from the file, and file layers the model doesn't use (the
    Matterport training graph has extra layers — input, anchors, loss heads —
    that inference ignores, like the reference conversion did implicitly).
    """
    import jax.numpy as jnp

    out: dict[str, Any] = {}
    missing: list[str] = []
    for layer, weights in init_params.items():
        if layer not in loaded:
            missing.append(layer)
            out[layer] = weights
            continue
        src = loaded[layer]
        new = {}
        for wname, init_val in weights.items():
            if wname not in src:
                raise KeyError(f"layer {layer!r}: weight {wname!r} missing "
                               f"(file has {sorted(src)})")
            arr = src[wname]
            if tuple(arr.shape) != tuple(init_val.shape):
                raise ValueError(
                    f"layer {layer!r} weight {wname!r}: file shape "
                    f"{arr.shape} != model shape {tuple(init_val.shape)}")
            new[wname] = jnp.asarray(arr, jnp.float32)
        out[layer] = new
    unused = sorted(set(loaded) - set(init_params))
    if strict and missing:
        raise KeyError(
            f"weights file is missing {len(missing)} model layers, e.g. "
            f"{missing[:8]} — wrong architecture? (pass strict=False to "
            f"keep random init for missing layers)")
    return out, missing, unused


def load_mask_rcnn_weights(init_params, h5_path: str, *, strict: bool = True):
    """HDF5 -> ready-to-run params (convenience wrapper)."""
    loaded = load_h5_weights(h5_path)
    params, _, _ = merge_pretrained(init_params, loaded, strict=strict)
    return params


# ---------------------------------------------------------------------------
# Converted-checkpoint cache (.npz): the `convert` CLI artifact.
# ---------------------------------------------------------------------------

def save_npz_checkpoint(params: Mapping[str, Any], path: str,
                        dtype=np.float32) -> None:
    """Write the flat {layer/weight: array} product checkpoint.

    `dtype=np.float16` is the analog of the reference's fp16 weight
    quantization of all three converted models
    (`Conversion/task.py:90,102,114`) — it halves the artifact; weights
    are upcast back to float32 at load time (compute runs in the
    configured policy dtype either way).
    """
    flat = {
        f"{layer}/{w}": np.asarray(v, dtype)
        for layer, weights in params.items() for w, v in weights.items()
    }
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load_npz_checkpoint(path: str) -> dict[str, dict[str, np.ndarray]]:
    out: dict[str, dict[str, np.ndarray]] = {}
    with np.load(path) as data:
        for key in data.files:
            layer, w = key.rsplit("/", 1)
            arr = data[key]
            if arr.dtype == np.float16:  # fp16-quantized product
                arr = arr.astype(np.float32)
            out.setdefault(layer, {})[w] = arr
    return out


# ---------------------------------------------------------------------------
# Matterport-layout HDF5 writer — used by tests to fabricate synthetic
# pretrained files, and by `convert --export-h5` for round-tripping.
# ---------------------------------------------------------------------------

def save_h5_weights(params: Mapping[str, Any], path: str,
                    nest_rpn: bool = True) -> None:
    """Write {layer: {weight: array}} in Keras save_weights layout.

    With `nest_rpn`, the three RPN layers are written under an inner
    `rpn_model` group with doubly-qualified weight names, exactly as
    Matterport's nested Keras model serializes them.
    """
    import h5py

    rpn_layers = {"rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred"}
    with h5py.File(path, "w") as f:
        layer_names = []
        tree = _as_numpy_tree(params)

        def write_layer(group_name, inner):
            g = f.require_group(group_name)
            weight_names = []
            for layer, weights in inner.items():
                order = [w for w in ("kernel", "bias") if w in weights]
                order += [w for w in _BN_WEIGHTS if w in weights]
                order += [w for w in weights if w not in order]
                for w in order:
                    arr = weights[w]
                    if (w == "kernel" and layer in _TRANSPOSED_KERNELS
                            and arr.ndim == 4):
                        arr = np.transpose(arr, (0, 1, 3, 2))  # HWIO -> keras
                    qual = (f"{group_name}/{layer}/{w}:0"
                            if group_name != layer else f"{layer}/{w}:0")
                    # Keras creates each dataset INSIDE the layer group under
                    # the full variable name, i.e. /conv1/conv1/kernel:0 —
                    # the layer name appears twice in the path.
                    g.create_dataset(qual, data=arr)
                    weight_names.append(qual.encode())
            g.attrs["weight_names"] = weight_names
            layer_names.append(group_name.encode())

        nested = {k: v for k, v in tree.items()
                  if nest_rpn and k in rpn_layers}
        for layer, weights in tree.items():
            if layer in nested:
                continue
            write_layer(layer, {layer: weights})
        if nested:
            write_layer("rpn_model", nested)
        f.attrs["layer_names"] = layer_names
