"""Decompose the 40 ms optimizer delta found by tools/ablate_train.py.

The r03 train-step ablation measured full_step − loss_grad = 40.1 ms at
batch 8 — 10% of the step — for what is arithmetically ~3 GB of HBM
traffic (≈4 ms at v5e bandwidth): clip-by-global-norm, decoupled weight
decay, SGD momentum, apply-updates over the ~700-leaf resnet101 param
tree. Hypothesis: the cost is per-tensor kernel count (4 optax stages ×
~700 leaves ≈ thousands of tiny fused kernels), not bytes.

A/B on the real chip, same random grads:

  optax_tree — the shipping chain (clip → add_decayed_weights → sgd(mom))
               + trainable-mask grad zeroing + apply_updates
  fused_flat — identical arithmetic on ONE concatenated f32 vector:
               mask·g, global-norm clip, +wd·mask_decay·p, momentum,
               p −= lr·m, then per-leaf slice/reshape back

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/opt_probe.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jnp.reshape(jax.tree_util.tree_leaves(out)[0], (-1,))[:1])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json")
    args = ap.parse_args()

    import optax

    from maskrcnn_tpu.core.config import MaskRCNNConfig
    from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn
    from maskrcnn_tpu.train.step import make_optimizer
    from maskrcnn_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = MaskRCNNConfig(architecture="resnet101")
    params = init_mask_rcnn(jax.random.PRNGKey(0), config)
    leaves = jax.tree_util.tree_leaves(params)
    n_leaves = len(leaves)
    n_params = sum(int(np.prod(x.shape)) for x in leaves)
    print(f"# {n_leaves} leaves, {n_params / 1e6:.1f} M params")

    grads = jax.tree.map(
        lambda p: jax.random.normal(
            jax.random.PRNGKey(1), p.shape, jnp.float32) * 1e-3, params)

    # --- A: shipping optax path ------------------------------------------
    tx, mask_fn = make_optimizer(config, "all")
    opt_state = tx.init(params)

    @jax.jit
    def optax_step(p, g, s):
        mask = mask_fn(p)
        if mask is not None:
            g = jax.tree.map(lambda gg, m: gg * jnp.asarray(m, gg.dtype),
                             g, mask)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s

    ms_tree = timeit(optax_step, params, grads, opt_state,
                     iters=args.iters)
    print(f"optax_tree : {ms_tree:7.2f} ms")

    # --- B: fused flat-vector equivalent ---------------------------------
    from fused_sgd import fused_sgd_init, fused_sgd_step

    fstate = fused_sgd_init(params, config, "all")
    lr, wd = config.learning_rate, config.weight_decay

    @jax.jit
    def fused_step(p, g, st):
        new_p, st = fused_sgd_step(p, g, st, lr=lr, weight_decay=wd,
                                   momentum=0.9, clip_norm=5.0)
        return new_p, st

    ms_flat = timeit(fused_step, params, grads, fstate, iters=args.iters)
    print(f"fused_flat : {ms_flat:7.2f} ms")
    print(f"speedup    : {ms_tree / ms_flat:5.2f}x")

    # numerics: one step of each from identical state must match
    p_a, _ = optax_step(params, grads, tx.init(params))
    p_b, _ = fused_step(params, grads, fused_sgd_init(params, config,
                                                      "all"))
    linf = max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(p_a),
                               jax.tree_util.tree_leaves(p_b)))
    print(f"one-step param L_inf optax vs fused: {linf:.3e}")

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"metric": "optimizer_update_ms_resnet101",
                       "leaves": n_leaves,
                       "params_m": round(n_params / 1e6, 1),
                       "optax_tree_ms": round(ms_tree, 2),
                       "fused_flat_ms": round(ms_flat, 2),
                       "one_step_linf": linf,
                       "device": jax.devices()[0].device_kind}, f,
                      indent=1)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
