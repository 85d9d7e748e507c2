"""Proposal-stage sub-timings at batch 32 (chained-readback)."""
import time, functools, jax, jax.numpy as jnp, numpy as np
from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.core.anchors import generate_anchors
from maskrcnn_tpu.ops.boxes import apply_box_deltas, clip_boxes
from maskrcnn_tpu.ops.nms import nms_gather, nms_padded
from maskrcnn_tpu.ops.common import round_up

def t(f, *a, iters=10):
    o = f(*a); np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000

cfg = MaskRCNNConfig(architecture="resnet101")
anchors = jnp.asarray(generate_anchors(cfg))
a = anchors.shape[0]
b, k, mp = 32, 6000, 1000
rng = np.random.default_rng(0)
fg = jnp.asarray(rng.standard_normal((b, a)), jnp.float32)
deltas = jnp.asarray(rng.standard_normal((b, a, 4)) * 0.1, jnp.bfloat16)

thin = lambda o: [jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(o)]

@jax.jit
def s_topk(fg):
    return thin(jax.vmap(lambda s: jax.lax.approx_max_k(s, k, recall_target=0.999))(fg))

@jax.jit
def s_gather(fg, deltas):
    def one(s, d):
        _, ti = jax.lax.approx_max_k(s, k, recall_target=0.999)
        table = jnp.concatenate([d.astype(jnp.float32),
                                 anchors.astype(jnp.float32)], axis=1)
        return jnp.take(table, ti, axis=0)
    return thin(jax.vmap(one)(fg, deltas))

@jax.jit
def s_decode(fg, deltas):
    def one(s, d):
        _, ti = jax.lax.approx_max_k(s, k, recall_target=0.999)
        table = jnp.concatenate([d.astype(jnp.float32),
                                 anchors.astype(jnp.float32)], axis=1)
        sel = jnp.take(table, ti, axis=0)
        boxes = apply_box_deltas(sel[:, 4:], sel[:, :4] * jnp.asarray(cfg.bbox_std_dev, jnp.float32))
        return clip_boxes(boxes)
    return thin(jax.vmap(one)(fg, deltas))

@jax.jit
def s_full(fg, deltas):
    def one(s, d):
        _, ti = jax.lax.approx_max_k(s, k, recall_target=0.999)
        table = jnp.concatenate([d.astype(jnp.float32),
                                 anchors.astype(jnp.float32)], axis=1)
        sel = jnp.take(table, ti, axis=0)
        boxes = apply_box_deltas(sel[:, 4:], sel[:, :4] * jnp.asarray(cfg.bbox_std_dev, jnp.float32))
        boxes = clip_boxes(boxes)
        idx, valid = nms_padded(boxes, jnp.ones((k,), jnp.bool_), 0.7, mp,
                                tile_size=min(512, round_up(k, 128)))
        return nms_gather(boxes, idx), valid
    return thin(jax.vmap(one)(fg, deltas))

print("topk only       :", t(s_topk, fg), flush=True)
print("+ wide gather   :", t(s_gather, fg, deltas), flush=True)
print("+ decode/clip   :", t(s_decode, fg, deltas), flush=True)
print("+ NMS (full)    :", t(s_full, fg, deltas), flush=True)
