import time, jax, jax.numpy as jnp, numpy as np
from maskrcnn_tpu.core.config import MaskRCNNConfig
from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn, backbone_fpn, preprocess
from maskrcnn_tpu.ops import roi_align_pallas as rap
from maskrcnn_tpu.ops import roi_align as ra

def t(f,*a,iters=10):
    o=f(*a); np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    t0=time.perf_counter()
    for _ in range(iters): o=f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    return (time.perf_counter()-t0)/iters*1000

cfg = MaskRCNNConfig(architecture="resnet101")
params = init_mask_rcnn(jax.random.PRNGKey(0), cfg)
b = 32
rng = np.random.default_rng(0)
images = jnp.asarray(rng.uniform(0,255,(b,1024,1024,3)), jnp.float32)
pyr = jax.jit(lambda p,x: backbone_fpn(p, preprocess(x,cfg), cfg, jnp.bfloat16))(params, images)
pyr = [jnp.asarray(np.asarray(f)) for f in pyr[:4]]
c = rng.uniform(0.15,0.85,(b,1000,2)); h = rng.uniform(0.01,0.5,(b,1000,2))
rois_np = np.concatenate([c-h/2, c+h/2],-1).astype(np.float32)
rois_np[:, 995:] = 0.0
rois = jnp.asarray(rois_np)

outs = {}
for gval in (1, 8, 16):
    f7 = lambda f, r: rap.pyramid_roi_align_pallas(f, r, 7, (1024,1024), group=gval)
    print(f"pool7 G={gval:<2} perlvl :", t(f7, pyr, rois), flush=True)
    outs[gval] = np.asarray(f7(pyr, rois), np.float32)
for gval in (1, 2, 4):
    f14 = lambda f, r: rap.pyramid_roi_align_pallas(f, r, 14, (1024,1024), group=gval)
    print(f"pool14 G={gval:<2} perlvl:", t(f14, pyr, rois[:, :100]), flush=True)
print("G=8 vs G=1 max diff:", np.abs(outs[8]-outs[1]).max(), flush=True)

# correctness vs the XLA flat-gather path on ONE image (oracle-tested path)
want = np.asarray(jax.jit(lambda f, r: ra.pyramid_roi_align(
    [x[0] for x in f], r, 7, (1024,1024)))(pyr, rois[0]), np.float32)
print("pallas vs XLA flat max diff:", np.abs(outs[8][0]-want).max(), flush=True)
