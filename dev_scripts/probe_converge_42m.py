"""End-to-end training convergence at REFERENCE scale (4.2M points, TPU).

The toy convergence tests (tests/test_convergence.py) show the training
step optimizes; this runs the real thing at the reference's scale: GT
frames rendered from a target attribute set, a fresh model (random MLPs,
zeroed embeddings, noisy colors) fine-tuned at R=1024/G=16 against them,
eval PSNR tracked over thousands of in-process steps on one chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import dataclasses  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _room_scan  # noqa: E402
from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402
from sgnerf_tpu.models.train import (  # noqa: E402
    TrainConfig, create_train_state, train_step_multi)

n = int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000))
STEPS = int(os.environ.get("SGNERF_CONV_STEPS", 6000))
rng = np.random.default_rng(0)
xyz = _room_scan(rng, n)
gt_color = np.clip(
    0.5 + 0.4 * np.sin(xyz * np.array([3.0, 5.0, 2.0])), 0, 1
).astype(np.float32)
_dir = (xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)).astype(np.float32)

gt_emb = (np.tanh(xyz[:, [0]] * np.array([[1.0]])) *
          np.ones((1, 32))).astype(np.float32) * 0.1
cloud_gt = make_point_cloud(xyz, gt_emb, color=gt_color, dir=_dir)
spec = grid_spec_for_cloud(
    cloud_gt, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
t0 = time.time()
grid = build_grid(cloud_gt, spec)
jax.block_until_ready(grid.bucket_pnts)
print(f"grid built in {time.time()-t0:.0f}s", flush=True)

cfg = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused")
cfg_eval = dataclasses.replace(cfg, attr_dedup=512)

# GT frames: rendered from the GT cloud with a fixed "teacher" param set
params_gt = init_aggregator_params(jax.random.key(42), cfg.agg)
H, W_img, FL = 480, 640, 580.0
R = 9216


def frame_raydirs(i, full=False):
    r = np.random.default_rng(300 + i)
    row0 = int(r.integers(0, H - 16)) if not full else 0
    ys, xs = np.meshgrid(np.arange(row0, row0 + 15), np.arange(W_img),
                         indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:R]
    d = np.stack([(pix[:, 0] - W_img / 2) / FL, (pix[:, 1] - H / 2) / FL,
                  np.ones(R)], -1).astype(np.float32)
    a = float(r.uniform(-0.4, 0.4))
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    d = d @ rot.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d[None])

campos = jnp.asarray([[0.0, 0.0, -1.2]])
rot_I = jnp.eye(3, dtype=np.float32)[None]
bg = jnp.ones(3)


@jax.jit
def render_eval(params, cloud, grid, rd):
    out = render_rays(params, cloud, grid, cfg_eval, campos=campos,
                      raydir=rd, camrotc2w=rot_I, near=0.1, far=8.0,
                      bg_color=bg)
    return out["coarse_raycolor"], out["ray_mask"]

EV = 4
eval_dirs = [frame_raydirs(1000 + i) for i in range(EV)]
gt_eval = [render_eval(params_gt, cloud_gt, grid, rd) for rd in eval_dirs]
gt_eval = [(np.asarray(c), np.asarray(m)) for c, m in gt_eval]
print("GT eval frames rendered", flush=True)

# student: fresh MLPs, zero embeddings, noisy colors (conf/dir kept)
emb0 = np.zeros((n, 32), np.float32)
col0 = np.clip(gt_color + rng.normal(scale=0.3, size=gt_color.shape)
               .astype(np.float32), 0, 1)
cloud0 = make_point_cloud(xyz, emb0, color=col0, dir=_dir)
params0 = init_aggregator_params(jax.random.key(7), cfg.agg)
tcfg = TrainConfig()
st = create_train_state(params0, cloud0, tcfg)

G, Rtr = 16, 1024
train_dirs = [frame_raydirs(i) for i in range(64)]
gt_train = {}


def mk_group(g):
    bs = []
    for i in range(G):
        fi = (g * G + i) % 64
        r = np.random.default_rng(5000 + g * G + i)
        sel = r.integers(0, R, size=Rtr)
        rd = np.asarray(train_dirs[fi])[0][sel]
        if fi not in gt_train:
            c, _ = render_eval(params_gt, cloud_gt, grid, train_dirs[fi])
            gt_train[fi] = np.asarray(c)[0]
        gt = gt_train[fi][sel]
        bs.append({"campos": campos, "raydir": jnp.asarray(rd[None]),
                   "camrotc2w": rot_I, "near": jnp.asarray(0.1),
                   "far": jnp.asarray(8.0), "bg_color": bg,
                   "gt_image": jnp.asarray(gt[None])})
    return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)

groups = [mk_group(g) for g in range(12)]
print("train batches prepared", flush=True)
keys = jax.random.split(jax.random.key(1), 65536).reshape(-1, G)


def eval_psnr(st):
    ps = []
    for (gc, gm), rd in zip(gt_eval, eval_dirs):
        c, _ = render_eval(st.params, st.cloud, grid, rd)
        c = np.asarray(c)
        mse = float(np.mean((c - gc) ** 2))
        ps.append(-10 * np.log10(max(mse, 1e-10)))
    return float(np.mean(ps))

print(f"step 0: eval PSNR {eval_psnr(st):.2f} dB", flush=True)
t0 = time.perf_counter()
done = 0
for it in range(STEPS // G):
    st, losses = train_step_multi(st, grid, cfg, tcfg, groups[it % 12],
                                  keys[it % len(keys)])
    done += G
    if done % 1000 < G:
        lv = float(losses["total"][-1])
        el = time.perf_counter() - t0
        print(f"step {done}: loss {lv:.5f} "
              f"({done/el:.1f} it/s incl eval) eval PSNR "
              f"{eval_psnr(st):.2f} dB", flush=True)
print(f"final: {eval_psnr(st):.2f} dB after {done} steps in "
      f"{time.perf_counter()-t0:.0f}s", flush=True)
