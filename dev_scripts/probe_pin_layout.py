"""A/B the build-time layout pin (SGNERF_PIN_LAYOUT) on a real TPU.

xprof (probe_train_xprof) showed a 13.8 ms relayout copy of
occ_mask+dil_slot inserted into EVERY consumer dispatch at G=1 because
the grid-build programs emit those volumes with a transposed layout.
build_point_grid now relayouts once at build time; this probe measures
train G=1, train G=16, and an eval render chunk with the pin on/off.

Usage: SGNERF_PIN_LAYOUT={0,1} python dev_scripts/probe_pin_layout.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup

setup()
import jax
import jax.numpy as jnp
from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays
from sgnerf_tpu.models.train import (TrainConfig, create_train_state,
                                     train_step, train_step_multi)

PIN = os.environ.get("SGNERF_PIN_LAYOUT", "1")
rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)

def mk_cloud():
    # train_step donates its input state (which contains the cloud):
    # every section needs a fresh cloud (CLAUDE.md donation note)
    return make_point_cloud(
        xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
        dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True))


cloud = mk_cloud()
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
t0 = time.perf_counter()
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)
print(f"PIN={PIN} grid built {time.perf_counter()-t0:.1f}s "
      f"occ_mask layout={grid.occ_mask.format.layout.major_to_minor} "
      f"dil_slot layout={grid.dil_slot.format.layout.major_to_minor}",
      flush=True)

cfg = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused")
tcfg = TrainConfig()


def mk_params():
    # train_step donates the state (params included): fresh copy per section
    return init_aggregator_params(jax.random.key(0), cfg.agg)


params = mk_params()


def mk_batch(i, R):
    r = np.random.default_rng(100 + i)
    d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {"campos": jnp.asarray([[0., 0., -1.5]]),
            "raydir": jnp.asarray(d),
            "camrotc2w": jnp.eye(3, dtype=np.float32)[None],
            "near": jnp.asarray(0.1), "far": jnp.asarray(8.0),
            "bg_color": jnp.ones(3),
            "gt_image": jnp.asarray(
                r.uniform(0, 1, (1, R, 3)).astype(np.float32))}


keys = jax.random.split(jax.random.key(1), 4096)

# --- train G=1 (the case the 13.8 ms copy hits hardest) ---
st = create_train_state(params, mk_cloud(), tcfg)
batches = [mk_batch(i, 1024) for i in range(6)]
st, l = train_step(st, grid, cfg, tcfg, batches[0], keys[0])
float(l["total"])
t0 = time.perf_counter()
ITER = 30
for i in range(ITER):
    st, l = train_step(st, grid, cfg, tcfg, batches[i % 6], keys[i + 1])
float(l["total"])
dt = (time.perf_counter() - t0) / ITER
print(f"PIN={PIN} train G=1 R=1024: {dt*1e3:.1f} ms/step "
      f"= {1/dt:.1f} it/s", flush=True)
del st

# --- train G=16 ---
st = create_train_state(mk_params(), mk_cloud(), tcfg)
G = 16
groups, kg = [], []
for g in range(3):
    bs = [mk_batch(G * g + i, 1024) for i in range(G)]
    groups.append(jax.tree.map(lambda *xs: jnp.stack(xs), *bs))
    kg.append(jnp.stack(keys[g * G:(g + 1) * G]))
st, l = train_step_multi(st, grid, cfg, tcfg, groups[0], kg[0])
float(l["total"][-1])
n_disp = 6
t0 = time.perf_counter()
for i in range(n_disp):
    st, l = train_step_multi(st, grid, cfg, tcfg, groups[i % 3], kg[i % 3])
float(l["total"][-1])
dt = (time.perf_counter() - t0) / (n_disp * G)
print(f"PIN={PIN} train G=16 R=1024: {dt*1e3:.1f} ms/step "
      f"= {1/dt:.1f} it/s", flush=True)
del st

# --- eval render chunk (9216 rays) ---
r = np.random.default_rng(7)
R = 9216
d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
d[..., 2] = 1.0
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rb = {"campos": jnp.asarray([[0., 0., -1.5]]),
      "raydir": jnp.asarray(d),
      "camrotc2w": jnp.eye(3, dtype=np.float32)[None],
      "near": jnp.asarray(0.1), "far": jnp.asarray(8.0),
      "bg_color": jnp.ones(3)}
cloud = mk_cloud()
params = mk_params()
out = render_rays(params, cloud, grid, rb, cfg)
float(out["coarse_color"].sum())
t0 = time.perf_counter()
ITER = 20
acc = []
for i in range(ITER):
    rb2 = dict(rb, near=jnp.asarray(0.1 + 1e-4 * i))
    acc.append(render_rays(params, cloud, grid, rb2, cfg)["coarse_color"])
for a in acc:
    float(a.sum())
dt = (time.perf_counter() - t0) / ITER
print(f"PIN={PIN} render chunk R={R}: {dt*1e3:.1f} ms "
      f"= {R/dt:.0f} rays/s", flush=True)
