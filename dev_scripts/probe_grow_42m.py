"""In-process grow/prune at REFERENCE scale (4.2M points, one chip).

Round-1 timed grow/prune at 1M (~20 s cached rebuild). The reference's
actual workload grows a ~4.2M cloud (and handles topology change by
save + exit() + bash relaunch); this times our in-process path there:
grow +100k into capacity padding -> grid+cache rebuild -> one training
step runs; prune by conf -> rebuild -> step.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _room_scan  # noqa: E402
from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud, grow, prune)
from sgnerf_tpu.models.renderer import RenderConfig  # noqa: E402
from sgnerf_tpu.models.train import (  # noqa: E402
    TrainConfig, create_train_state, train_step)

n = int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000))
G_NEW = 100_000
rng = np.random.default_rng(0)
xyz = _room_scan(rng, n)
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
cloud = make_point_cloud(
    xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
    dir=xyz / np.linalg.norm(xyz, axis=-1, keepdims=True),
    capacity=n + 2 * G_NEW)
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
t0 = time.time()
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)
print(f"initial grid build: {time.time()-t0:.0f}s "
      f"(cache {grid.nbr_packed.nbytes/2**30:.2f} GiB)", flush=True)

cfg = RenderConfig(
    agg=AggregatorConfig(fused_mlp="pallas", fused_bwd="pallas"),
    z_depth_dim=400, SR=24, K=8, vsize=(0.008,) * 3,
    gather_dtype="bfloat16", knn_mode="fused")
tcfg = TrainConfig()
params = init_aggregator_params(jax.random.key(0), cfg.agg)
st = create_train_state(params, cloud, tcfg)


def mk_batch(i):
    r = np.random.default_rng(100 + i)
    d = (r.normal(size=(1, 1024, 3)) * 0.3).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {"campos": jnp.asarray([[0., 0., -1.5]]),
            "raydir": jnp.asarray(d),
            "camrotc2w": jnp.eye(3, dtype=np.float32)[None],
            "near": jnp.asarray(0.1), "far": jnp.asarray(8.0),
            "bg_color": jnp.ones(3),
            "gt_image": jnp.asarray(
                r.uniform(0, 1, (1, 1024, 3)).astype(np.float32))}

st, l = train_step(st, grid, cfg, tcfg, mk_batch(0), jax.random.key(1))
print(f"pre-grow step ok, loss {float(l['total']):.4f}", flush=True)

# ---- grow points near the existing surfaces (twice: the first call
# carries the one-off jit compile of the donated grow program; the second
# is the steady-state cost every later grow pays) ------------------------
HALF = G_NEW // 2
t_grows = []
for gi in range(2):
    new_xyz = xyz[rng.choice(n, HALF)] + rng.normal(
        scale=0.01, size=(HALF, 3)).astype(np.float32)
    t0 = time.time()
    st = type(st)(params=st.params,
                  cloud=grow(st.cloud, jnp.asarray(new_xyz),
                             jnp.zeros((HALF, 32)), jnp.ones((HALF, 1)),
                             jnp.full((HALF, 3), 0.5),
                             jnp.tile(jnp.asarray([0., 0., 1.]), (HALF, 1))),
                  opt_state_net=st.opt_state_net,
                  opt_state_pts=st.opt_state_pts, step=st.step)
    jax.block_until_ready(st.cloud)
    t_grows.append(time.time() - t0)
t_grow = sum(t_grows)
t0 = time.time()
grid = None     # free the old 2.5 GiB cache first (as SceneModel._rebuild)
grid = build_grid(st.cloud, spec)
jax.block_until_ready((grid.bucket_pnts, grid.nbr_packed, grid.dil_slot))
t_rebuild = time.time() - t0
print(f"grow +{G_NEW}: device append {t_grows[0]:.1f}s first (incl. jit "
      f"compile) / {t_grows[1]:.1f}s steady, grid+cache rebuild "
      f"{t_rebuild:.1f}s, n_active {int(st.cloud.n_active)}", flush=True)
t0 = time.time()
st, l = train_step(st, grid, cfg, tcfg, mk_batch(1), jax.random.key(2))
print(f"post-grow step: {time.time()-t0:.1f}s (same-shape compile reuse), "
      f"loss {float(l['total']):.4f}", flush=True)

# ---- prune (drop ~2% by conf) ------------------------------------------
c2 = st.cloud
c2 = type(c2)(**{**c2.__dict__,
                 "conf": c2.conf.at[: n // 50].set(0.0)})
t0 = time.time()
c2 = prune(c2, 0.5)
jax.block_until_ready(c2.xyz)
t_prune = time.time() - t0
t0 = time.time()
grid = None
grid = build_grid(c2, spec)
jax.block_until_ready((grid.bucket_pnts, grid.nbr_packed, grid.dil_slot))
print(f"prune to {int(c2.n_active)}: mask {t_prune:.1f}s, rebuild "
      f"{time.time()-t0:.1f}s", flush=True)
st = type(st)(params=st.params, cloud=c2, opt_state_net=st.opt_state_net,
              opt_state_pts=st.opt_state_pts, step=st.step)
st, l = train_step(st, grid, cfg, tcfg, mk_batch(2), jax.random.key(3))
print(f"post-prune step ok, loss {float(l['total']):.4f}", flush=True)
