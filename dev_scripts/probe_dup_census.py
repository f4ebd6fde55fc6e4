"""Census: how much duplication is in the per-chunk gather index streams?

Stage 2 (KNN cache query) gathers one nbr_packed row per shading point
(dil_slot), stage 3 (attribute gather) one packed row per neighbor
(sample_pidx). Both are gather-ROW-bound. If the index streams repeat
heavily within a chunk, a dedup (gather unique rows once, then a cheap
second indirection into the much smaller temp) could cut the row count.
This probe measures the duplication on the bench scene.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup

setup()
import jax
import jax.numpy as jnp
from sgnerf_tpu.models.aggregator import AggregatorConfig
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig
from sgnerf_tpu.ops.query import query_neighbors, mask_and_compact_samples
from sgnerf_tpu.ops.grid import voxel_coords, in_bounds, take3d
from sgnerf_tpu.ops.raygen import find_ray_generation_method

rng = np.random.default_rng(0)
n = 1_000_000
walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
ax = rng.integers(0, 3, size=n // 2)
sign = rng.integers(0, 2, size=n // 2) * 2 - 1
walls[np.arange(n // 2), ax] = 2.0 * sign
xyz = np.concatenate([walls, rng.normal(
    scale=0.7, size=(n - n // 2, 3)).astype(np.float32)])
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16")
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)

R = 9216
r = np.random.default_rng(100)
d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
d[..., 2] = 1.0
d /= np.linalg.norm(d, axis=-1, keepdims=True)
campos = jnp.asarray([[0.0, 0.0, -1.5]])
raydir = jnp.asarray(d)

cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=400, SR=24, K=8,
                   vsize=(0.008,) * 3)
raygen = find_ray_generation_method(cfg.which_ray_generation)
raypos, _, _, _ = raygen(campos, raydir, cfg.z_depth_dim, near=0.1, far=8.0,
                         jitter=0.0, key=None, domain_size=1.0)
q = query_neighbors(grid, cloud.xyz, raypos, K=cfg.K, SR=cfg.SR,
                    radius_limit=cfg.radius_limit)

# stage-2 stream: one dil_slot per (valid) shading point
loc = np.asarray(q.sample_loc_w).reshape(-1, 3)
smask = np.asarray(q.sample_loc_mask).reshape(-1)
c = np.asarray(voxel_coords(jnp.asarray(loc), spec))
cc = np.clip(c, 0, np.asarray(spec.vdim) - 1)
slot = np.asarray(take3d(grid.dil_slot, jnp.asarray(cc), spec.vdim))
slot = slot[smask & (slot >= 0)]
u_slot = np.unique(slot).size
print(f"stage2 rows: {slot.size} shading points -> {u_slot} unique "
      f"dil_slots ({u_slot / max(slot.size, 1):.1%})")

# stage-3 stream: one point id per valid neighbor
pidx = np.asarray(q.sample_pidx).reshape(-1)
pidx = pidx[pidx >= 0]
u_pidx = np.unique(pidx).size
print(f"stage3 rows: {pidx.size} neighbors -> {u_pidx} unique points "
      f"({u_pidx / max(pidx.size, 1):.1%})")
