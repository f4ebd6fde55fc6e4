"""knn_mode=dedup (tile-unique CACHE-row gather) at 4.2M RASTER chunks.

At 1M it was a wash (the 11 ms big-table gather floor + select kernel
dominate). At 4.2M the cache is 2.5 GiB and raster tiles repeat dilated
slots heavily — re-A/B in the full render with attr_dedup=512 on both
sides. Also sweeps dedup_cap (slots/tile must cover the tile's distinct
dilated voxels: <=1536 slots visited per 64-ray tile).
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

R = 9216
n = int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000))
rng = np.random.default_rng(0)
xyz = _room_scan(rng, n)
emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                         dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                  keepdims=True))
spec = grid_spec_for_cloud(
    cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
    max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
    cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
grid = build_grid(cloud, spec)
jax.block_until_ready(grid.bucket_pnts)
print("grid built", flush=True)

H, W_img, FL = 480, 640, 580.0


def mk_raydir(i):
    r = np.random.default_rng(100 + i)
    row0 = int(r.integers(0, H - 16))
    ys, xs = np.meshgrid(np.arange(row0, row0 + 15), np.arange(W_img),
                         indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:R]
    d = np.stack([(pix[:, 0] - W_img / 2) / FL, (pix[:, 1] - H / 2) / FL,
                  np.ones(R)], -1).astype(np.float32)
    a = r.uniform(-0.4, 0.4)
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    d = d @ rot.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d[None])

raydirs = [mk_raydir(i) for i in range(4)]
campos = jnp.asarray([[0.0, 0.0, -1.2]])
rot = jnp.eye(3, dtype=np.float32)[None]
bg = jnp.ones(3)


def run(knn, cap=192, tile=64, iters=12):
    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=400, SR=24, K=8,
                       vsize=(0.008,) * 3, gather_dtype="bfloat16",
                       knn_mode=knn, dedup_tile=tile, dedup_cap=cap,
                       attr_dedup=512)
    params = init_aggregator_params(jax.random.key(0), cfg.agg)

    @jax.jit
    def step(params, cloud, grid, rd):
        out = render_rays(params, cloud, grid, cfg, campos=campos,
                          raydir=rd, camrotc2w=rot, near=0.1, far=8.0,
                          bg_color=bg)
        return jnp.sum(out["coarse_raycolor"])

    tag = f"knn={knn}" + (f" cap={cap} tile={tile}" if knn == "dedup"
                          else "")
    try:
        t0 = time.perf_counter()
        v0 = float(step(params, cloud, grid, raydirs[0]))
        print(f"{tag}: compile {time.perf_counter()-t0:.1f}s "
              f"checksum {v0:.4f}", flush=True)
        t0 = time.perf_counter()
        rs = [step(params, cloud, grid, raydirs[k % 4])
              for k in range(iters)]
        _ = [float(r) for r in rs]
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag}: {dt:7.2f} ms/chunk = {R/dt*1e3/1e3:.1f}k rays/s",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


run("fused")
run("dedup", cap=192)
run("dedup", cap=256)
run("dedup", cap=128)
