"""Per-tile unique POINT-ID counts of the attribute gather (raster rays).

Stage 3 gathers one packed attribute row per (shading point, neighbor) —
B*R*SR*K rows, only 1.1% globally unique (probe_dup_census.py). If per-tile
unique counts are low, the same tile-dedup + one-hot-MXU redistribute used
for the KNN cache (ops/fused_knn.py) applies to the attribute gather.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402
from sgnerf_tpu.ops.query import query_neighbors  # noqa: E402

R, D, SR, K = 9216, 400, 24, 8


def main():
    rng = np.random.default_rng(0)
    n = 1_000_000
    walls = rng.uniform(-2, 2, size=(n // 2, 3)).astype(np.float32)
    ax = rng.integers(0, 3, size=n // 2)
    sign = rng.integers(0, 2, size=n // 2) * 2 - 1
    walls[np.arange(n // 2), ax] = 2.0 * sign
    clutter = rng.normal(scale=0.7, size=(n - n // 2, 3)).astype(np.float32)
    xyz = np.concatenate([walls, clutter])
    emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
    cloud = make_point_cloud(xyz, emb)
    spec = grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16")
    grid = build_grid(cloud, spec)
    jax.block_until_ready(grid.bucket_pnts)

    fx = fy = 580.0
    xs = (np.arange(96) + 272 - 320) / fx
    ys = (np.arange(96) + 192 - 240) / fy
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    d = np.stack([gx, gy, np.ones_like(gx)], -1).reshape(1, -1, 3)
    raydir = jnp.asarray(
        (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32))
    raygen = find_ray_generation_method("near_far_linear")
    raypos, _, _, _ = raygen(jnp.asarray([[0.0, 0.0, -1.5]]), raydir, D,
                             near=0.1, far=8.0)
    q = query_neighbors(grid, cloud.xyz, raypos, K=K, SR=SR,
                        radius_limit=0.032, knn_mode="fused")
    pidx = np.asarray(q.sample_pidx)[0]        # (R, SR, K)
    valid = pidx >= 0
    tot = valid.sum()
    uniq_all = np.unique(pidx[valid]).size
    print(f"valid rows {tot} ({tot/pidx.size*100:.0f}% of slots) "
          f"global unique {uniq_all} ({uniq_all/tot*100:.2f}%)")
    for tr in (16, 32, 64, 128):
        flat = pidx.reshape(R // tr, tr * SR * K)
        cnts = np.array([np.unique(row[row >= 0]).size for row in flat])
        print(f"  tile={tr:4d} rays ({tr*SR*K} rows): unique/tile "
              f"mean={cnts.mean():7.1f} p50={np.percentile(cnts,50):6.0f} "
              f"p99={np.percentile(cnts,99):6.0f} max={cnts.max():6d} "
              f"dedup x{valid.reshape(R//tr,-1).sum(1).mean()/cnts.mean():.1f}")


if __name__ == "__main__":
    main()
