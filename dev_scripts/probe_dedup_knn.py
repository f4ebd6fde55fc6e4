"""A/B the tile-dedup KNN path on TPU with raster-chunk rays (bench scene).

Raster rendering is the production pattern (test_ft/render_vid chunk full
frames); probe_tile_unique.py measured 9-23x cache-row dedup for raster
tiles vs x1.0 for the bench's random directions. Checks compiled-kernel
equality (fused vs dedup) and times the query stage + full render both ways.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.models.aggregator import (  # noqa: E402
    AggregatorConfig, init_aggregator_params)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402
from sgnerf_tpu.ops.query import query_neighbors  # noqa: E402

R, D, SR, K = 9216, 400, 24, 8


def bench(fn, args_list, iters=12, tag=""):
    _ = jax.block_until_ready(fn(*args_list[0]))
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(jnp.sum(r) if hasattr(r, "shape") else r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:6.2f} ms/chunk", flush=True)
    return dt


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
    cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                             dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                      keepdims=True))
    spec = grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16")
    grid = build_grid(cloud, spec)
    jax.block_until_ready(grid.bucket_pnts)

    # raster 96x96 pixel chunks of a 640x480 frame (fx=fy=580), 4 positions
    fx = fy = 580.0

    def chunk_dirs(cx, cy):
        xs = (np.arange(96) + cx - 320) / fx
        ys = (np.arange(96) + cy - 240) / fy
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        d = np.stack([gx, gy, np.ones_like(gx)], -1).reshape(1, -1, 3)
        return jnp.asarray(
            (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
                np.float32))

    raydirs = [chunk_dirs(cx, cy)
               for cx, cy in ((100, 100), (272, 192), (450, 300), (30, 350))]
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    rot = jnp.eye(3, dtype=np.float32)[None]
    bg = jnp.ones(3)
    raygen = find_ray_generation_method("near_far_linear")

    def gen(raydir):
        raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
        return raypos

    # compiled-kernel equality: fused vs dedup on raster rays
    qf = query_neighbors(grid, cloud.xyz, gen(raydirs[0]), K=K, SR=SR,
                         radius_limit=0.032, knn_mode="fused")
    qd = query_neighbors(grid, cloud.xyz, gen(raydirs[0]), K=K, SR=SR,
                         radius_limit=0.032, knn_mode="dedup",
                         dedup_tile=64, dedup_cap=160)
    a, b = np.asarray(qf.sample_pidx), np.asarray(qd.sample_pidx)
    eq = (a == b).mean()
    print(f"fused vs dedup compiled agreement: {eq*100:.3f}% "
          f"({(a != b).sum()} of {a.size} differ)", flush=True)

    for mode, kwargs in (("fused", {}),
                         ("dedup t64 c160", dict(dedup_tile=64,
                                                 dedup_cap=160)),
                         ("dedup t128 c192", dict(dedup_tile=128,
                                                  dedup_cap=192)),
                         ("dedup t32 c96", dict(dedup_tile=32,
                                                dedup_cap=96))):
        km = "fused" if mode == "fused" else "dedup"

        @jax.jit
        def s2_query(grid, xyz, raydir):
            q = query_neighbors(grid, xyz, gen(raydir), K=K, SR=SR,
                                radius_limit=0.032, knn_mode=km, **kwargs)
            return (jnp.sum(q.sample_pidx) + jnp.sum(q.sample_loc_w)
                    + jnp.sum(q.ray_mask))

        bench(s2_query, [(grid, cloud.xyz, r) for r in raydirs],
              tag=f"query {mode}")

    for mode, kwargs in (("fused", {}),
                         ("dedup t64 c160", dict(dedup_tile=64,
                                                 dedup_cap=160))):
        cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                                fused_mlp="pallas"),
                           z_depth_dim=D, SR=SR, K=K,
                           vsize=(0.008, 0.008, 0.008),
                           gather_dtype="bfloat16",
                           knn_mode="fused" if mode == "fused" else "dedup",
                           **kwargs)
        params = init_aggregator_params(jax.random.key(0), cfg.agg)

        @jax.jit
        def s4_full(params, cloud, grid, raydir):
            out = render_rays(params, cloud, grid, cfg, campos=campos,
                              raydir=raydir, camrotc2w=rot, near=0.1,
                              far=8.0, bg_color=bg)
            return jnp.sum(out["coarse_raycolor"])

        dt = bench(s4_full, [(params, cloud, grid, r) for r in raydirs],
                   tag=f"full render {mode}")
        print(f"    -> {R/dt*1000/1e3:.1f}k rays/s single-dispatch",
              flush=True)


if __name__ == "__main__":
    main()
