"""In-context stage costs of the REAL render program (bench.py scene).

Times cumulative prefixes of render_rays under pipelined dispatch, so each
stage's marginal cost is the difference of adjacent rows. Microbenchmarks of
isolated gathers do NOT reflect in-context costs (measured: packing the two
KNN cache gathers into one bought ~2 ms in context vs ~28 ms isolated) —
XLA overlaps gather latency with surrounding compute.
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
    AggregatorConfig, init_aggregator_params, aggregate)
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402
from sgnerf_tpu.ops.query import (  # noqa: E402
    mask_and_compact_samples, query_neighbors)

R, D, SR, K = 9216, 400, 24, 8


def bench(fn, args_list, iters=12, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
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
    n_dil = int(jnp.sum((grid.occ_mask > 0).astype(jnp.int32)))
    n_occ = int(jnp.sum((grid.vox_slot >= 0).astype(jnp.int32)))
    print(f"grid: occupied={n_occ} dilated={n_dil} "
          f"max_d={grid.nbr_packed.shape[0]}", flush=True)

    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=D, SR=SR, K=K,
                       vsize=(0.008, 0.008, 0.008), gather_dtype="bfloat16")
    params = init_aggregator_params(jax.random.key(0), cfg.agg)

    def mk_raydir(i):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(d)
    raydirs = [mk_raydir(i) for i in range(4)]
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    rot = jnp.eye(3, dtype=np.float32)[None]
    bg = jnp.ones(3)
    raygen = find_ray_generation_method("near_far_linear")

    def gen(raydir):
        raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
        return raypos

    @jax.jit
    def s1_mask(grid, raydir):
        loc, smask, _ = mask_and_compact_samples(gen(raydir), grid, SR)
        return jnp.sum(loc) + jnp.sum(smask)

    @jax.jit
    def s2_query(grid, cloud, raydir):
        q = query_neighbors(grid, cloud.xyz, gen(raydir), K=K, SR=SR,
                            radius_limit=cfg.radius_limit)
        return (jnp.sum(q.sample_pidx) + jnp.sum(q.sample_loc_w)
                + jnp.sum(q.ray_mask))

    @jax.jit
    def s3_gather(grid, cloud, raydir):
        q = query_neighbors(grid, cloud.xyz, gen(raydir), K=K, SR=SR,
                            radius_limit=cfg.radius_limit)
        pid = jnp.clip(q.sample_pidx, 0, cloud.capacity - 1).astype(jnp.int32)
        packed = jnp.concatenate(
            [cloud.xyz, cloud.embedding, cloud.color, cloud.dir, cloud.conf],
            axis=-1).astype(jnp.bfloat16)
        g = packed[pid].astype(jnp.float32)
        return jnp.sum(g)

    @jax.jit
    def s4_full(params, cloud, grid, raydir):
        out = render_rays(params, cloud, grid, cfg, campos=campos,
                          raydir=raydir, camrotc2w=rot, near=0.1, far=8.0,
                          bg_color=bg)
        return jnp.sum(out["coarse_raycolor"])

    t1 = bench(s1_mask, [(grid, r) for r in raydirs], tag="1 raygen+mask/compact")
    t2 = bench(s2_query, [(grid, cloud, r) for r in raydirs], tag="2 +KNN query")
    t3 = bench(s3_gather, [(grid, cloud, r) for r in raydirs], tag="3 +attr gather")
    t4 = bench(s4_full, [(params, cloud, grid, r) for r in raydirs],
               tag="4 full render")
    print(f"marginals: mask={t1:.1f} knn={t2-t1:.1f} attr={t3-t2:.1f} "
          f"mlp+march={t4-t3:.1f}", flush=True)


if __name__ == "__main__":
    main()
