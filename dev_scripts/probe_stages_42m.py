"""In-context stage costs at REFERENCE scale (the bench's 4.2M-point room
scan, bench.py config: auto caps, bf16 cache+gather, coarse compaction,
fused MLP+KNN).

VERDICT r2 item 3: the stage marginals existed only at 1M points while the
headline is at 4.2M — re-measure where the time actually goes before
attacking anything. Single-dispatch timing (the ~38 ms fixed tunnel latency
cancels in adjacent-row differences); inputs vary per call; every result is
float()ed (block_until_ready is not a fence through the tunnel).
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
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402
from sgnerf_tpu.ops.query import (  # noqa: E402
    mask_and_compact_samples, query_neighbors)
from sgnerf_tpu.ops.grid import voxel_coords, in_bounds, take3d  # noqa: E402

R, D, SR, K = 9216, 400, 24, 8


def bench_fn(fn, args_list, iters=12, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:6.2f} ms/chunk", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n = int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000))
    xyz = _room_scan(rng, n)
    emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
    cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                             dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                      keepdims=True))
    spec = grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
    t0 = time.time()
    grid = build_grid(cloud, spec)
    jax.block_until_ready(grid.bucket_pnts)
    n_dil = int(jnp.sum((grid.occ_mask > 0).astype(jnp.int32)))
    print(f"grid built in {time.time()-t0:.0f}s: dilated={n_dil} "
          f"max_d={grid.nbr_packed.shape[0]} "
          f"cache={grid.nbr_packed.nbytes/2**30:.2f} GiB", flush=True)

    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=D, SR=SR, K=K,
                       vsize=(0.008, 0.008, 0.008),
                       gather_dtype="bfloat16", knn_mode="fused")
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
    def s2a_cachegather(grid, raydir):
        # the KNN stage's cache-row gather alone (query.py fast path)
        spec_ = grid.spec
        loc, smask, _ = mask_and_compact_samples(gen(raydir), grid, SR)
        c = voxel_coords(loc, spec_)
        cin = in_bounds(c, spec_)
        cc = jnp.clip(c, 0, jnp.asarray(spec_.vdim, jnp.int32) - 1)
        slot = take3d(grid.dil_slot, cc, spec_.vdim)
        slot_c = jnp.clip(slot, 0, grid.nbr_packed.shape[0] - 1)
        rows = grid.nbr_packed[slot_c]
        return (jnp.sum(rows.astype(jnp.int32)) + jnp.sum(loc)
                + jnp.sum(cin))

    @jax.jit
    def s2_query(grid, cloud, raydir):
        q = query_neighbors(grid, cloud.xyz, gen(raydir), K=K, SR=SR,
                            radius_limit=cfg.radius_limit, knn_mode="fused")
        return (jnp.sum(q.sample_pidx) + jnp.sum(q.sample_loc_w)
                + jnp.sum(q.ray_mask))

    @jax.jit
    def s3_gather(grid, cloud, raydir):
        q = query_neighbors(grid, cloud.xyz, gen(raydir), K=K, SR=SR,
                            radius_limit=cfg.radius_limit, knn_mode="fused")
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

    t1 = bench_fn(s1_mask, [(grid, r) for r in raydirs],
                  tag="1 raygen+mask/compact")
    t2a = bench_fn(s2a_cachegather, [(grid, r) for r in raydirs],
                   tag="2a +cache-row gather")
    t2 = bench_fn(s2_query, [(grid, cloud, r) for r in raydirs],
                  tag="2 +fused KNN select")
    t3 = bench_fn(s3_gather, [(grid, cloud, r) for r in raydirs],
                  tag="3 +attr gather")
    t4 = bench_fn(s4_full, [(params, cloud, grid, r) for r in raydirs],
                  tag="4 full render")
    print(f"marginals@{n/1e6:.1f}M: mask={t1:.1f} cache_gather={t2a-t1:.1f} "
          f"knn_select={t2-t2a:.1f} attr={t3-t2:.1f} mlp+march={t4-t3:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
