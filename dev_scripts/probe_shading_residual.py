"""Decompose the mlp+march stage residual (in-context, bench scene):
what does the XLA glue around the fused aggregator kernel cost?

Prefixes (marginals = adjacent differences):
  a) query+gather (baseline; = probe_render_stages s3)
  b) + f32 cast/slice/mask + w2pers + dists + weights   (pre-kernel XLA)
  c) + fused_block1_alpha kernel
  d) full render (adds viewdir PE, color head, march, output dict)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup

setup()
import jax
import jax.numpy as jnp
from sgnerf_tpu.models.aggregator import (AggregatorConfig,
                                          init_aggregator_params,
                                          compute_dists, _dist_weights,
                                          _gradient_clamp)
from sgnerf_tpu.models.point_cloud import (make_point_cloud, build_grid,
                                           grid_spec_for_cloud)
from sgnerf_tpu.models.renderer import RenderConfig, render_rays
from sgnerf_tpu.ops.camera import w2pers
from sgnerf_tpu.ops.raygen import find_ray_generation_method
from sgnerf_tpu.ops.query import query_neighbors
from sgnerf_tpu.ops.fused_agg import fused_block1_alpha

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

    cfg = RenderConfig(agg=AggregatorConfig(compute_dtype="bfloat16",
                                            fused_mlp="pallas"),
                       z_depth_dim=D, SR=SR, K=K,
                       vsize=(0.008, 0.008, 0.008), gather_dtype="bfloat16",
                       knn_mode="fused")
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

    def query(grid, cloud, raydir):
        raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
        return query_neighbors(grid, cloud.xyz, raypos, K=K, SR=SR,
                               radius_limit=cfg.radius_limit,
                               knn_mode="fused")

    def pre_kernel(grid, cloud, raydir):
        q = query(grid, cloud, raydir)
        B = 1
        sample_pnt_mask = q.sample_pidx >= 0
        pid = jnp.clip(q.sample_pidx, 0, cloud.capacity - 1).astype(jnp.int32)
        packed = jnp.concatenate(
            [cloud.xyz, cloud.embedding, cloud.color, cloud.dir, cloud.conf],
            axis=-1).astype(jnp.bfloat16)
        g = jax.lax.optimization_barrier(packed[pid]).astype(jnp.float32)
        sampled_xyz = g[..., 0:3] * sample_pnt_mask[..., None]
        sampled_embedding = g[..., 3:35] * sample_pnt_mask[..., None]
        sampled_conf = g[..., 38:39]
        pers = jax.vmap(w2pers)(
            sampled_xyz.reshape(B, -1, 3), rot, campos).reshape(
                sampled_xyz.shape)
        sample_loc = jax.vmap(w2pers)(
            q.sample_loc_w.reshape(B, -1, 3), rot, campos).reshape(
                q.sample_loc_w.shape)
        dists = compute_dists(cfg.agg, sampled_xyz, pers, sample_loc,
                              q.sample_loc_w)
        weight = _dist_weights(cfg.agg, dists, sample_pnt_mask)
        weight = weight / jnp.clip(
            jnp.sum(weight, axis=-1, keepdims=True), min=1e-8)
        conf = _gradient_clamp(sampled_conf[..., 0])
        wm = weight * conf * sample_pnt_mask
        return sampled_embedding, dists, wm

    @jax.jit
    def s_b(grid, cloud, raydir):
        emb_, d_, w_ = pre_kernel(grid, cloud, raydir)
        return jnp.sum(emb_) + jnp.sum(d_) + jnp.sum(w_)

    @jax.jit
    def s_c(grid, cloud, raydir):
        emb_, d_, w_ = pre_kernel(grid, cloud, raydir)
        M = emb_.shape[0] * emb_.shape[1] * emb_.shape[2]
        fa, al = fused_block1_alpha(
            emb_.reshape(M, K, -1), d_.reshape(M, K, -1), w_.reshape(M, K),
            params["block1"], params["alpha_branch"],
            K=K, nf=3, df=5, bf16=True)
        return jnp.sum(fa) + jnp.sum(al)

    @jax.jit
    def s_d(params, cloud, grid, raydir):
        out = render_rays(params, cloud, grid, cfg, campos=campos,
                          raydir=raydir, camrotc2w=rot, near=0.1, far=8.0,
                          bg_color=bg)
        return jnp.sum(out["coarse_raycolor"])

    @jax.jit
    def s_a(grid, cloud, raydir):
        q = query(grid, cloud, raydir)
        pid = jnp.clip(q.sample_pidx, 0, cloud.capacity - 1).astype(jnp.int32)
        packed = jnp.concatenate(
            [cloud.xyz, cloud.embedding, cloud.color, cloud.dir, cloud.conf],
            axis=-1).astype(jnp.bfloat16)
        g = packed[pid].astype(jnp.float32)
        return jnp.sum(g)

    ta = bench(s_a, [(grid, cloud, r) for r in raydirs], tag="a query+gather")
    tb = bench(s_b, [(grid, cloud, r) for r in raydirs], tag="b +pre-kernel XLA")
    tc = bench(s_c, [(grid, cloud, r) for r in raydirs], tag="c +fused kernel")
    td = bench(s_d, [(params, cloud, grid, r) for r in raydirs], tag="d full")
    print(f"marginals: pre-kernel={tb-ta:.1f} kernel={tc-tb:.1f} "
          f"rest(color+march+out)={td-tc:.1f}", flush=True)


if __name__ == "__main__":
    main()
