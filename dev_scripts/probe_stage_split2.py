"""Fine in-context bisect of the KNN stage and stage-4 (gather->march).

probe_render_stages (with barriers): mask 37.4 | knn +52.7 | attr +26.2 |
mlp+march +45.5 (synthetic-input aggregate+march is ~15 ms device). This
splits both fat stages inside the REAL program.
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
from sgnerf_tpu.models.renderer import RenderConfig  # noqa: E402
from sgnerf_tpu.ops.camera import w2pers  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402
from sgnerf_tpu.ops.grid import (voxel_coords, in_bounds,  # noqa: E402
                                 take3d, unpack_cache)
from sgnerf_tpu.ops.query import (mask_and_compact_samples,  # noqa: E402
                                  query_neighbors)

R, D, SR, K = 9216, 400, 24, 8


def bench(fn, args_list, iters=10, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:6.2f} ms", flush=True)
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
    print("grid built", flush=True)

    cfg = RenderConfig(agg=AggregatorConfig(), z_depth_dim=D, SR=SR, K=K,
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
    raygen = find_ray_generation_method("near_far_linear")

    def gen(raydir):
        return raygen(campos, raydir, D, near=0.1, far=8.0)[0]

    # ---------- KNN split
    def upto_slots(grid, raydir):
        loc, smask, _ = mask_and_compact_samples(gen(raydir), grid, SR)
        c = voxel_coords(loc, spec)
        cin = in_bounds(c, spec)
        cc = jnp.clip(c, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
        slot = take3d(grid.dil_slot, cc, spec.vdim)
        return loc, smask, cc, cin, slot

    @jax.jit
    def k1_slots(grid, raydir):
        loc, smask, cc, cin, slot = upto_slots(grid, raydir)
        return jnp.sum(slot) + jnp.sum(loc)

    @jax.jit
    def k2_rows(grid, raydir):
        loc, smask, cc, cin, slot = upto_slots(grid, raydir)
        max_d = grid.nbr_packed.shape[0]
        rows = grid.nbr_packed[jnp.clip(slot, 0, max_d - 1)]
        return jnp.sum(rows.astype(jnp.int32)) + jnp.sum(loc)

    @jax.jit
    def k3_d2(grid, raydir):
        loc, smask, cc, cin, slot = upto_slots(grid, raydir)
        max_d = grid.nbr_packed.shape[0]
        rows = jax.lax.optimization_barrier(
            grid.nbr_packed[jnp.clip(slot, 0, max_d - 1)])
        off, cand = unpack_cache(rows, spec)
        center = (cc.astype(jnp.float32) + 0.5) * spec.vsize_arr \
            + spec.min_corner_arr
        cxyz = center[..., None, :] + off.astype(jnp.float32)
        d2 = jnp.sum((cxyz - loc[..., None, :]) ** 2, axis=-1)
        return jnp.sum(d2) + jnp.sum(cand)

    @jax.jit
    def k4_full(grid, cloud, raydir):
        q = query_neighbors(grid, cloud.xyz, gen(raydir), K=K, SR=SR,
                            radius_limit=cfg.radius_limit)
        return jnp.sum(q.sample_pidx) + jnp.sum(q.sample_loc_w)

    bench(k1_slots, [(grid, r) for r in raydirs], tag="k1 mask+slots")
    bench(k2_rows, [(grid, r) for r in raydirs], tag="k2 +row gather")
    bench(k3_d2, [(grid, r) for r in raydirs], tag="k3 +unpack+d2")
    bench(k4_full, [(grid, cloud, r) for r in raydirs], tag="k4 +top_k=query")

    # ---------- stage-4 split (everything downstream of query)
    def q_of(raydir):
        return query_neighbors(grid, cloud.xyz, gen(raydir), K=K, SR=SR,
                               radius_limit=cfg.radius_limit)

    @jax.jit
    def g1_inputs(cloud, raydir):
        q = q_of(raydir)
        pid = jnp.clip(q.sample_pidx, 0, cloud.capacity - 1).astype(jnp.int32)
        packed = jnp.concatenate(
            [cloud.xyz, cloud.embedding, cloud.color, cloud.dir, cloud.conf],
            axis=-1).astype(jnp.bfloat16)
        g = jax.lax.optimization_barrier(packed[pid]).astype(jnp.float32)
        m = (q.sample_pidx >= 0)[..., None].astype(jnp.float32)
        sx = g[..., 0:3] * m
        se = g[..., 3:35] * m
        B = 1
        pers = jax.vmap(w2pers)(sx.reshape(B, -1, 3), rot, campos).reshape(
            sx.shape)
        sl = jax.vmap(w2pers)(q.sample_loc_w.reshape(B, -1, 3), rot,
                              campos).reshape(q.sample_loc_w.shape)
        return (jnp.sum(sx) + jnp.sum(se) + jnp.sum(pers) + jnp.sum(sl)
                + jnp.sum(g[..., 35:]))

    @jax.jit
    def g2_agg(cloud, raydir):
        q = q_of(raydir)
        pid = jnp.clip(q.sample_pidx, 0, cloud.capacity - 1).astype(jnp.int32)
        packed = jnp.concatenate(
            [cloud.xyz, cloud.embedding, cloud.color, cloud.dir, cloud.conf],
            axis=-1).astype(jnp.bfloat16)
        g = jax.lax.optimization_barrier(packed[pid]).astype(jnp.float32)
        mask = q.sample_pidx >= 0
        m = mask[..., None].astype(jnp.float32)
        sx = g[..., 0:3] * m
        se = g[..., 3:35] * m
        B = 1
        pers = jax.vmap(w2pers)(sx.reshape(B, -1, 3), rot, campos).reshape(
            sx.shape)
        sl = jax.vmap(w2pers)(q.sample_loc_w.reshape(B, -1, 3), rot,
                              campos).reshape(q.sample_loc_w.shape)
        dec, rv, w, cc2 = aggregate(
            params, cfg.agg,
            sampled_embedding=se, sampled_color=g[..., 35:38],
            sampled_dir=g[..., 38:41], sampled_conf=g[..., 41:42],
            sampled_label_embedding=None,
            sampled_xyz=sx, sampled_xyz_pers=pers,
            sample_pnt_mask=mask, sample_loc=sl,
            sample_loc_w=q.sample_loc_w,
            sample_ray_dirs=jnp.broadcast_to(
                raydirs[0][:, :, None, :], (1, R, SR, 3)),
            Rw2c=None, vsize=cfg.vsize)
        return jnp.sum(dec)

    bench(g1_inputs, [(cloud, r) for r in raydirs], tag="g1 query+gather+inputs")
    bench(g2_agg, [(cloud, r) for r in raydirs], tag="g2 +aggregate")


if __name__ == "__main__":
    main()
