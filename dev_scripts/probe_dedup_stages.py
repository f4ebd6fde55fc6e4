"""Internal breakdown of the dedup KNN query on raster rays: where does the
time go if not into the cache-row gather?

Cumulative prefixes: raygen+mask -> +slot lookup -> +tile_unique sorts ->
+unique-row gather -> +select kernel. Run for both raster and random rays
to explain the raster-vs-random stage difference.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from sgnerf_tpu.runtime.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402
from sgnerf_tpu.ops.query import mask_and_compact_samples  # noqa: E402
from sgnerf_tpu.ops.grid import voxel_coords, in_bounds, take3d  # noqa: E402
from sgnerf_tpu.ops.fused_knn import (  # noqa: E402
    tile_unique, fused_knn_select_tiled, fused_knn_select)

R, D, SR, K = 9216, 400, 24, 8
T_RAYS, U = 128, 192


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
    cloud = make_point_cloud(xyz, emb)
    spec = grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=610000, P=26, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16")
    grid = build_grid(cloud, spec)
    jax.block_until_ready(grid.bucket_pnts)

    fx = fy = 580.0

    def chunk_dirs(cx, cy):
        xs = (np.arange(96) + cx - 320) / fx
        ys = (np.arange(96) + cy - 240) / fy
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        d = np.stack([gx, gy, np.ones_like(gx)], -1).reshape(1, -1, 3)
        return jnp.asarray(
            (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
                np.float32))

    def rand_dirs(i):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(d)

    raster = [chunk_dirs(cx, cy)
              for cx, cy in ((100, 100), (272, 192), (450, 300), (30, 350))]
    random_ = [rand_dirs(i) for i in range(4)]
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    raygen = find_ray_generation_method("near_far_linear")

    def gen(raydir):
        raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
        return raypos

    def pre(grid, raydir):
        loc, smask, _ = mask_and_compact_samples(gen(raydir), grid, SR)
        c = voxel_coords(loc, grid.spec)
        cin = in_bounds(c, grid.spec)
        cc = jnp.clip(c, 0, jnp.asarray(grid.spec.vdim, jnp.int32) - 1)
        slot = take3d(grid.dil_slot, cc, grid.spec.vdim)
        ok = cin & (slot >= 0) & smask
        center = (cc.astype(jnp.float32) + 0.5) * grid.spec.vsize_arr \
            + grid.spec.min_corner_arr
        return loc, slot, ok, center

    @jax.jit
    def p1_mask(grid, raydir):
        loc, smask, _ = mask_and_compact_samples(gen(raydir), grid, SR)
        return jnp.sum(loc) + jnp.sum(smask)

    @jax.jit
    def p2_slot(grid, raydir):
        loc, slot, ok, center = pre(grid, raydir)
        return jnp.sum(slot) + jnp.sum(ok) + jnp.sum(center)

    @jax.jit
    def p3_sorts(grid, raydir):
        loc, slot, ok, center = pre(grid, raydir)
        M = slot.size
        uniq, inv = tile_unique(slot.reshape(M), ok.reshape(M),
                                T_RAYS * SR, U)
        return jnp.sum(uniq) + jnp.sum(inv)

    @jax.jit
    def p4_gather(grid, raydir):
        loc, slot, ok, center = pre(grid, raydir)
        M = slot.size
        uniq, inv = tile_unique(slot.reshape(M), ok.reshape(M),
                                T_RAYS * SR, U)
        max_d = grid.nbr_packed.shape[0]
        rows = grid.nbr_packed[jnp.clip(uniq, 0, max_d - 1).reshape(-1)]
        return jnp.sum(rows.astype(jnp.int32)) + jnp.sum(inv)

    @jax.jit
    def p5_kernel(grid, raydir):
        loc, slot, ok, center = pre(grid, raydir)
        M = slot.size
        uniq, inv = tile_unique(slot.reshape(M), ok.reshape(M),
                                T_RAYS * SR, U)
        max_d = grid.nbr_packed.shape[0]
        rows = grid.nbr_packed[jnp.clip(uniq, 0, max_d - 1).reshape(-1)]
        Cc = grid.nbr_packed.shape[-1] // 5
        sel = fused_knn_select_tiled(
            rows, inv, (loc - center).reshape(M, 3), ok.reshape(M),
            jnp.float32(0.032) ** 2, C=Cc, K=K, T=T_RAYS * SR, U=U)
        return jnp.sum(sel)

    @jax.jit
    def p5f_kernel(grid, raydir):
        loc, slot, ok, center = pre(grid, raydir)
        M = slot.size
        max_d = grid.nbr_packed.shape[0]
        rows = grid.nbr_packed[jnp.clip(slot, 0, max_d - 1).reshape(-1)]
        Cc = grid.nbr_packed.shape[-1] // 5
        sel = fused_knn_select(
            rows, (loc - center).reshape(M, 3), ok.reshape(M),
            jnp.float32(0.032) ** 2, C=Cc, K=K)
        return jnp.sum(sel)

    for name, dirs in (("raster", raster), ("random", random_)):
        print(f"--- {name} rays ---", flush=True)
        t1 = bench(p1_mask, [(grid, r) for r in dirs], tag="1 raygen+mask")
        t2 = bench(p2_slot, [(grid, r) for r in dirs], tag="2 +slot/center")
        t3 = bench(p3_sorts, [(grid, r) for r in dirs], tag="3 +tile_unique")
        t4 = bench(p4_gather, [(grid, r) for r in dirs], tag="4 +row gather")
        t5 = bench(p5_kernel, [(grid, r) for r in dirs], tag="5 +select kernel")
        t5f = bench(p5f_kernel, [(grid, r) for r in dirs],
                    tag="5f fused (per-row gather+select)")
        print(f"marginals: mask={t1:.1f} slot={t2-t1:.1f} sorts={t3-t2:.1f} "
              f"gather={t4-t3:.1f} kernel={t5-t4:.1f} | "
              f"fused-path gather+select={t5f-t2:.1f}", flush=True)


if __name__ == "__main__":
    main()
