"""Stage profile for mask_and_compact_samples at the bench workload.

raygen+mask/compact measured 76 ms per dispatch (38 ms fixed tunnel latency
+ ~38 ms compute) at R=9216, D=400 (PERFORMANCE.md). This splits the
compute: raygen | +occupancy lookup | +top_k SR-compaction | +loc gather.
Pipelined timing (varied inputs, scalar reduction, sync at end).
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
from sgnerf_tpu.ops.grid import voxel_coords, in_bounds, take3d  # noqa: E402

R, D, SR = 9216, 400, 24


def bench(fn, args_list, iters=8, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.time()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.time() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:.2f} ms/iter", flush=True)
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
    print("grid built", flush=True)

    def mk_raydir(i):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(d)
    raydirs = [mk_raydir(i) for i in range(4)]
    campos = jnp.asarray([[0.0, 0.0, -1.5]])
    raygen = find_ray_generation_method("near_far_linear")

    def gen(raydir):
        raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
        return raypos

    @jax.jit
    def f_raygen(raydir):
        return jnp.sum(gen(raydir))

    @jax.jit
    def f_occ(grid, raydir):
        raypos = gen(raydir)
        coords = voxel_coords(raypos, spec)
        inb = in_bounds(coords, spec)
        cc = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
        occ = take3d(grid.occ_mask, cc, spec.vdim) > 0
        return jnp.sum((inb & occ).astype(jnp.int32))

    @jax.jit
    def f_topk(grid, raydir):
        raypos = gen(raydir)
        coords = voxel_coords(raypos, spec)
        inb = in_bounds(coords, spec)
        cc = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
        occ = take3d(grid.occ_mask, cc, spec.vdim) > 0
        hit = inb & occ
        d_rng = jnp.arange(D, dtype=jnp.int32)
        score = jnp.where(hit, D - d_rng, -1)
        top, top_d = jax.lax.top_k(score, SR)
        return jnp.sum(top) + jnp.sum(top_d)

    @jax.jit
    def f_full(grid, raydir):
        from sgnerf_tpu.ops.query import mask_and_compact_samples
        raypos = gen(raydir)
        loc, smask, _ = mask_and_compact_samples(raypos, grid, SR)
        return jnp.sum(loc) + jnp.sum(smask.astype(jnp.int32))

    @jax.jit
    def f_occ_u8_sum(grid, raydir):
        # occupancy gather alone without the top_k: is the gather or the
        # top_k the cost? Also test: sum of occ values as int8 math.
        raypos = gen(raydir)
        coords = voxel_coords(raypos, spec)
        cc = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
        occ = take3d(grid.occ_mask, cc, spec.vdim)
        return jnp.sum(occ.astype(jnp.int32))

    bench(f_raygen, [(r,) for r in raydirs], tag="raygen only")
    bench(f_occ_u8_sum, [(grid, r) for r in raydirs], tag="+occ gather")
    bench(f_occ, [(grid, r) for r in raydirs], tag="+occ+inb")
    bench(f_topk, [(grid, r) for r in raydirs], tag="+top_k(400->24)")
    bench(f_full, [(grid, r) for r in raydirs], tag="+loc gather (full)")

    # cumsum-based compaction alternative: rank hits by cumsum, scatter to
    # SR slots — no top_k sort over D
    @jax.jit
    def f_cumsum(grid, raydir):
        raypos = gen(raydir)
        coords = voxel_coords(raypos, spec)
        inb = in_bounds(coords, spec)
        cc = jnp.clip(coords, 0, jnp.asarray(spec.vdim, jnp.int32) - 1)
        occ = take3d(grid.occ_mask, cc, spec.vdim) > 0
        hit = inb & occ                                   # (B,R,D)
        rank = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1
        sel = hit & (rank < SR)
        tgt = jnp.where(sel, rank, SR)                    # (B,R,D)
        B = hit.shape[0]
        loc = jnp.zeros((B, R, SR + 1, 3), raypos.dtype)
        loc = loc.at[
            jnp.arange(B)[:, None, None],
            jnp.arange(R)[None, :, None],
            tgt].set(raypos, mode="drop")
        smask = jnp.zeros((B, R, SR + 1), bool).at[
            jnp.arange(B)[:, None, None],
            jnp.arange(R)[None, :, None],
            tgt].set(True, mode="drop")
        return jnp.sum(loc[:, :, :SR]) + jnp.sum(smask[:, :, :SR])

    bench(f_cumsum, [(grid, r) for r in raydirs], tag="cumsum+scatter alt")


if __name__ == "__main__":
    main()
