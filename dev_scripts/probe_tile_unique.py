"""Per-TILE unique-slot counts for the KNN cache gather (bench scene).

Along-ray runs dedup nothing (probe_run_stats.py: every shading point on a
ray lands in a distinct dilated voxel — the ray step 0.02 m exceeds the
0.016 m dilated voxel). The 13.1% global uniqueness (probe_dup_census.py) is
CROSS-ray: nearby rays traverse the same voxels. A tile-level dedup (gather
unique rows per tile of rays, redistribute with an exact one-hot MXU matmul
in a Pallas kernel) pays off iff per-tile unique counts are low. Measures
both the bench's random-direction rays and a raster 96x96-pixel chunk
(the real rendering pattern).
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
from sgnerf_tpu.ops.query import mask_and_compact_samples  # noqa: E402
from sgnerf_tpu.ops.grid import voxel_coords, in_bounds, take3d  # noqa: E402

R, D, SR = 9216, 400, 24


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

    raygen = find_ray_generation_method("near_far_linear")
    campos = jnp.asarray([[0.0, 0.0, -1.5]])

    @jax.jit
    def slots_of(grid, raydir):
        raypos, _, _, _ = raygen(campos, raydir, D, near=0.1, far=8.0)
        loc, smask, _ = mask_and_compact_samples(raypos, grid, SR)
        c = voxel_coords(loc, grid.spec)
        cin = in_bounds(c, grid.spec)
        cc = jnp.clip(c, 0, jnp.asarray(grid.spec.vdim, jnp.int32) - 1)
        slot = take3d(grid.dil_slot, cc, grid.spec.vdim)
        ok = cin & (slot >= 0) & smask
        return jnp.where(ok, slot, -1)  # (B,R,SR)

    def report(name, slots):
        slots = np.asarray(slots)[0]  # (R,SR)
        tot_valid = (slots >= 0).sum()
        uniq_all = np.unique(slots[slots >= 0]).size
        print(f"\n[{name}] valid rows {tot_valid} "
              f"global unique {uniq_all} ({uniq_all/tot_valid*100:.1f}%)")
        for tr in (16, 32, 64, 128):  # rays per tile
            flat = slots.reshape(R // tr, tr * SR)
            cnts = np.array([np.unique(row[row >= 0]).size for row in flat])
            tot = R // tr * tr * SR
            print(f"  tile={tr:4d} rays ({tr*SR} rows): unique/tile "
                  f"mean={cnts.mean():7.1f} p50={np.percentile(cnts,50):6.0f} "
                  f"p99={np.percentile(cnts,99):6.0f} max={cnts.max():6d} "
                  f"dedup x{tr*SR/cnts.mean():.1f}")

    # 1) bench pattern: random directions
    d = (np.random.default_rng(100).normal(size=(1, R, 3)) * 0.3
         ).astype(np.float32)
    d[..., 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    report("random dirs (bench)", slots_of(grid, jnp.asarray(d)))

    # 2) raster pattern: 96x96 pixel block of a 640x480 pinhole frame
    #    (fx=fy=580 like ScanNet exports), centered
    fx = fy = 580.0
    xs = (np.arange(96) + 272 - 320) / fx
    ys = (np.arange(96) + 192 - 240) / fy
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    dirs = np.stack([gx, gy, np.ones_like(gx)], axis=-1).reshape(1, -1, 3)
    dirs = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
            ).astype(np.float32)
    report("raster 96x96 chunk", slots_of(grid, jnp.asarray(dirs)))


if __name__ == "__main__":
    main()
