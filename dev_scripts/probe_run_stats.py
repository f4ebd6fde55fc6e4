"""Per-ray slot-run statistics of the KNN cache gather (bench scene).

The stage-2 cache gather does one 640B row per shading point (B*R*SR rows);
the dup census (probe_dup_census.py) measured only 13.1% unique rows. Global
dedup cannot pay (per-row redistribute). But duplicates along a RAY are
CONSECUTIVE (a ray's shading points sit in the same dilated voxel until the
ray leaves it), so a per-ray run compaction — gather one row per distinct
run, redistribute inside a kernel (VMEM select / MXU one-hot) — avoids the
per-row redistribute entirely. This probe measures the run-count
distribution to size U (static runs-per-ray capacity).
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

    all_runs = []
    all_valid = []
    for i in range(4):
        d = (np.random.default_rng(100 + i).normal(size=(1, R, 3)) * 0.3
             ).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        slots = np.asarray(slots_of(grid, jnp.asarray(d)))[0]  # (R,SR)
        valid = slots >= 0
        # distinct consecutive runs among VALID entries (invalid entries are
        # interleaved? no: compaction puts hits first in ascending d;
        # invalid slots (-1) appear where smask holds but slot<0, anywhere)
        prev = np.concatenate([np.full((R, 1), -2), slots[:, :-1]], axis=1)
        new_run = valid & (slots != prev)
        runs = new_run.sum(axis=1)
        all_runs.append(runs)
        all_valid.append(valid.sum(axis=1))
    runs = np.concatenate(all_runs)
    nval = np.concatenate(all_valid)
    print(f"rays={runs.size}  valid shading pts/ray mean={nval.mean():.2f}")
    print(f"runs/ray mean={runs.mean():.2f} p50={np.percentile(runs,50):.0f} "
          f"p90={np.percentile(runs,90):.0f} p99={np.percentile(runs,99):.0f} "
          f"max={runs.max()}")
    tot = nval.sum()
    for U in (4, 6, 8, 10, 12, 16, 20, 24):
        cover = np.minimum(runs, U).sum() / np.maximum(runs.sum(), 1)
        # fraction of rays fully covered by U runs
        frac = (runs <= U).mean()
        print(f"U={U:2d}: rays fully covered {frac*100:6.2f}%  "
              f"gather rows {R*4*U/1e3:.0f}k vs {tot/1e3:.0f}k valid "
              f"({runs.size*U/1e3:.0f}k padded)")


if __name__ == "__main__":
    main()
