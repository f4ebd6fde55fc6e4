"""Attribute-gather row rate vs ID LOCALITY at reference scale.

probe_stages_42m found the attr gather at 4.2M points costs ~84 ms/chunk
(47 ns/row, 3.4x the 1M rate on the same program) — the whole render gap
vs 1M. Hypothesis: per-row gather cost on big tables is HBM-page-locality
bound; the bench cloud's ids are RANDOM in memory, while the ids inside
one voxel-neighborhood cache row are spatially adjacent points. If the
cloud were stored voxel-sorted, each shading point's K ids would land in
a few HBM pages.

Times the same (1.77M row, 42-col bf16) gather with:
  real     - ids from a real query on the as-generated (random-order) cloud
  spatial  - the SAME query ids relabeled through a voxel-sort permutation,
             gathered from the permuted table (what a sorted cloud would do)
  random   - uniform random ids (locality floor)
  block    - contiguous ids (locality ceiling)
at n = 4.2M and 1M.
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
from sgnerf_tpu.models.point_cloud import (  # noqa: E402
    make_point_cloud, build_grid, grid_spec_for_cloud)
from sgnerf_tpu.ops.query import query_neighbors  # noqa: E402
from sgnerf_tpu.ops.raygen import find_ray_generation_method  # noqa: E402

R, D, SR, K = 9216, 400, 24, 8
raygen = find_ray_generation_method("near_far_linear")


def timeit(fn, args_list, iters=12, tag=""):
    _ = float(fn(*args_list[0]))
    t0 = time.perf_counter()
    rs = [fn(*args_list[k % len(args_list)]) for k in range(iters)]
    _ = [float(r) for r in rs]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  [{tag}] {dt:7.2f} ms", flush=True)
    return dt


def run(n):
    rng = np.random.default_rng(0)
    xyz = _room_scan(rng, n)
    emb = (rng.normal(size=(n, 32)) * 0.1).astype(np.float32)
    cloud = make_point_cloud(xyz, emb, color=np.clip(xyz * 0.2 + 0.5, 0, 1),
                             dir=xyz / np.linalg.norm(xyz, axis=-1,
                                                      keepdims=True))
    spec = grid_spec_for_cloud(
        cloud, vsize=[0.008] * 3, vscale=[2, 2, 2], kernel_size=[3, 3, 3],
        max_o=None, P=None, ranges=[-10.0] * 3 + [10.0] * 3,
        cache_dtype="bfloat16", coarse_factor=4, seg_len=4, seg_cap=24)
    grid = build_grid(cloud, spec)
    jax.block_until_ready(grid.bucket_pnts)
    print(f"n={n/1e6:.1f}M grid built", flush=True)

    # real query ids (chunk-scale)
    def q_ids(i):
        r = np.random.default_rng(100 + i)
        d = (r.normal(size=(1, R, 3)) * 0.3).astype(np.float32)
        d[..., 2] = 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        raypos, _, _, _ = raygen(jnp.asarray([[0., 0., -1.5]]),
                                 jnp.asarray(d), D, near=0.1, far=8.0)
        q = query_neighbors(grid, cloud.xyz, raypos, K=K, SR=SR,
                            radius_limit=4 * 0.016, knn_mode="fused")
        return np.asarray(q.sample_pidx).reshape(-1)

    ids_real = [np.where(p >= 0, p, 0).astype(np.int32) for p in
                (q_ids(0), q_ids(1), q_ids(2))]
    M = ids_real[0].size
    print(f"M={M} rows; unique "
          f"{len(np.unique(ids_real[0]))} ({100*len(np.unique(ids_real[0]))/M:.1f}%)",
          flush=True)

    # voxel-sort permutation: rank of each point in (linear voxel id, id)
    # order — what a spatially-sorted cloud would look like in memory
    from sgnerf_tpu.ops.grid import voxel_coords, linear_vid
    c = np.asarray(voxel_coords(cloud.xyz, spec))
    c = np.clip(c, 0, np.asarray(spec.vdim) - 1)
    lv = np.asarray(linear_vid(jnp.asarray(c), spec))
    order = np.argsort(lv, kind="stable")          # new_table[j] = old[order[j]]
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)                     # old id -> new id
    ids_spatial = [rank[i].astype(np.int32) for i in ids_real]

    r2 = np.random.default_rng(7)
    ids_rand = [r2.integers(0, n, size=M).astype(np.int32) for _ in range(3)]
    ids_block = [(np.arange(M, dtype=np.int32) % n + k * 1000) % n
                 for k in range(3)]

    table = jnp.asarray(
        np.concatenate([np.asarray(cloud.xyz), np.asarray(cloud.embedding),
                        np.asarray(cloud.color), np.asarray(cloud.dir),
                        np.asarray(cloud.conf)], axis=-1)).astype(jnp.bfloat16)
    table_sp = table[jnp.asarray(order)]

    @jax.jit
    def g(tbl, ids):
        return jnp.sum(tbl[ids].astype(jnp.float32))

    for tag, tbl, idss in (("real   ", table, ids_real),
                           ("spatial", table_sp, ids_spatial),
                           ("random ", table, ids_rand),
                           ("block  ", table, ids_block)):
        timeit(g, [(tbl, jnp.asarray(i)) for i in idss],
               tag=f"n={n/1e6:.1f}M {tag}")


run(int(os.environ.get("SGNERF_PROBE_POINTS", 4_200_000)))
run(1_000_000)
